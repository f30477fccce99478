"""LJ-fluid simulated dataset: the latent-distribution sampler, on TPU.

Replaces the reference's OpenMM pipeline (reference ``enflow/data/lj.py:9-89``
+ ``enflow/data/simulated.py:15-133``) with the JAX-native MD engine: grid
initialization, FIRE minimization, Maxwell-Boltzmann thermalization,
Langevin-middle dynamics under the *softened* LJ potential in the
``(s + r)``-shifted form of reference lj.py:65-76 (note this differs from
loss.py's ``r^2 + s`` softening for s > 0 — the MD sampler matches the
reference's *sampler* convention, the NLL matches its *loss* convention),
frame
capture every ``interval`` steps with ``h, g ~ N(0, 1/sqrt(kBT))`` latent
features (reference simulated.py:59-64).

Unit flow: YAML parameters are in declared lab units (reference
example/generate.yaml); the simulation runs in reduced units; captured
frames are converted back to lab units so the standard transform pipeline
(``ConvertPositionsFrom`` etc.) applies unchanged. The shared MD loop lives
in :class:`enflow_tpu.data.simulated.SimulatedDataset`.
"""

from __future__ import annotations

import numpy as np

from .datasets import register_dataset
from .simulated import SimulatedDataset
from ..utils import conversion as cv


def arrange_points_on_grid(n, box, gap):
    """Arrange n points on a 3D grid inside ``box`` with edge ``gap``
    (reference lj.py:9-30, same layout)."""
    num_z = int(np.ceil(n ** (1 / 3)))
    num_y = int(np.ceil((n / num_z) ** (1 / 2)))
    num_x = int(np.ceil(n / (num_y * num_z)))
    x = np.linspace(gap, box[0] - gap, num_x)
    y = np.linspace(gap, box[1] - gap, num_y)
    z = np.linspace(gap, box[2] - gap, num_z)
    xv, yv, zv = np.meshgrid(x, y, z)
    points = np.stack((xv.flatten(), yv.flatten(), zv.flatten()), axis=-1)
    return points[:n]


@register_dataset("lj")
class LJDataset(SimulatedDataset):
    """Simulated LJ argon fluid (latent sampler for generate mode)."""

    latent_features = True

    def setup(self, box_red, n_atoms, dist_unit="ang", softening=0.0,
              cutoff=3.0, gap=1.0, **_):
        import jax.numpy as jnp
        from ..sim import softened_lj_energy

        # gap is in the declared distance unit (reference lj.py:43 converts
        # it to nm with scale=0.1 for ang); cutoff is in units of sigma
        # (reference lj.py:79)
        gap_red = cv.dist_to_lj(float(gap), dist_unit)
        cutoff_red = float(cutoff)
        softening = float(softening)

        if self.r_cut is None:
            # generate.yaml carries no dataset r_cut (the reference would
            # crash in Data.edges); default to the potential cutoff, in lab
            # units so ConvertPositionsFrom maps it back to reduced.
            self.r_cut = cv.lj_to_dist(cutoff_red, dist_unit)

        if "Ar" not in self.atom_types:
            # one-hot path (dataset mode without latent features):
            # argon-only vocabulary unless the user provided one
            self.atom_types = {"Ar": 0}

        pos0 = arrange_points_on_grid(int(n_atoms), box_red, gap_red)
        box_j = jnp.asarray(box_red)
        energy = lambda p: softened_lj_energy(p, box_j, softening, cutoff_red)
        return energy, pos0, ["Ar"] * int(n_atoms), "LJ"
