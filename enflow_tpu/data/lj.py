"""LJ-fluid simulated dataset: the latent-distribution sampler, on TPU.

Replaces the reference's OpenMM pipeline (reference ``enflow/data/lj.py:9-89``
+ ``enflow/data/simulated.py:15-133``) with the JAX-native MD engine
(``enflow_tpu/sim``): grid initialization, FIRE minimization, Maxwell-
Boltzmann thermalization, Langevin-middle dynamics under the *softened* LJ
potential (the same expression the loss uses as its base density — reference
lj.py:65-76), frame capture every ``interval`` steps with ``h, g ~
N(0, 1/sqrt(kBT))`` latent features (reference simulated.py:59-64).

The whole simulation is one jitted device program; only captured frames come
back to the host. Parity outputs: a PDB trajectory of captured (PBC-wrapped)
frames and a CSV log of (step, potential energy, temperature) like OpenMM's
``StateDataReporter`` (reference simulated.py:128-129).

Unit flow: YAML parameters are in declared lab units (reference
example/generate.yaml); the simulation runs in reduced units; captured frames
are converted *back* to lab units so the standard transform pipeline
(``ConvertPositionsFrom`` etc.) applies unchanged.
"""

from __future__ import annotations

import math
import os

import numpy as np

from .datasets import InMemoryDataset, register_dataset
from . import formats
from ..utils import conversion as cv
from ..utils.constants import eps


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
class LJDataset(InMemoryDataset):
    """Simulated LJ argon fluid (latent sampler for generate mode)."""

    def process(self, n_atoms, temp, n_iter, interval, dt, friction,
                box=None, discard=-1, softening=0.0, cutoff=3.0, gap=1.0,
                dist_unit="ang", time_unit="pico", node_nf=None,
                log=None, traj=None, minimize_steps=500, sim_seed=0, **_):
        # jax imported here so dataset modules stay importable host-only
        import jax
        import jax.numpy as jnp
        from ..sim import (softened_lj_energy, simulate, thermalize,
                           minimize_fire)

        n_atoms = int(n_atoms)
        if box is None:
            box = self.box  # 'box' is a shared dataset param (BaseDataset)
        if box is None:
            raise ValueError("LJDataset requires a box")
        box_lab = np.asarray([float(b) for b in np.atleast_1d(box)] * 3
                             if np.isscalar(box) or len(np.atleast_1d(box)) == 1
                             else [float(b) for b in box])
        box_red = cv.dist_to_lj(box_lab, dist_unit)
        kBT = cv.kelvin_to_lj(float(temp))
        # dimensionally-correct MD time scale (see conversion.second_to_lj_md)
        dt_red = cv.time_to_lj_md(float(dt), time_unit)
        # friction is 1/(declared time unit) (reference simulated.py:110)
        friction_red = float(friction) / cv.time_to_lj_md(1.0, time_unit)
        # gap is in the declared distance unit (reference lj.py:43 converts it
        # to nm with scale=0.1 for ang)
        gap_red = cv.dist_to_lj(float(gap), dist_unit)
        cutoff_red = float(cutoff)  # already in units of sigma (lj.py:79)
        report_from = int(discard)
        if report_from == -1:
            report_from = int(interval)

        if self.r_cut is None:
            # generate.yaml carries no dataset r_cut (reference would crash in
            # Data.edges); default to the potential cutoff, in lab units so
            # the ConvertPositionsFrom transform maps it back to reduced.
            self.r_cut = cv.lj_to_dist(cutoff_red, dist_unit)

        pos0 = jnp.asarray(arrange_points_on_grid(n_atoms, box_red, gap_red))
        energy = lambda p: softened_lj_energy(p, jnp.asarray(box_red),
                                              softening, cutoff_red)

        @jax.jit
        def run(key):
            p = minimize_fire(pos0, energy, n_steps=minimize_steps,
                              box=jnp.asarray(box_red))
            kt, kr = jax.random.split(key)
            v = thermalize(kt, n_atoms, kBT, dtype=p.dtype)
            frames, _ = simulate(kr, p, v, energy, n_steps=int(n_iter),
                                 interval=int(interval), dt=dt_red,
                                 friction=friction_red, kBT=kBT,
                                 box=jnp.asarray(box_red))
            return frames

        frames = jax.device_get(run(jax.random.PRNGKey(int(sim_seed))))

        z = ["Ar"] * n_atoms
        if node_nf is None and "Ar" not in self.atom_types:
            # one-hot path (dataset mode without latent features): argon-only
            # vocabulary unless the user provided one
            self.atom_types = {"Ar": 0}
        log_rows = []
        if traj:
            os.makedirs(os.path.dirname(traj) or ".", exist_ok=True)
        traj_fh = open(traj, "w") if traj else None
        try:
            for i in range(frames["pos"].shape[0]):
                step = int(frames["step"][i])
                pe_kj = float(frames["pe"][i]) * eps / 1000.0  # kJ/mol
                temp_k = cv.lj_to_kelvin(float(frames["kBT_inst"][i]))
                log_rows.append((step, pe_kj, temp_k))
                pos_lab = cv.lj_to_dist(frames["pos"][i], dist_unit)
                if traj_fh:
                    formats.write_pdb_model(traj_fh, z, pos_lab, box_lab,
                                            model=step)
                if step < report_from:
                    continue
                vel_lab = cv.lj_to_vel(frames["vel"][i], dist_unit, time_unit)
                g = h = None
                if node_nf:
                    # latent features h, g ~ N(0, 1/sqrt(kBT)) (reference
                    # simulated.py:59-64, LJ's random_h path)
                    std = 1.0 / math.sqrt(kBT)
                    h = self.rng.normal(0, std, size=(n_atoms, int(node_nf)))
                    g = self.rng.normal(0, std, size=(n_atoms, int(node_nf)))
                self.append(z, pos_lab, vel_lab, box=box_lab, g=g, h=h,
                            label=f"Simulated dataset: LJ Frame: {step}")
        finally:
            if traj_fh:
                traj_fh.close()

        if log:
            os.makedirs(os.path.dirname(log) or ".", exist_ok=True)
            with open(log, "w") as f:
                f.write('#"Step","Potential Energy (kJ/mole)","Temperature (K)"\n')
                for row in log_rows:
                    f.write("%d,%.6f,%.6f\n" % row)
