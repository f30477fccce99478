import os

import numpy as np
import pytest

from enflow_tpu.data.lj import LJDataset
from enflow_tpu.data import transforms as T
from enflow_tpu.utils.conversion import dist_to_lj, kelvin_to_lj


def test_lj_dataset_generate_mode(tmp_path):
    """Tiny on-device LJ MD run mirroring generate.yaml semantics
    (reference example/generate.yaml + data/lj.py)."""
    log = str(tmp_path / "log.txt")
    traj = str(tmp_path / "traj.pdb")
    tf = T.Compose([T.ConvertPositionsFrom("ang"), T.Center(),
                    T.ConvertVelocitiesFrom("ang", "pico")])
    d = LJDataset(
        n_atoms=8, box=[17.0, 17.0, 17.0], temp=120.0, softening=0.1,
        n_iter=60, interval=20, discard=-1, dt=0.004, friction=1.0,
        dist_unit="ang", time_unit="pico", node_nf=5, log=log, traj=traj,
        minimize_steps=50, transform=tf,
    )
    # frames at steps 20,40,60 with discard=-1 -> report_from=interval -> all 3
    assert len(d) == 3
    s = d[0]
    assert s.num_atoms == 8
    assert s.node_nf == 5
    # h,g are latent gaussians at std 1/sqrt(kBT)
    kBT = kelvin_to_lj(120.0)
    assert abs(s.h.std() - 1 / np.sqrt(kBT)) < 0.5 / np.sqrt(kBT)
    # positions centered (Center transform) and reduced-scale
    np.testing.assert_allclose(s.pos.mean(axis=0), 0.0, atol=1e-9)
    assert np.abs(s.pos).max() < dist_to_lj(17.0, "ang")
    # r_cut defaulted to the potential cutoff (3 sigma) in reduced units
    assert s.r_cut == pytest.approx(3.0)
    # parity artifacts exist
    assert os.path.exists(log) and os.path.exists(traj)
    with open(log) as f:
        lines = f.read().strip().split("\n")
    assert lines[0].startswith('#"Step"')
    assert len(lines) == 4
    step, pe, temp = lines[1].split(",")
    assert int(step) == 20
    assert np.isfinite(float(pe)) and float(temp) > 0


def test_lj_dataset_dataset_mode_onehot():
    """Without node_nf (dataset mode) an argon one-hot vocabulary is used."""
    d = LJDataset(n_atoms=4, box=[12.0, 12.0, 12.0], temp=120.0,
                  n_iter=20, interval=10, dt=0.004, friction=1.0,
                  minimize_steps=20)
    s = d[0]
    assert s.h.shape == (4, 1)
    assert (s.h == 1).all()


def test_custom_simulated_dataset_subclass():
    """SimulatedDataset is the extension point (reference simulated.py:85):
    a custom JAX potential slots in with ~10 lines."""
    from enflow_tpu.data.simulated import SimulatedDataset

    class HarmonicDataset(SimulatedDataset):
        def setup(self, box_red, n_atoms, **_):
            pos0 = np.linspace(0.5, box_red[0] - 0.5, n_atoms)[:, None] * \
                np.asarray([[1.0, 0.0, 0.0]])
            # well centered at the origin: a non-periodic potential must keep
            # its minimum away from the PBC wrap seam at +-box/2, where the
            # wrapped coordinate is discontinuous and minimization can't
            # converge
            energy = lambda p: 2.0 * (p ** 2).sum()
            return energy, pos0, ["C"] * n_atoms, "harmonic"

    d = HarmonicDataset(n_atoms=5, box=[10.0, 10.0, 10.0], temp=120.0,
                        n_iter=40, interval=20, dt=0.004, friction=1.0,
                        r_cut=5.0, minimize_steps=200)
    assert len(d) == 2
    s = d[0]
    assert s.z == ["C"] * 5
    assert s.label.startswith("Simulated dataset: harmonic")
    # minimized+thermostatted atoms hover near the origin (lab ang units)
    assert np.abs(s.pos).mean() < 2.0
