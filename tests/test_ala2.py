"""Alanine dipeptide (ACE-ALA-NME): the molecular force-field workflow
end-to-end — parameter file, z-matrix geometry, minimization, Boltzmann
sampling, and the phi/psi dihedral free-energy observable.

This is the BASELINE "config 4"-class capability the reference delegates to
OpenMM/OpenFF (reference ``enflow/data/lig.py``); here the whole chain is
native (``sample/forcefield.py`` + ``example/ala2_ff.yaml``). Validation is
physical sanity + sampler self-consistency: the vacuum minimum must sit in
the C7 region of the Ramachandran map, and two independent HMC ensembles
must agree on the phi free-energy profile within MC error.
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from enflow_tpu.sample.forcefield import (ForceField, dihedral_angles,
                                          ff_energy, free_energy_profile,
                                          zmatrix_to_cartesian)
from enflow_tpu.sample.mcmc import run_hmc
from enflow_tpu.sim.integrate import minimize_fire

PARAMS = os.path.join(os.path.dirname(__file__), "..", "example",
                      "ala2_ff.yaml")
KBT_300 = 0.59616   # kcal/mol at 300 K


@pytest.fixture(scope="module")
def ala2():
    with open(PARAMS) as f:
        d = yaml.safe_load(f)
    ff = ForceField.from_dict(d, ke=d["coulomb_const"])
    return d, ff


def test_parameter_file_sanity(ala2):
    d, ff = ala2
    assert ff.n_atoms == 22
    assert float(jnp.abs(ff.charge.sum())) < 1e-9       # neutral
    assert ff.bond_idx.shape[0] == 21                    # tree topology
    assert ff.angle_idx.shape[0] == 36
    # 1-2/1-3 excluded, 1-4 scaled by AMBER factors
    ls = np.asarray(ff.lj_scale)
    qs = np.asarray(ff.q_scale)
    assert ls[0, 1] == 0.0 and ls[0, 4] == 0.0           # 1-2, 1-3
    assert ls[0, 5] == pytest.approx(0.5)                # 1-4 LJ
    assert qs[0, 5] == pytest.approx(1 / 1.2)            # 1-4 Coulomb
    assert ls[0, 6] == pytest.approx(0.5)                # HH31..N is 1-4
    assert ls[0, 8] == 1.0                               # HH31..CA is 1-5


def test_zmatrix_geometry(ala2):
    d, ff = ala2
    pos = zmatrix_to_cartesian(d["zmatrix"])
    assert pos.shape == (22, 3)
    # bonds at their equilibrium lengths by construction
    bi = np.asarray(ff.bond_idx)
    r = np.linalg.norm(pos[bi[:, 0]] - pos[bi[:, 1]], axis=1)
    np.testing.assert_allclose(r, np.asarray(ff.bond_r0), atol=0.02)
    # built at the requested (phi, psi)
    ang = np.degrees(np.asarray(dihedral_angles(ff, jnp.asarray(pos))))
    assert ang[d["phi_torsion_index"]] == pytest.approx(-80.0, abs=0.1)
    assert ang[d["psi_torsion_index"]] == pytest.approx(75.0, abs=0.1)


def test_minimum_in_c7_basin(ala2):
    """Vacuum ala2's global minimum region is the C7 (gamma-turn) basin —
    minimization from the start structure must stay there with phi < 0."""
    d, ff = ala2
    p0 = jnp.asarray(zmatrix_to_cartesian(d["zmatrix"]))
    energy = lambda p: ff_energy(ff, p)
    pmin = minimize_fire(p0, energy, n_steps=800, dt_start=0.001,
                         dt_max=0.005, max_step=0.005)
    e0, e1 = float(energy(p0)), float(energy(pmin))
    assert np.isfinite(e1) and e1 < e0
    ang = np.degrees(np.asarray(dihedral_angles(ff, pmin)))
    phi, psi = ang[d["phi_torsion_index"]], ang[d["psi_torsion_index"]]
    assert -150.0 < phi < -30.0
    assert 30.0 < psi < 150.0
    # amide planarity: both omega torsions near 180
    omega = np.abs(ang[1])   # CH3-C-N-CA path of omega1
    assert omega > 150.0


def _sample_phi(ff, d, pos0, seed, n_samples=300, n_chains=24):
    x0 = jnp.broadcast_to(pos0, (n_chains,) + pos0.shape)
    # jitter chains so they decorrelate quickly
    x0 = x0 + 0.05 * jax.random.normal(jax.random.PRNGKey(seed + 100),
                                       x0.shape, x0.dtype)
    lp = lambda x: -ff_energy(ff, x) / KBT_300
    res = run_hmc(jax.random.PRNGKey(seed), x0, lp, n_samples=n_samples,
                  n_warmup=100, step_size=5e-3, n_leapfrog=10)
    samples = res.samples                       # [S, C, 22, 3]
    S, C = samples.shape[:2]
    flat = samples.reshape(S * C, 22, 3)
    ang = jax.vmap(lambda p: dihedral_angles(ff, p))(flat)
    return np.asarray(ang[:, d["phi_torsion_index"]]), float(res.accept_rate)


def test_hmc_phi_free_energy_self_consistency(ala2):
    """Two independent HMC ensembles agree on the phi free-energy profile
    (coarse bins, within-basin) — the free-energy-comparison oracle."""
    d, ff = ala2
    p0 = jnp.asarray(zmatrix_to_cartesian(d["zmatrix"]))
    energy = lambda p: ff_energy(ff, p)
    p0 = minimize_fire(p0, energy, n_steps=500, dt_start=0.001,
                       dt_max=0.005, max_step=0.005)

    phi_a, acc_a = _sample_phi(ff, d, p0, seed=1)
    phi_b, acc_b = _sample_phi(ff, d, p0, seed=2)
    assert acc_a > 0.5 and acc_b > 0.5

    # the sampled phi stays overwhelmingly on the started (phi < 0) side of
    # the map at 300 K over this chain length
    assert (phi_a < 0).mean() > 0.9

    bins = 12
    ca, Fa = free_energy_profile(phi_a, KBT_300, bins=bins)
    cb, Fb = free_energy_profile(phi_b, KBT_300, bins=bins)
    both = np.isfinite(Fa) & np.isfinite(Fb)
    assert both.sum() >= 3
    # profiles agree to ~kBT on co-populated bins
    assert np.abs(Fa[both] - Fb[both]).max() < 2.0 * KBT_300


def test_forcefield_target_via_driver_config(ala2, tmp_path):
    """The params file plugs into the driver's forcefield target path
    (params_file), giving a differentiable log_prob for VI/samplers."""
    from enflow_tpu.sample.forcefield import forcefield_target
    d, ff = ala2
    t = forcefield_target(ff, kBT=KBT_300)
    pos = jnp.asarray(zmatrix_to_cartesian(d["zmatrix"]))
    lp = float(t.log_prob(pos))
    g = jax.grad(t.log_prob)(pos)
    assert np.isfinite(lp)
    assert bool(jnp.isfinite(g).all())


def test_vi_then_sample_ala2_workflow(tmp_path, capsys):
    """Driver e2e: short flow-VI against the ala2 force field, then flow-SMC
    from the checkpoint with phi/psi free-energy output in the npz."""
    from test_vi_sample_modes import run_main

    vi_cfg = {
        "mode": "train",
        "units": {"time": "pico", "dist": "ang"},
        "precision": "float64",
        "seed": 3,
        "dynamics": {
            "integrator": "lf", "n_iter": 2, "dt": 1,
            "checkpoint_path": str(tmp_path / "ala2.cpt"),
            "nbr_mode": "all_pairs",
            "network": {"hidden_nf": 16, "node_nf": 3},
        },
        "training": {
            "objective": "flow_vi", "num_epochs": 2, "steps_per_epoch": 10,
            "n_particles": 32, "lr": 1e-3, "scheduler": False,
            "log_interval": 1,
            "target": {"type": "forcefield", "params_file": PARAMS,
                       "kBT": KBT_300, "e_cap": 50.0},
        },
    }
    run_main(tmp_path, vi_cfg, "ala2_vi.yaml")
    capsys.readouterr()

    out_npz = str(tmp_path / "ala2_s.npz")
    s_cfg = {
        "mode": "sample",
        "units": {"time": "pico", "dist": "ang"},
        "precision": "float64",
        "seed": 4,
        "dynamics": {"checkpoint_path": str(tmp_path / "ala2.cpt"),
                     "nbr_mode": "all_pairs"},
        "sampling": {
            "algo": "smc", "n_particles": 64, "n_temps": 3, "mcmc_steps": 1,
            "step_size": 0.005, "n_leapfrog": 3, "fe_bins": 12,
            "output": out_npz,
            "target": {"type": "forcefield", "params_file": PARAMS,
                       "kBT": KBT_300},
        },
    }
    run_main(tmp_path, s_cfg, "ala2_sample.yaml")
    z = np.load(out_npz)
    assert z["pos"].shape == (64, 22, 3)
    assert z["dihedrals"].shape[1] == 23          # all torsion entries
    assert z["phi_free_energy"].shape == (12,)
    assert z["psi_centers"].shape == (12,)
    finite = np.isfinite(z["phi_free_energy"])
    assert finite.any()
    assert z["phi_free_energy"][finite].min() == pytest.approx(0.0)
