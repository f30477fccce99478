import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enflow_tpu.sample.forcefield import (
    ForceField,
    dihedral_angles,
    ff_energy,
    forcefield_target,
)
from enflow_tpu.sample.mcmc import run_hmc


def butane_like():
    """4-atom chain with bonds, one angle, one torsion, LJ+q tails off."""
    return ForceField.from_dict({
        "atoms": [[0.0, 0.0, 0.0]] * 4,  # no nonbonded (sigma=eps=q=0)
        "bonds": [[0, 1, 100.0, 1.0], [1, 2, 100.0, 1.0], [2, 3, 100.0, 1.0]],
        "angles": [[0, 1, 2, 50.0, math.radians(109.5)],
                   [1, 2, 3, 50.0, math.radians(109.5)]],
        "torsions": [[0, 1, 2, 3, 2.0, 3.0, 0.0]],
    })


def test_bond_energy_manual():
    ff = ForceField.from_dict({
        "atoms": [[0.0, 0.0, 0.0]] * 2,
        "bonds": [[0, 1, 10.0, 1.5]],
    })
    pos = jnp.asarray([[0.0, 0, 0], [2.0, 0, 0]], jnp.float64)
    assert float(ff_energy(ff, pos)) == pytest.approx(10.0 * 0.25)


def test_angle_energy_manual():
    ff = ForceField.from_dict({
        "atoms": [[0.0, 0.0, 0.0]] * 3,
        "angles": [[0, 1, 2, 5.0, math.pi / 2]],
    })
    # 90-degree angle: zero energy; straight line: 5*(pi/2)^2
    pos90 = jnp.asarray([[1.0, 0, 0], [0, 0, 0], [0, 1.0, 0]], jnp.float64)
    assert float(ff_energy(ff, pos90)) == pytest.approx(0.0, abs=1e-12)
    pos180 = jnp.asarray([[1.0, 0, 0], [0, 0, 0], [-1.0, 0, 0]], jnp.float64)
    assert float(ff_energy(ff, pos180)) == pytest.approx(5.0 * (math.pi / 2) ** 2)


def test_torsion_energy_and_angles():
    ff = butane_like()
    # cis (phi=0): torsion term = k*(1+cos(0)) = 2k
    pos_cis = jnp.asarray([[1.0, 1.0, 0], [1.0, 0, 0], [0, 0, 0],
                           [0, 1.0, 0]], jnp.float64)
    phi = float(dihedral_angles(ff, pos_cis)[0])
    assert phi == pytest.approx(0.0, abs=1e-12)
    # trans (phi=pi): torsion term with n=3: k*(1+cos(3pi)) = 0
    pos_trans = jnp.asarray([[1.0, 1.0, 0], [1.0, 0, 0], [0, 0, 0],
                             [0, -1.0, 0]], jnp.float64)
    phi_t = float(dihedral_angles(ff, pos_trans)[0])
    assert abs(phi_t) == pytest.approx(math.pi, abs=1e-12)


def test_nonbonded_exclusions_and_14():
    """1-2/1-3 excluded, 1-4 scaled by the AMBER factors, others full."""
    d = {
        "atoms": [[1.0, 0.5, 0.3]] * 5,
        "bonds": [[0, 1, 1.0, 1.0], [1, 2, 1.0, 1.0], [2, 3, 1.0, 1.0],
                  [3, 4, 1.0, 1.0]],
    }
    ff = ForceField.from_dict(d)
    lj = np.asarray(ff.lj_scale)
    q = np.asarray(ff.q_scale)
    assert lj[0, 1] == 0.0 and lj[0, 2] == 0.0          # 1-2, 1-3
    assert lj[0, 3] == pytest.approx(0.5)               # 1-4 LJ
    assert q[0, 3] == pytest.approx(1 / 1.2)            # 1-4 Coulomb
    assert lj[0, 4] == 1.0 and q[0, 4] == 1.0           # 1-5 full
    assert lj[0, 0] == 0.0                              # self


def test_coulomb_manual():
    ff = ForceField.from_dict({
        "atoms": [[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]],
    }, ke=2.0)
    pos = jnp.asarray([[0.0, 0, 0], [4.0, 0, 0]], jnp.float64)
    assert float(ff_energy(ff, pos)) == pytest.approx(2.0 * 1 * -1 / 4.0)


def test_hmc_samples_bond_distribution():
    """HMC on a harmonic-bond dimer: bond-length variance = kBT/(2k)
    (1D effective potential k(r-r0)^2 at low temperature)."""
    k, r0, kBT = 200.0, 1.5, 0.05
    ff = ForceField.from_dict({
        "atoms": [[0.0, 0.0, 0.0]] * 2,
        "bonds": [[0, 1, k, r0]],
    })
    t = forcefield_target(ff, kBT=kBT)

    # restrain COM drift by pinning atom 0 via flattened state of atom 1
    def log_prob(x1):
        pos = jnp.stack([jnp.zeros(3), x1])
        return t.log_prob(pos)

    x0 = jnp.tile(jnp.asarray([[r0, 0.0, 0.0]]), (64, 1))
    res = run_hmc(jax.random.PRNGKey(0), x0, log_prob, n_samples=400,
                  n_warmup=100, step_size=0.02, n_leapfrog=10)
    r = np.linalg.norm(np.asarray(res.samples), axis=-1).ravel()
    assert r.mean() == pytest.approx(r0, rel=0.02)
    assert r.var() == pytest.approx(kBT / (2 * k), rel=0.25)


def test_grad_and_jit():
    ff = butane_like()
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(size=(4, 3)) * 0.5
                      + np.arange(4)[:, None] * [1.0, 0, 0], jnp.float64)
    e = jax.jit(lambda p: ff_energy(ff, p))(pos)
    g = jax.grad(lambda p: ff_energy(ff, p))(pos)
    assert np.isfinite(float(e))
    assert np.isfinite(np.asarray(g)).all()
