import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enflow_tpu.sim import (
    softened_lj_energy,
    lj_energy,
    simulate,
    thermalize,
    minimize_fire,
    instantaneous_temperature,
)
from enflow_tpu.data.lj import arrange_points_on_grid

DTYPE = jnp.float64


def test_softened_lj_energy_manual():
    pos = jnp.asarray([[0.0, 0, 0], [1.2, 0, 0], [0, 9.0, 0]], DTYPE)
    box = jnp.asarray([10.0, 10.0, 10.0], DTYPE)
    s, cutoff = 0.1, 3.0
    got = float(softened_lj_energy(pos, box, s, cutoff))
    # pairs: (0,1) r=1.2 ; (0,2) min-image r=1.0 ; (1,2) r=sqrt(1.44+1)
    expect = 0.0
    for r in [1.2, 1.0, np.sqrt(1.2**2 + 1.0)]:
        if r < cutoff:
            inv = 1.0 / (s + r)
            expect += 4 * (inv**12 - inv**6)
    assert got == pytest.approx(expect, rel=1e-12)


def test_lj_energy_dimer_minimum():
    # LJ dimer minimum at r = 2^(1/6), E = -1
    r0 = 2.0 ** (1.0 / 6.0)
    pos = jnp.asarray([[0.0, 0, 0], [r0, 0, 0]], DTYPE)
    assert float(lj_energy(pos)) == pytest.approx(-1.0, abs=1e-12)


def test_minimize_fire_reduces_energy():
    rng = np.random.default_rng(0)
    pos0 = jnp.asarray(rng.uniform(0, 4.0, (13, 3)), DTYPE)
    box = jnp.asarray([8.0, 8.0, 8.0], DTYPE)
    energy = lambda p: softened_lj_energy(p, box, 0.1, 3.0)
    e0 = float(energy(pos0))
    pos = minimize_fire(pos0, energy, n_steps=300)
    e1 = float(energy(pos))
    assert np.isfinite(e1)
    assert e1 < e0


def test_thermalize_statistics():
    kBT = 0.7
    v = thermalize(jax.random.PRNGKey(0), 4000, kBT, dtype=DTYPE)
    assert float(instantaneous_temperature(v)) == pytest.approx(kBT, rel=0.05)


def test_langevin_thermostat_equilibrates():
    """MD under the thermostat should hold kBT within sampling error."""
    n, kBT = 32, 1.0
    box = jnp.asarray([6.0, 6.0, 6.0], DTYPE)
    pos0 = jnp.asarray(arrange_points_on_grid(n, np.full(3, 6.0), 0.8), DTYPE)
    energy = lambda p: softened_lj_energy(p, box, 0.2, 3.0)
    pos0 = minimize_fire(pos0, energy, n_steps=200)
    v0 = thermalize(jax.random.PRNGKey(1), n, kBT, dtype=DTYPE)
    frames, final = simulate(jax.random.PRNGKey(2), pos0, v0, energy,
                             n_steps=600, interval=30, dt=0.004, friction=2.0,
                             kBT=kBT, box=box)
    temps = np.asarray(frames["kBT_inst"])
    assert np.isfinite(np.asarray(frames["pe"])).all()
    # discard first half as equilibration
    assert temps[10:].mean() == pytest.approx(kBT, rel=0.25)
    # captured positions are wrapped into the primary cell
    assert (np.abs(np.asarray(frames["pos"])) <= 3.0 + 1e-9).all()
    assert np.asarray(frames["step"]).tolist() == list(range(30, 601, 30))


def test_grid_arrangement():
    box = np.asarray([5.0, 5.0, 5.0])
    pts = arrange_points_on_grid(10, box, 1.0)
    assert pts.shape == (10, 3)
    assert (pts >= 1.0 - 1e-12).all() and (pts <= 4.0 + 1e-12).all()
    # all distinct
    d = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d, 1.0)
    assert d.min() > 1e-6
