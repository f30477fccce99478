import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enflow_tpu.sim import (
    softened_lj_energy,
    lj_energy,
    simulate,
    simulate_nve,
    thermalize,
    minimize_fire,
    instantaneous_temperature,
    radial_distribution,
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


def test_nve_velocity_verlet_conserves_energy():
    """The symplectic-integrator oracle: on a SMOOTH Hamiltonian (isolated
    LJ cluster — no cutoff/min-image discontinuities) total energy
    oscillates boundedly and shows no secular drift over thousands of NVE
    steps (f64). A periodic truncated potential cannot serve here: energy
    jumps at every cutoff crossing are physics, not integrator error."""
    n, kBT = 13, 0.2
    pos0 = jnp.asarray(arrange_points_on_grid(n, np.full(3, 3.0), 1.0), DTYPE)
    energy = lambda p: lj_energy(p)
    pos0 = minimize_fire(pos0, energy, n_steps=400)
    v0 = thermalize(jax.random.PRNGKey(3), n, kBT, dtype=DTYPE)

    def run(dt):
        frames, _ = simulate_nve(pos0, v0, energy, n_steps=4000,
                                 interval=40, dt=dt)
        te = np.asarray(frames["te"])
        ke = np.asarray(frames["ke"]).mean()
        osc = np.abs(te - te[0]).max() / ke
        drift = abs(te[:50].mean() - te[50:].mean()) / ke
        return osc, drift

    # measured: osc 1.4e-4 / 3.2e-5 relative at dt 0.002 / 0.001; drift
    # ~2e-6 / 2e-7 — bounded oscillation, no secular drift
    osc2, drift2 = run(0.002)
    osc1, drift1 = run(0.001)
    assert osc2 < 5e-4 and osc1 < 1.5e-4, (osc2, osc1)
    assert drift2 < 1e-5 and drift1 < 1e-6, (drift2, drift1)
    # the energy error scales as dt^2 — the symplectic second-order
    # signature (a first-order or non-symplectic integrator fails this)
    assert 2.5 < osc2 / osc1 < 7.0, osc2 / osc1


def test_rdf_ideal_gas_is_flat():
    """Uniform random positions (ideal gas) give g(r) ~= 1 in every bin
    with enough frames; normalization (pair counting, shell volumes, box
    volume) is exactly what this pins."""
    rng = np.random.default_rng(0)
    F, N = 64, 64
    box = jnp.asarray([8.0, 8.0, 8.0], DTYPE)
    pos = jnp.asarray(rng.uniform(0, 8.0, (F, N, 3)), DTYPE)
    r, g = radial_distribution(pos, box, r_max=3.9, n_bins=12)
    assert r.shape == (12,) and g.shape == (12,)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=0.08)


def test_rdf_crystal_peaks_at_lattice_constant():
    """Simple-cubic crystal: g(r) has mass exactly at the shell distances
    (a, a*sqrt(2), ...) and zero in between."""
    a = 2.0
    grid = np.stack(np.meshgrid(*[np.arange(4) * a] * 3,
                                indexing="ij"), -1).reshape(-1, 3)
    box = jnp.asarray([8.0, 8.0, 8.0], DTYPE)
    r, g = radial_distribution(jnp.asarray(grid, DTYPE), box,
                               r_max=3.5, n_bins=35)
    g = np.asarray(g)
    r = np.asarray(r)
    near_a = (np.abs(r - a) < 0.1) | (np.abs(r - a * np.sqrt(2)) < 0.1)
    assert g[near_a].sum() > 0
    assert np.all(g[(r > 0.3) & (r < 1.8)] == 0)   # nothing below a
    # masked atoms are excluded entirely
    mask = jnp.asarray([True] * 32 + [False] * 32)
    _, g_m = radial_distribution(jnp.asarray(grid, DTYPE), box, r_max=3.5,
                                 n_bins=35, mask=mask)
    assert np.isfinite(np.asarray(g_m)).all()


def test_grid_arrangement():
    box = np.asarray([5.0, 5.0, 5.0])
    pts = arrange_points_on_grid(10, box, 1.0)
    assert pts.shape == (10, 3)
    assert (pts >= 1.0 - 1e-12).all() and (pts <= 4.0 + 1e-12).all()
    # all distinct
    d = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d, 1.0)
    assert d.min() > 1e-6
