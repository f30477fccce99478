"""Replica-exchange MC (sample/remc.py): exact-moment and mixing tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enflow_tpu.sample.remc import remc, tile_replicas

DTYPE = jnp.float64


def _samples_second_half(res):
    s = np.asarray(res.samples)
    return s[s.shape[0] // 2:].reshape(-1, *s.shape[2:])


def test_remc_gaussian_moments():
    """Plain temperature ladder on N(0, I): target-slot moments exact."""
    d, K, M = 3, 3, 256
    log_p = lambda x: -0.5 * (x**2).sum()
    x0 = tile_replicas(
        jax.random.normal(jax.random.PRNGKey(0), (M, d), DTYPE), K)
    res = jax.jit(lambda k, x: remc(
        k, x, log_p=log_p, betas=jnp.array([0.25, 0.5, 1.0]),
        n_rounds=200, mcmc_steps=1, step_size=jnp.array([1.0, 0.7, 0.5]),
        n_leapfrog=5))(jax.random.PRNGKey(1), x0)
    s = _samples_second_half(res)
    assert abs(s.mean()) < 0.05
    assert s.var() == pytest.approx(1.0, rel=0.1)
    assert np.all(np.asarray(res.swap_accept) > 0.2)
    assert np.all((np.asarray(res.accept) > 0.3)
                  & (np.asarray(res.accept) <= 1.0))


def test_remc_mixes_bimodal_where_hmc_cannot():
    """High-barrier 1D bimodal target: all chains start in the +2 mode.
    A single-slot run (plain HMC, no ladder) stays stuck; the full ladder
    crosses via the hot replicas and recovers the symmetric occupancy."""
    log_p = lambda x: (-0.5 * (x[0]**2 - 4.0)**2)   # modes +-2, barrier 8
    M = 128
    x0_chains = 2.0 + 0.1 * jax.random.normal(
        jax.random.PRNGKey(2), (M, 1), DTYPE)

    def run(betas, steps):
        return jax.jit(lambda k, x: remc(
            k, x, log_p=log_p, betas=betas, n_rounds=300, mcmc_steps=1,
            step_size=steps, n_leapfrog=3))(
                jax.random.PRNGKey(3), tile_replicas(x0_chains, len(betas)))

    stuck = run(jnp.array([1.0]), jnp.array([0.1]))
    mixed = run(jnp.array([0.02, 0.1, 0.4, 1.0]),
                jnp.array([0.8, 0.5, 0.2, 0.1]))
    m_stuck = float(_samples_second_half(stuck).mean())
    m_mixed = float(_samples_second_half(mixed).mean())
    assert m_stuck > 1.5                       # never crossed the barrier
    assert abs(m_mixed) < 0.5                  # both modes populated
    assert np.all(np.asarray(mixed.swap_accept) > 0.05)


def test_remc_bridged_family_matches_target():
    """log_q0 bridge (the SMC tempered family): beta=1 slot samples the
    narrow target, not the wide bridge."""
    d, M = 2, 256
    log_q0 = lambda x: -0.5 * (x**2).sum()
    log_p = lambda x: -0.5 * (x**2).sum() / 0.25
    x0 = tile_replicas(
        jax.random.normal(jax.random.PRNGKey(4), (M, d), DTYPE), 3)
    res = jax.jit(lambda k, x: remc(
        k, x, log_p=log_p, log_q0=log_q0,
        betas=jnp.array([0.2, 0.6, 1.0]), n_rounds=200, mcmc_steps=1,
        step_size=0.4, n_leapfrog=5))(jax.random.PRNGKey(5), x0)
    s = _samples_second_half(res)
    assert s.var() == pytest.approx(0.25, rel=0.12)
    assert np.all(np.asarray(res.swap_accept) > 0.1)
