import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enflow_tpu.sample.nuts import (
    _count_trailing_ones,
    _count_trailing_zeros,
    nuts_kernel,
    run_nuts,
)

DTYPE = jnp.float64


def test_bit_helpers():
    for n, tz in [(1, 0), (2, 1), (4, 2), (12, 2), (8, 3)]:
        assert int(_count_trailing_zeros(jnp.asarray(n, jnp.int32))) == tz
    for n, to in [(0, 0), (1, 1), (3, 2), (7, 3), (11, 2), (4, 0)]:
        assert int(_count_trailing_ones(jnp.asarray(n, jnp.int32))) == to


def test_nuts_kernel_moves():
    log_prob = lambda q: -0.5 * (q**2).sum()
    q = jnp.asarray([3.0, -3.0], DTYPE)
    qs = []
    for i in range(50):
        q, info = nuts_kernel(jax.random.PRNGKey(i), q, log_prob, 0.3,
                              max_depth=6)
        qs.append(np.asarray(q))
        assert not bool(info["diverging"])
    qs = np.stack(qs)
    # explores: not stuck at the start, visits near the mode
    assert np.abs(qs[25:]).mean() < 2.0
    assert np.std(qs[25:]) > 0.3


def test_nuts_correlated_gaussian_moments():
    cov = np.array([[1.0, 0.9], [0.9, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))

    def log_prob(q):
        return -0.5 * q @ prec @ q

    C = 48
    x0 = jax.random.normal(jax.random.PRNGKey(0), (C, 2), DTYPE)
    res = run_nuts(jax.random.PRNGKey(1), x0, log_prob, n_samples=250,
                   n_warmup=60, step_size=0.25, max_depth=8)
    assert float(res.divergence_rate) < 0.01
    s = np.asarray(res.samples).reshape(-1, 2)
    assert np.abs(s.mean(0)).max() < 0.1
    emp = np.cov(s.T)
    np.testing.assert_allclose(emp, cov, atol=0.15)
    assert float(res.mean_depth) >= 1.0


def test_nuts_divergence_detection_and_warmup_recovery():
    # badly scaled target + huge step size: raw kernel diverges...
    log_prob = lambda q: -0.5 * (q**2).sum() * 1e4
    q = jnp.asarray([1.0, 1.0], DTYPE)
    _, info = nuts_kernel(jax.random.PRNGKey(0), q, log_prob, 1.0)
    assert bool(info["diverging"])
    # ...but warmup shrinks the step size until sampling works
    x0 = jnp.full((8, 2), 0.02, DTYPE)
    res = run_nuts(jax.random.PRNGKey(2), x0, log_prob, n_samples=100,
                   n_warmup=120, step_size=0.5, max_depth=6)
    assert float(res.divergence_rate) < 0.05
    s = np.asarray(res.samples).reshape(-1, 2)
    assert s.std() == pytest.approx(1e-2, rel=0.3)
