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


def test_remc_pathological_config_heals_with_beta0_and_independent_draws():
    """The failure observed on-chip: a pathological initial configuration
    (near-coincident atoms, astronomically steep target) TILED into every
    ladder slot of its chain column can never be rescued — swaps only act
    within the column and HMC is frozen at every beta > 0. With the config
    in a single slot and a beta=0 base (pure bridge density, which mixes
    under any configuration), it migrates hotward, relaxes, and the beta=1
    slot heals."""
    from enflow_tpu.sample import targets

    t = targets.lj_cluster(2, kBT=1.0, c_osc=0.5)
    log_q0 = lambda x: -0.5 * (x ** 2).sum()
    K, M = 4, 8
    betas = jnp.asarray([0.0, 0.3, 0.6, 1.0])
    good = 1.5 * jax.random.normal(jax.random.PRNGKey(7), (M, 2, 3), DTYPE)
    bad = jnp.asarray([[0.0, 0.0, 0.0], [0.05, 0.0, 0.0]], DTYPE)

    def run(x0, betas):
        return jax.jit(lambda k, x: remc(
            k, x, log_p=t.log_prob, log_q0=log_q0, betas=betas,
            n_rounds=40, mcmc_steps=2, step_size=0.05, n_leapfrog=3))(
                jax.random.PRNGKey(8), x0)

    def u_final(res, chain):
        # energy of chain `chain` in the beta=1 slot, last 5 rounds
        s = jnp.asarray(np.asarray(res.samples)[-5:, chain])
        return float(-jax.vmap(t.log_prob)(s).max())

    x0_tiled = tile_replicas(good.at[0].set(bad), K)
    # old driver ladder (beta_min 0.05, no zero slot): even the hottest
    # slot is frozen by the 1e16-scale energy -> stuck forever (measured
    # 1.6e16 after 40 rounds)
    assert u_final(run(x0_tiled, jnp.asarray([0.05, 0.3, 0.6, 1.0])),
                   0) > 1e3
    # beta=0 base slot: the pure bridge density mixes under ANY
    # configuration, so the column heals (measured U -0.44)
    assert u_final(run(x0_tiled, betas), 0) < 10.0

    # independent draws: pathological config only in the beta=1 slot of
    # chain 0; migrates hotward and heals too
    x0_indep = jnp.stack([
        1.5 * jax.random.normal(jax.random.PRNGKey(10 + k), (M, 2, 3), DTYPE)
        for k in range(K)])
    x0_indep = x0_indep.at[K - 1, 0].set(bad)
    assert u_final(run(x0_indep, betas), 0) < 10.0


def test_remc_chain_axis_shards_over_mesh():
    """The chain axis M of the [K, M, ...] replica layout shards over the
    device mesh: one constraint on x0 and GSPMD partitions every HMC sweep
    and swap round; moments still exact and the result actually lives on
    all devices (not silently replicated)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from enflow_tpu.parallel.mesh import get_mesh

    mesh = get_mesh(("chain",))
    n_dev = int(mesh.devices.size)
    d, K, M = 3, 3, 32 * n_dev
    log_p = lambda x: -0.5 * (x**2).sum()
    x0 = tile_replicas(
        jax.random.normal(jax.random.PRNGKey(0), (M, d), DTYPE), K)
    x0 = jax.device_put(x0, NamedSharding(mesh, P(None, "chain")))
    res = jax.jit(lambda k, x: remc(
        k, x, log_p=log_p, betas=jnp.array([0.25, 0.5, 1.0]),
        n_rounds=100, mcmc_steps=1, step_size=jnp.array([1.0, 0.7, 0.5]),
        n_leapfrog=5))(jax.random.PRNGKey(1), x0)
    jax.block_until_ready(res.samples)
    assert len(res.samples.sharding.device_set) == n_dev
    s = _samples_second_half(res)
    assert abs(s.mean()) < 0.07
    assert s.var() == pytest.approx(1.0, rel=0.15)


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


def test_remc_segments_matches_monolithic():
    """Chunked REMC == monolithic, bitwise (same key): rounds are keyed by
    absolute index, so segment scans continue the same RNG stream."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from enflow_tpu.sample.remc import remc, remc_segments
    from enflow_tpu.sample import targets

    t = targets.gaussian((3,), std=1.5)
    log_q0 = lambda x: -0.5 * (x ** 2).sum()
    key = jax.random.PRNGKey(11)
    x0 = jax.random.normal(key, (4, 8, 3), jnp.float64)   # [K, M, d]
    betas = jnp.asarray([0.0, 0.5, 1.0, 1.0][:3])
    kw = dict(log_p=t.log_prob, log_q0=log_q0, betas=jnp.asarray([0.0, 0.5, 1.0]),
              n_rounds=7, mcmc_steps=2, step_size=0.3, n_leapfrog=2)

    mono = jax.jit(lambda k, x: remc(k, x, **kw))(key, x0[:3])
    calls = {"n": 0}

    def counting(f, *a):
        calls["n"] += 1
        return f(*a)

    seg = remc_segments(key, x0[:3], chunk_rounds=3, run_segment=counting,
                        **kw)
    assert calls["n"] == 4                       # init + 3 segments
    np.testing.assert_array_equal(np.asarray(seg.samples),
                                  np.asarray(mono.samples))
    np.testing.assert_array_equal(np.asarray(seg.x_final),
                                  np.asarray(mono.x_final))
    np.testing.assert_array_equal(np.asarray(seg.swap_accept),
                                  np.asarray(mono.swap_accept))
    np.testing.assert_array_equal(np.asarray(seg.accept),
                                  np.asarray(mono.accept))

    # resume from a mid-run capture
    cap = {}

    def grab(r2, state, outs):
        if r2 == 3:
            cap["state"] = jax.tree_util.tree_map(np.asarray, state)
            cap["outs"] = jax.tree_util.tree_map(np.asarray, outs)

    remc_segments(key, x0[:3], chunk_rounds=3, on_segment=grab, **kw)
    resumed = remc_segments(
        key, None, chunk_rounds=3, start_round=3,
        init_state=jax.tree_util.tree_map(jnp.asarray, cap["state"]),
        init_outs=jax.tree_util.tree_map(jnp.asarray, cap["outs"]), **kw)
    np.testing.assert_array_equal(np.asarray(resumed.samples),
                                  np.asarray(mono.samples))


def test_tempered_kernel_vector_beta_matches_scalar():
    """Per-replica beta/step-size vectors (the batched-REMC path): a
    CONSTANT vector must reproduce the scalar-coefficient kernel bitwise."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from enflow_tpu.sample.mcmc import (batched_value_and_grad,
                                        tempered_hmc_kernel_batched)

    P = 16
    log_q0 = lambda x: -0.5 * (x["a"] ** 2).sum(axis=(1, 2))
    log_p = lambda x: -0.5 * ((x["a"] - 1.0) ** 2).sum(axis=(1, 2))
    vgq = batched_value_and_grad(log_q0)
    vgp = batched_value_and_grad(log_p)
    x = {"a": jax.random.normal(jax.random.PRNGKey(0), (P, 3, 2),
                                jnp.float64)}
    vals = (log_q0(x), log_p(x))
    grads = (vgq(x)[1], vgp(x)[1])
    key = jax.random.PRNGKey(1)

    out_s = tempered_hmc_kernel_batched(key, x, vgq, vgp, 0.7, 0.3, 4,
                                        vals, grads)
    out_v = tempered_hmc_kernel_batched(
        key, x, vgq, vgp, jnp.full((P,), 0.7, jnp.float64),
        jnp.full((P,), 0.3, jnp.float64), 4, vals, grads)
    for a, b in zip(jax.tree_util.tree_leaves(out_s),
                    jax.tree_util.tree_leaves(out_v)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_remc_batched_gaussian_moments():
    """Batched REMC (flattened [K*M] kernel, per-replica betas) samples the
    beta=1 target correctly: N(0, s^2) bridged from a wider base."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from enflow_tpu.sample.remc import remc

    s = 0.7
    log_p = lambda x: -0.5 * (x ** 2).sum(axis=(1, 2)) / s**2
    log_q0 = lambda x: -0.5 * (x ** 2).sum(axis=(1, 2)) / 1.5**2
    key = jax.random.PRNGKey(2)
    x0 = 1.5 * jax.random.normal(key, (3, 64, 4, 1), jnp.float64)
    res = jax.jit(lambda k, x: remc(
        k, x, log_p=log_p, log_q0=log_q0,
        betas=jnp.asarray([0.0, 0.5, 1.0]), n_rounds=200, mcmc_steps=1,
        step_size=0.4, n_leapfrog=4, batched=True))(key, x0)
    draws = np.asarray(res.samples)[100:].reshape(-1)    # beta=1 slot
    assert abs(draws.mean()) < 0.05
    assert draws.var() == pytest.approx(s**2, rel=0.1)
    assert np.asarray(res.accept).min() > 0.3
    assert np.asarray(res.swap_accept).min() > 0.2
