"""Thermodynamic integration (sample/ti.py): analytic Gaussian oracle,
batched==vmapped parity, grid validation, and the driver's
``sampling.algo: ti`` plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enflow_tpu.sample.ti import (TIResult, geometric_grid,
                                  thermodynamic_integration)

LOG_2PI = float(np.log(2.0 * np.pi))


def _gaussian_problem(C=64, key=jax.random.PRNGKey(0)):
    """log_q0: normalized standard normal over a {a:[C,3], b:[C,2]} pytree
    (d=5). log_p: unnormalized N(mu, s^2). TI target:
    log Z_p = (d/2) log(2 pi s^2)."""
    s, mu, d = 1.5, 0.3, 5

    def log_q0(x):
        return (-0.5 * sum((v ** 2).sum() for v in x.values())
                - 0.5 * d * LOG_2PI)

    def log_p(x):
        return -0.5 * sum((((v - mu) / s) ** 2).sum() for v in x.values())

    ka, kb = jax.random.split(key)
    x0 = {"a": jax.random.normal(ka, (C, 3)),
          "b": jax.random.normal(kb, (C, 2))}
    analytic = 0.5 * d * np.log(2.0 * np.pi * s * s)
    return log_q0, log_p, x0, analytic


def test_ti_gaussian_analytic():
    log_q0, log_p, x0, analytic = _gaussian_problem()
    res = thermodynamic_integration(
        jax.random.PRNGKey(1), x0, log_q0=log_q0, log_p=log_p,
        n_nodes=12, n_steps=200, n_warmup=80,
        step_size=0.5, step_size_final=0.3, n_leapfrog=4)
    assert isinstance(res, TIResult)
    assert abs(float(res.log_Z) - analytic) < 0.3
    assert float(res.se) < 0.2
    assert float(res.quad_err) < 0.3
    acc = np.asarray(res.accept)
    assert (acc > 0.4).all() and (acc <= 1.0).all()
    # beta=1 chains are target draws: check the first moment loosely
    flat = np.concatenate([np.asarray(v).ravel() for v in res.x.values()])
    assert abs(flat.mean() - 0.3) < 0.2
    assert abs(flat.std() - 1.5) < 0.35


def test_ti_batched_matches_vmapped():
    """batched=True (ones-cotangent VJP densities) must reproduce the
    vmapped per-chain path — same contract as smc(batched=...)."""
    log_q0, log_p, x0, _ = _gaussian_problem(C=16)

    def log_q0_b(x):
        return (-0.5 * sum((v ** 2).sum(axis=tuple(range(1, v.ndim)))
                           for v in x.values()) - 0.5 * 5 * LOG_2PI)

    def log_p_b(x):
        return -0.5 * sum((((v - 0.3) / 1.5) ** 2).sum(
            axis=tuple(range(1, v.ndim))) for v in x.values())

    kw = dict(n_nodes=5, n_steps=30, n_warmup=10, step_size=0.4,
              n_leapfrog=3)
    r1 = thermodynamic_integration(jax.random.PRNGKey(2), x0,
                                   log_q0=log_q0, log_p=log_p, **kw)
    r2 = thermodynamic_integration(jax.random.PRNGKey(2), x0,
                                   log_q0=log_q0_b, log_p=log_p_b,
                                   batched=True, **kw)
    np.testing.assert_allclose(float(r1.log_Z), float(r2.log_Z), atol=1e-8)
    np.testing.assert_allclose(np.asarray(r1.node_mean),
                               np.asarray(r2.node_mean), atol=1e-8)


def test_ti_run_node_hook_sees_every_dispatch():
    """run_node wraps EVERY device dispatch (cache init + each sweep
    segment + the node-stats reduction) so a retry executor can guard the
    whole run: 6 nodes x (1 init + 2 ten-sweep segments + 1 stats) = 24
    calls."""
    log_q0, log_p, x0, _ = _gaussian_problem(C=8)
    calls = []

    def run(f, *a):
        calls.append(1)
        return f(*a)

    res = thermodynamic_integration(
        jax.random.PRNGKey(3), x0, log_q0=log_q0, log_p=log_p,
        n_nodes=6, n_steps=20, n_warmup=5, chunk_steps=10, run_node=run)
    assert len(np.asarray(res.betas)) == 6
    assert len(calls) == 6 * 4


def test_geometric_grid_shape():
    g = geometric_grid(10, beta_min=0.02)
    assert g.shape == (10,) and g[0] == 0.0 and g[-1] == 1.0
    assert (np.diff(g) > 0).all()
    with pytest.raises(ValueError, match="n_nodes"):
        geometric_grid(2)


@pytest.mark.parametrize("bad", [
    dict(betas=[0.0, 0.5, 0.9]),            # doesn't end at 1
    dict(betas=[0.1, 0.5, 1.0]),            # doesn't start at 0
    dict(betas=[0.0, 0.6, 0.5, 1.0]),       # not increasing
    dict(n_steps=10, n_warmup=10),          # nothing kept
])
def test_ti_validation(bad):
    log_q0, log_p, x0, _ = _gaussian_problem(C=4)
    with pytest.raises(ValueError):
        thermodynamic_integration(jax.random.PRNGKey(0), x0,
                                  log_q0=log_q0, log_p=log_p, **bad)


def test_sample_mode_ti(tmp_path, capsys):
    """sampling.algo: ti through the driver: the flow-bridge TI log_Z of
    the driver's gaussian sample target is analytic. Both log_q0 (flow
    pushforward of the UNNORMALIZED standard-normal base) and log_p drop
    their Gaussian constants, and all 60 dims cancel except the pos
    variance: log(Z_p/Z_q0) = (15/2) log(0.25) = -10.40 — the same
    convention every smc/ais/remc log_Z in the framework uses."""
    from test_vi_sample_modes import vi_config, run_main

    cfg = vi_config(tmp_path, n_epochs=2)
    run_main(tmp_path, cfg, "vi.yaml")
    capsys.readouterr()
    sample_cfg = {
        "mode": "sample",
        "units": {"time": "pico", "dist": "ang"},
        "precision": "float64",
        "seed": 7,
        "dynamics": {"checkpoint_path": cfg["dynamics"]["checkpoint_path"]},
        "sampling": {
            "algo": "ti",
            "n_particles": 32,
            "ti_nodes": 8,
            "n_samples": 80,
            "n_warmup": 30,
            "step_size": 0.4,
            "step_size_final": 0.25,
            "n_leapfrog": 3,
            "output": str(tmp_path / "ti.npz"),
            "metrics_csv": str(tmp_path / "ti.csv"),
            "target": {"type": "gaussian", "n_atoms": 5, "std": 0.5,
                       "kBT": 1.0},
        },
    }
    run_main(tmp_path, sample_cfg, "ti.yaml")
    out = capsys.readouterr().out
    assert "TI over 8 nodes x 32 chains" in out
    data = np.load(tmp_path / "ti.npz")
    analytic = 7.5 * np.log(0.25)
    assert abs(float(data["log_Z"]) - analytic) < 1.5
    assert np.isfinite(data["log_Z_se"]) and np.isfinite(data["quad_err"])
    assert data["betas"].shape == (8,)
    assert data["node_mean"].shape == (8,)
    assert data["pos"].shape == (32, 5, 3)
    with open(tmp_path / "ti.csv") as f:
        rows = f.read().strip().splitlines()
    assert len(rows) == 9  # header + one row per node


def test_ti_adapt_step_recovers_from_bad_step():
    """adapt_step=True: a hopeless initial step size (2.5 on a unit-scale
    Gaussian) is rescued by the warmup-only adaptation; the kept sweeps run
    at the frozen adapted value and the analytic answer still comes out."""
    log_q0, log_p, x0, analytic = _gaussian_problem()
    res = thermodynamic_integration(
        jax.random.PRNGKey(4), x0, log_q0=log_q0, log_p=log_p,
        n_nodes=12, n_steps=200, n_warmup=80,
        step_size=2.5, adapt_step=True, target_accept=0.7, n_leapfrog=4)
    acc = np.asarray(res.accept)
    assert (acc > 0.45).all() and (acc < 0.95).all()
    eps = np.asarray(res.step_size)
    assert (eps < 2.2).all()           # adapted below the hopeless init
    assert abs(float(res.log_Z) - analytic) < 0.4


def test_ti_chunked_matches_monolithic():
    """chunk_steps segments are bitwise-identical to the monolithic node
    program (same fori_loop math dispatched in pieces) — the smc_segments
    discipline, required at LJ55-class node cost where 60-90 s single
    programs fault the TPU tunnel reliably."""
    log_q0, log_p, x0, _ = _gaussian_problem(C=16)
    kw = dict(n_nodes=5, n_steps=30, n_warmup=10, step_size=0.4,
              n_leapfrog=3, adapt_step=True)
    r_mono = thermodynamic_integration(jax.random.PRNGKey(6), x0,
                                       log_q0=log_q0, log_p=log_p, **kw)
    r_chunk = thermodynamic_integration(jax.random.PRNGKey(6), x0,
                                        log_q0=log_q0, log_p=log_p,
                                        chunk_steps=7, **kw)
    assert float(r_mono.log_Z) == float(r_chunk.log_Z)
    assert np.asarray(r_mono.node_mean).tolist() == \
        np.asarray(r_chunk.node_mean).tolist()
    assert np.asarray(r_mono.step_size).tolist() == \
        np.asarray(r_chunk.step_size).tolist()
    for k in r_mono.x:
        assert np.asarray(r_mono.x[k]).tolist() == \
            np.asarray(r_chunk.x[k]).tolist()


def test_ti_precondition_rescues_anisotropic_bridge():
    """precondition=True (per-node ensemble-std mass) on a badly
    anisotropic Gaussian (stds spanning 100x): unit-mass HMC at any single
    step size either stalls the wide coordinates or rejects on the narrow
    ones; the preconditioned kernel recovers the analytic log_Z."""
    scales = np.array([0.02, 0.02, 1.0, 1.0, 2.0])
    d = 5

    def log_q0(x):
        v = x["a"]
        return (-0.5 * ((v / scales) ** 2).sum()
                - 0.5 * d * LOG_2PI - np.log(scales).sum())

    def log_p(x):  # wider anisotropic target, unnormalized
        return -0.5 * ((x["a"] / (2.0 * scales)) ** 2).sum()

    x0 = {"a": jax.random.normal(jax.random.PRNGKey(0), (64, d)) * scales}
    # log Z_p = sum_i 0.5 log(2 pi (2 s_i)^2)
    analytic = sum(0.5 * np.log(2.0 * np.pi * (2.0 * s) ** 2)
                   for s in scales)
    res = thermodynamic_integration(
        jax.random.PRNGKey(8), x0, log_q0=log_q0, log_p=log_p,
        n_nodes=10, n_steps=150, n_warmup=60, step_size=0.5,
        adapt_step=True, precondition=True, n_leapfrog=4)
    assert (np.asarray(res.accept) > 0.4).all()
    assert abs(float(res.log_Z) - analytic) < 0.4


def test_ti_warns_on_frozen_proposal_end():
    """A flow density too stiff for the bridge (here: a violent sawtooth
    rejecting every unit-scale proposal) must trigger the loud
    mixing-failure warning — the fluid-drift-flow failure mode, which
    silently returns ~mean(log w) instead of log_Z (RESULTS.md r5)."""
    def log_q0(x):
        v = x["a"]
        return -0.5 * (v ** 2).sum() - 100.0 * jnp.cos(300.0 * v).sum()

    def log_p(x):
        return -0.5 * (x["a"] ** 2).sum()

    x0 = {"a": jax.random.normal(jax.random.PRNGKey(0), (16, 4))}
    with pytest.warns(UserWarning, match="TI bridge mixing failure"):
        thermodynamic_integration(
            jax.random.PRNGKey(1), x0, log_q0=log_q0, log_p=log_p,
            n_nodes=3, n_steps=8, n_warmup=2, step_size=0.5, n_leapfrog=2)
