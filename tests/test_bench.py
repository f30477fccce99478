"""Smoke/contract tests for the repo-root benchmark harnesses.

The bench modules are the driver's round-record entry points; these tests
pin their Python-level contracts (builders run, anneals complete, the
timed-rate tuple shape) on CPU at tiny sizes — NOT their performance.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax  # noqa: E402

import bench  # noqa: E402


@pytest.mark.parametrize("builder", ["vmapped", "batched"])
def test_bench_builders_complete_anneal(builder):
    """Both bench pipelines (per-particle vmapped and batched-density)
    produce a completed anneal with finite weights at tiny P."""
    build = bench.build if builder == "vmapped" else bench.build_batched
    run = build(compute_dtype=None, n_temps=4)
    res = jax.jit(lambda k: run(k, 16))(jax.random.PRNGKey(0))
    assert float(res.beta_history[-1]) == pytest.approx(1.0)
    assert np.isfinite(float(res.log_Z))
    lw = np.asarray(res.log_weights)
    assert lw.shape == (16,) and np.isfinite(lw).all()
    assert res.particles["pos"].shape == (16, bench.N_ATOMS, 3)


def test_timed_rate_contract():
    """timed_rate returns a RateResult — the fields bench.py,
    bench_scaling.py and bench_lj55.py consume (ADVICE r3: compile_s is now
    measured inside, spread repeats are a parameter)."""
    run = bench.build(compute_dtype=None, n_temps=4)
    r = bench.timed_rate(run, 8, repeats=1, tpu_opts=False)
    assert r.rate > 0 and r.ess_rate > 0 and r.dt > 0
    assert np.isfinite(r.log_Z)
    assert len(r.times) == 2 and all(t > 0 for t in r.times)
    assert r.compile_s >= 0.0

    # spread_repeats is configurable (the CPU-baseline leg passes 1)
    r1 = bench.timed_rate(run, 8, repeats=1, tpu_opts=False,
                          spread_repeats=0)
    assert r1.times == []


def test_analytic_flop_model_and_fields():
    """The analytic matmul model is exact arithmetic (spot-check the edge
    MLP term) and flops_fields uses it for the MFU headline, keeping the
    XLA cost-model tally as reference only (it undercounts scan bodies)."""
    F = bench.analytic_flow_flops(P=2, n_atoms=3, node_nf=2, hidden=4,
                                  flow_steps=1)
    E, BN, H, nf = 2 * 9, 2 * 3, 4, 2
    expect = (2 * E * ((2 * nf + 1) * H + H * H)       # edge_nn
              + 2 * E * (H * H + H)                    # coord_nn
              + 2 * BN * ((H + nf) * H + H * nf)       # node_nn
              + 2 * BN * (nf * H + H))                 # vel_nn
    assert F == float(expect)

    S = bench.analytic_smc_flops(P=2, n_atoms=3, n_temps=4, mcmc_steps=1,
                                 n_leapfrog=2, node_nf=2, hidden=4,
                                 flow_steps=1)
    assert S == F * (1 + 4.0 * (1 + 4 * 1 * 2))

    r = bench.RateResult(rate=1.0, ess_rate=1.0, log_Z=0.0, dt=2.0,
                         times=[], compile_s=1.0, flops=123e9)
    out = bench.flops_fields(r, "TPU v5 lite0", analytic_flops=394e12)
    assert out["program_gflop_analytic"] == 394000.0
    assert out["tflop_per_s"] == 197.0
    assert out["mfu_vs_bf16_peak"] == 1.0          # 197e12 peak for v5e
    assert out["program_gflop_xla_cost_model"] == 123.0
    # no analytic model -> only the reference tally
    out2 = bench.flops_fields(r, "TPU v5 lite0")
    assert "tflop_per_s" not in out2 and "program_gflop_xla_cost_model" in out2
