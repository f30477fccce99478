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
