"""LJ55 roofline: where the 8 s/SMC goes, and why fwd+bwd >> 4x fwd.

VERDICT r3 item 3. All timings use the CHAINED methodology (r3): the op
under test is iterated inside one ``lax.scan`` program with a data
dependence, so the ~6 ms axon-tunnel dispatch floor cannot inflate sub-ms
ops (the artifact behind the retracted r2 "4-5x headroom" claim).

Measures, at the bench_lj55 shapes (P=1024, N=55, H=128, 5 EGCL steps) and
at LJ13 for reference:

  1. flow forward (the SMC density's primal) ms/eval
  2. flow value_and_grad (the HMC leapfrog hot path) under
     remat on / off / 'dots' / 'dots_no_batch' — decomposes the observed
     fwd+bwd ratio into remat recompute vs backward-pass inefficiency
  3. analytic FLOP counts (bench.analytic_flow_flops) -> achieved TFLOP/s
     and MFU per phase, replacing the r2 roofline numbers of record
     (the XLA executable cost model counts scan BODIES once, not per trip
     — its 'flops' is a ~100x undercount for these scan-heavy programs;
     measured r4, see RESULTS.md)

Prints one JSON line. Run on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/roofline_lj55.py
"""

import dataclasses
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
from enflow_tpu.data.system import System  # noqa: E402
from enflow_tpu.flow import FlowConfig, init_flow, forward_core  # noqa: E402
from enflow_tpu.nn.egcl import EGCLConfig  # noqa: E402

HIDDEN = 128
NODE_NF = 5
FLOW_STEPS = 5
CHAIN = 20          # iterations inside the timing scan
REPS = 3


def make(n_atoms, P, remat=True, remat_policy=None,
         compute_dtype="bfloat16"):
    cfg = FlowConfig(n_iter=FLOW_STEPS, dt=0.05, remat=remat,
                     remat_policy=remat_policy,
                     egcl=EGCLConfig(node_nf=NODE_NF, hidden_nf=HIDDEN,
                                     compute_dtype=compute_dtype),
                     nbr_mode="all_pairs", exact_ldj=True)
    params = init_flow(jax.random.PRNGKey(0), cfg, jnp.float32)
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 4)
    sysb = System(
        h=jax.random.normal(ks[0], (P, n_atoms, NODE_NF), jnp.float32),
        g=jax.random.normal(ks[1], (P, n_atoms, NODE_NF), jnp.float32),
        pos=jax.random.normal(ks[2], (P, n_atoms, 3), jnp.float32),
        vel=jax.random.normal(ks[3], (P, n_atoms, 3), jnp.float32),
        mask=jnp.ones((P, n_atoms), bool),
        box=jnp.full((P, 3), 1e3, jnp.float32),
        r_cut=jnp.full((P,), 1e2, jnp.float32))
    return cfg, params, sysb


def timed_chain(step_fn, sys0, label):
    """ms per application of ``step_fn(sys) -> sys`` chained CHAIN times
    inside one scan program (data-dependent, dispatch-amortized)."""

    @jax.jit
    def run(s):
        def body(s, _):
            return step_fn(s), ()
        s, _ = jax.lax.scan(body, s, None, length=CHAIN)
        return s

    out = run(sys0)
    jax.block_until_ready(out.pos)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = run(sys0)
        jax.block_until_ready(out.pos)
        ts.append((time.perf_counter() - t0) / CHAIN * 1e3)
    ms = float(np.median(ts))
    print(f"# {label}: {ms:.3f} ms/eval", file=sys.stderr, flush=True)
    return ms


def fwd_step(params, cfg):
    def step(s):
        out, ldj = forward_core(params, cfg, s)
        # fold the scalar back so the chain is data-dependent but cheap
        return out.replace(pos=out.pos + 0.0 * ldj[0])
    return step


def vjp_step(params, cfg):
    def step(s):
        def log_q0(flds):
            sb = s.replace(**flds)
            out, ldj = forward_core(params, cfg, sb)
            tot = sum((f * f).sum()
                      for f in (out.h, out.g, out.vel, out.pos))
            return -0.5 * tot + ldj.sum()

        flds = {"h": s.h, "g": s.g, "pos": s.pos, "vel": s.vel}
        _, g = jax.value_and_grad(log_q0)(flds)
        return s.replace(**{k: flds[k] + 1e-12 * g[k] for k in flds})
    return step


def measure(n_atoms, P, variants):
    flops_fwd = bench.analytic_flow_flops(P, n_atoms, NODE_NF, HIDDEN,
                                          FLOW_STEPS)
    tag = f"lj{n_atoms}_P{P}"
    sec = {"analytic_gflop_fwd": round(flops_fwd / 1e9, 2)}
    cfg, params, sysb = make(n_atoms, P)
    ms_fwd = timed_chain(fwd_step(params, cfg), sysb, f"{tag} fwd")
    sec["fwd_ms"] = round(ms_fwd, 3)
    sec["fwd_tflops"] = round(flops_fwd / ms_fwd / 1e9, 2)

    table = {
        "vjp_remat": (dict(remat=True), 4.0),
        "vjp_noremat": (dict(remat=False), 3.0),
        "vjp_dots": (dict(remat=True, remat_policy="dots"), None),
        "vjp_dots_no_batch": (dict(remat=True,
                                   remat_policy="dots_no_batch"), None),
    }
    for label in variants:
        kw, mult = table[label]
        cfg2, params2, sys2 = make(n_atoms, P, **kw)
        try:
            ms = timed_chain(vjp_step(params2, cfg2), sys2, f"{tag} {label}")
        except Exception as e:          # e.g. OOM without remat at N=55
            sec[label] = f"failed: {type(e).__name__}"
            print(f"# {tag} {label} failed: {e}", file=sys.stderr,
                  flush=True)
            continue
        sec[label + "_ms"] = round(ms, 3)
        sec[label + "_ratio_vs_fwd"] = round(ms / ms_fwd, 2)
        if mult:
            # matmul cost model: bwd = 2x fwd; remat adds 1x recompute
            sec[label + "_tflops"] = round(mult * flops_fwd / ms / 1e9, 2)
    return tag, sec


def main():
    bench.enable_compilation_cache()
    dev = jax.devices()[0]
    out = {"device": str(dev), "hidden": HIDDEN,
           "flow_steps": FLOW_STEPS, "chain": CHAIN}
    ALL = ["vjp_remat", "vjp_noremat", "vjp_dots", "vjp_dots_no_batch"]
    # production LJ55 shape (noremat OOMs at P=1024 — saved edge
    # activations ~23 GB); full ablation at P=256 where everything fits
    for n_atoms, P, variants in ((55, 1024, ["vjp_remat"]),
                                 (55, 256, ALL),
                                 (13, 1024, ALL)):
        tag, sec = measure(n_atoms, P, variants)
        out[tag] = sec

    print(json.dumps(out))


if __name__ == "__main__":
    main()
