"""Benchmark: LJ13 flow-proposal SMC throughput on one chip.

The driver's north-star metric (BASELINE.json): samples/s/chip and ESS/s on
LJ13 flow-SMC. The reference publishes no numbers (SURVEY §6), so
``vs_baseline`` is the speedup of this chip over the same XLA program on the
host CPU (per-particle throughput ratio) — an honest, reproducible baseline.

Pipeline (all jitted, f32):
  z ~ N(0,I) over (h, g, pos, vel)  ->  x = flow.reverse_core(z)
  SMC: temper from the flow-pushforward q0 to the LJ13 cluster Boltzmann
  target with systematic resampling + HMC rejuvenation (gradients through
  the full EGCL flow every leapfrog step — the hot path).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
"""

import json
import os
import sys
import time
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

N_ATOMS = 13
NODE_NF = 5
HIDDEN = 128
FLOW_STEPS = 5
P_TPU = 1024
P_CPU = 64
N_TEMPS = 8
MCMC_STEPS = 1
N_LEAPFROG = 5
KBT = 2.0


def build(dtype=jnp.float32, compute_dtype="bfloat16", constrain=None,
          n_atoms=N_ATOMS, n_temps=N_TEMPS, remat=True):
    from enflow_tpu.flow import FlowConfig, init_flow, forward_core, reverse_core
    from enflow_tpu.nn.egcl import EGCLConfig
    from enflow_tpu.data.system import System
    from enflow_tpu.sample import smc, targets

    # cluster workload: static all-pairs adjacency (no distance tests) and
    # bf16 message-passing internals (exactness of the flow inverse is
    # precision-independent; see nn/egcl.py)
    # exact_ldj: the SMC proposal density must use the true log-det
    # (3*Q.sum per step), not the reference's NLL-parity Q.sum quirk —
    # the parity ldj would bias the importance weights and log_Z
    # (same multiply count either way; throughput unaffected)
    cfg = FlowConfig(n_iter=FLOW_STEPS, dt=0.05, remat=remat,
                     egcl=EGCLConfig(node_nf=NODE_NF, hidden_nf=HIDDEN,
                                     compute_dtype=compute_dtype),
                     nbr_mode="all_pairs", exact_ldj=True)
    params = init_flow(jax.random.PRNGKey(0), cfg, dtype)

    box = jnp.full((1, 3), 1e3, dtype)       # cluster: effectively no PBC
    r_cut = jnp.full((1,), 1e2, dtype)
    mask = jnp.ones((1, n_atoms), bool)

    # Per-particle densities + vmap, NOT smc(batched=True): A/B on v5e
    # measured the vmapped SMC at 6081 samples/s vs 5640 batched (isolated
    # flow fwd is faster batched, but the full anneal compiles better under
    # vmap). smc(batched=True) remains the right call for fused-kernel
    # regimes; see sample/smc.py.
    def to_system(x):
        return System(h=x["h"][None], g=x["g"][None], pos=x["pos"][None],
                      vel=x["vel"][None], mask=mask, box=box, r_cut=r_cut)

    def gauss(sys_b):
        tot = 0.0
        for f in (sys_b.h, sys_b.g, sys_b.vel):
            tot = tot + (f * f).sum()
        return -0.5 * tot

    cluster = targets.lj_cluster(n_atoms, kBT=KBT)

    def log_q0(x):
        # flow-pushforward density: base(f(x)) + ldj_f(x)
        out, ldj = forward_core(params, cfg, to_system(x))
        return gauss(out) - 0.5 * (out.pos ** 2).sum() + ldj[0]

    def log_p(x):
        return cluster.log_prob(x["pos"]) + gauss(to_system(x))

    def propose(key, P):
        ks = jax.random.split(key, 4)
        z = {
            "h": jax.random.normal(ks[0], (P, n_atoms, NODE_NF), dtype),
            "g": jax.random.normal(ks[1], (P, n_atoms, NODE_NF), dtype),
            "pos": jax.random.normal(ks[2], (P, n_atoms, 3), dtype),
            "vel": jax.random.normal(ks[3], (P, n_atoms, 3), dtype),
        }
        if constrain is not None:
            # pin the particle axis to a mesh axis (bench_scaling.py);
            # GSPMD propagates the sharding through the whole SMC program
            z = jax.tree_util.tree_map(constrain, z)

        def rev_one(zz):
            sys_b, _ = reverse_core(params, cfg, to_system(zz))
            return {"h": sys_b.h[0], "g": sys_b.g[0], "pos": sys_b.pos[0],
                    "vel": sys_b.vel[0]}

        return jax.vmap(rev_one)(z)

    def run(key, P):
        kp, ks = jax.random.split(key)
        x0 = propose(kp, P)
        return smc(ks, x0, log_q0=log_q0, log_p=log_p, n_temps=n_temps,
                   mcmc_steps=MCMC_STEPS, step_size=0.02,
                   n_leapfrog=N_LEAPFROG)

    return run


def build_batched(dtype=jnp.float32, compute_dtype="bfloat16",
                  use_pallas=False, n_atoms=N_ATOMS, n_temps=N_TEMPS):
    """Batched-density variant of :func:`build`: densities map ``[P, ...]``
    pytrees to ``[P]`` values in ONE program and the SMC runs with
    ``batched=True`` — the entry point for fused Pallas flow kernels
    (``use_pallas='v2'/'v3'``), whose pallas_call must see the whole
    particle batch (a vmapped B=1 call sees degenerate tiles).

    A/B history at the frozen LJ13 config: pure-XLA vmapped 6081-6121
    samples/s vs batched 5633-5644 (r1) — the vmapped anneal compiles
    better for XLA densities, so :func:`build` stays the headline path;
    this variant exists to measure fused kernels end-to-end.
    """
    from enflow_tpu.flow import FlowConfig, init_flow, forward_core, \
        reverse_core
    from enflow_tpu.nn.egcl import EGCLConfig
    from enflow_tpu.data.system import System
    from enflow_tpu.sample import smc, targets

    cfg = FlowConfig(n_iter=FLOW_STEPS, dt=0.05,
                     egcl=EGCLConfig(node_nf=NODE_NF, hidden_nf=HIDDEN,
                                     compute_dtype=compute_dtype,
                                     use_pallas=use_pallas),
                     nbr_mode="all_pairs", exact_ldj=True)
    params = init_flow(jax.random.PRNGKey(0), cfg, dtype)
    cluster = targets.lj_cluster(n_atoms, kBT=KBT)

    def to_system(x):
        P = x["h"].shape[0]
        return System(h=x["h"], g=x["g"], pos=x["pos"], vel=x["vel"],
                      mask=jnp.ones((P, n_atoms), bool),
                      box=jnp.full((P, 3), 1e3, dtype),
                      r_cut=jnp.full((P,), 1e2, dtype))

    def gauss(sys_b):
        tot = 0.0
        for f in (sys_b.h, sys_b.g, sys_b.vel):
            tot = tot + (f * f).sum(axis=tuple(range(1, f.ndim)))
        return -0.5 * tot                                      # [P]

    def log_q0(x):
        out, ldj = forward_core(params, cfg, to_system(x))     # ldj [P]
        return gauss(out) - 0.5 * (out.pos ** 2).sum(axis=(1, 2)) + ldj

    def log_p(x):
        return jax.vmap(cluster.log_prob)(x["pos"]) + gauss(to_system(x))

    def propose(key, P):
        ks = jax.random.split(key, 4)
        z = {
            "h": jax.random.normal(ks[0], (P, n_atoms, NODE_NF), dtype),
            "g": jax.random.normal(ks[1], (P, n_atoms, NODE_NF), dtype),
            "pos": jax.random.normal(ks[2], (P, n_atoms, 3), dtype),
            "vel": jax.random.normal(ks[3], (P, n_atoms, 3), dtype),
        }
        sys_b, _ = reverse_core(params, cfg, to_system(z))
        return {"h": sys_b.h, "g": sys_b.g, "pos": sys_b.pos,
                "vel": sys_b.vel}

    def run(key, P):
        kp, ks = jax.random.split(key)
        x0 = propose(kp, P)
        return smc(ks, x0, log_q0=log_q0, log_p=log_p, n_temps=n_temps,
                   mcmc_steps=MCMC_STEPS, step_size=0.02,
                   n_leapfrog=N_LEAPFROG, batched=True)

    return run


# TPU compiler tuning (measured on v5e at the frozen config, round 2):
# raising the scoped-VMEM budget to 32 MiB keeps more of the [P,169,128]
# edge-tensor traffic between fusions in VMEM — 6.23k -> 6.45k samples/s
# (+3.5%). Swept 8/16(default)/24/32/40/48/64 MiB: 32 is the reproducible
# optimum; both larger and smaller lose (less room for MSA prefetch above,
# spills below). See RESULTS.md roofline section.
TPU_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "32768"}


class RateResult(NamedTuple):
    """``timed_rate`` output (rate fields per second; times in seconds)."""

    rate: float          # particles / s
    ess_rate: float      # final-stage ESS / s
    log_Z: float
    dt: float            # pipelined wall seconds per SMC run
    times: list          # individually-synced repeat spread
    compile_s: float     # measured compile (+trace) time
    flops: float = None  # XLA cost-model FLOPs per program execution


def enable_compilation_cache():
    """Persistent XLA compilation cache for the bench harnesses (VERDICT r3
    item 6): the LJ55 program costs ~400 s to compile per invocation; with
    the cache the recompile is paid once per code change. Opt out with
    ``ENFLOW_BENCH_CACHE=0``; cache dir overridable via
    ``ENFLOW_BENCH_CACHE_DIR`` (default /tmp/enflow_xla_cache)."""
    if os.environ.get("ENFLOW_BENCH_CACHE", "1") == "0":
        return
    d = os.environ.get("ENFLOW_BENCH_CACHE_DIR", "/tmp/enflow_xla_cache")
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # min_compile_time MUST be 0 on the axon (remote-compile) backend:
        # the client-side compile-duration measurement the filter uses
        # reads ~0 there, so any positive threshold silently caches
        # NOTHING (measured r4: a 135 s LJ13 compile wrote no entry at
        # threshold 10 s; at 0 it cached and a fresh process reused it).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:        # backend without serialization support
        print(f"# compilation cache unavailable: {e}", file=sys.stderr)


def timed_rate(run, P, repeats=3, check=None, tpu_opts=True,
               spread_repeats=2) -> RateResult:
    t_start = time.perf_counter()
    fn = jax.jit(lambda k: run(k, P))
    compile_s = None
    flops = None
    if tpu_opts and jax.devices()[0].platform not in ("cpu", "gpu"):
        # tpu_opts: True -> the LJ13-tuned defaults; a dict -> explicit
        # compiler options (bench_lj55 passes its own N=55-tuned budget)
        opts = tpu_opts if isinstance(tpu_opts, dict) else TPU_COMPILER_OPTIONS
        lowered = fn.lower(jax.random.PRNGKey(1))
        compiled = lowered.compile(compiler_options=opts)
        fn = compiled
        compile_s = time.perf_counter() - t_start   # measured directly
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            flops = None                            # backend w/o cost model
    res = fn(jax.random.PRNGKey(1))          # (compile +) warm
    jax.block_until_ready(res.particles)
    t_warm = time.perf_counter() - t_start
    if check is not None:
        check(res)                           # e.g. sharding sanity (bench_scaling)
    # headline timing: all repeats dispatched async, ONE sync at the end —
    # the r1/r2 methodology; keep it bit-for-bit so the metric stays
    # comparable across rounds (a per-repeat sync costs ~10 ms/run of
    # dispatch latency on the axon tunnel — measured 178 vs 162 ms/SMC)
    t0 = time.perf_counter()
    for i in range(repeats):
        res = fn(jax.random.PRNGKey(2 + i))
    jax.block_until_ready(res.particles)
    dt = (time.perf_counter() - t0) / repeats
    if compile_s is None:
        # no explicit compile step: first call was compile + one execution
        compile_s = max(0.0, t_warm - dt)
    # repeat spread (VERDICT r2 item 7): separately-synced single runs —
    # slightly slower than the pipelined headline by construction.
    # spread_repeats=0/1 keeps the CPU-baseline leg cheap (ADVICE r3).
    times = []
    for i in range(spread_repeats):
        t1 = time.perf_counter()
        r2_ = fn(jax.random.PRNGKey(2 + i))
        jax.block_until_ready(r2_.particles)
        times.append(time.perf_counter() - t1)
    # ESS at the final temperature *before* its resampling step (post-
    # resampling weights are trivially uniform). The adaptive schedule must
    # actually reach beta=1 for the metric to be meaningful.
    assert float(res.beta_history[-1]) > 1.0 - 1e-5, (
        f"anneal incomplete: beta={float(res.beta_history[-1]):.3f}")
    ess = float(res.ess_history[-1])
    return RateResult(P / dt, ess / dt, float(res.log_Z), dt, times,
                      compile_s, flops)


# dense bf16 peak FLOP/s by device generation (MXU matmul peak; the MFU
# denominator). v5e ("v5 lite"): 197 TFLOP/s bf16.
_PEAK_BF16 = {"v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12,
              "v4": 275e12, "v6": 918e12}


def analytic_flow_flops(P, n_atoms, node_nf=NODE_NF, hidden=HIDDEN,
                        flow_steps=FLOW_STEPS):
    """Matmul FLOPs of ONE flow forward over ``P`` molecules (all_pairs).

    Counts the MLP matmuls exactly (2*m*k*n per [m,k]@[k,n]); elementwise
    ops, reductions and the O(N^2) pairwise energy are excluded — at the
    bench shapes the edge/coord H x H matmuls dominate by >10x, so this is
    a tight lower bound on the algorithmic work. Per EGCL, per molecule:
      edge_nn:  N^2 x (2nf+1 -> H -> H)
      coord_nn: N^2 x (H -> H -> 1)
      node_nn:  N   x (H+nf -> H -> nf)
      vel_nn:   N   x (nf -> H -> 1)
    """
    E = P * n_atoms * n_atoms
    BN = P * n_atoms
    edge = 2 * E * ((2 * node_nf + 1) * hidden + hidden * hidden)
    coord = 2 * E * (hidden * hidden + hidden)
    node = 2 * BN * ((hidden + node_nf) * hidden + hidden * node_nf)
    vel = 2 * BN * (node_nf * hidden + hidden)
    return float(flow_steps * (edge + coord + node + vel))


def analytic_smc_flops(P, n_atoms, n_temps, mcmc_steps=MCMC_STEPS,
                       n_leapfrog=N_LEAPFROG, node_nf=NODE_NF, hidden=HIDDEN,
                       flow_steps=FLOW_STEPS, remat=True):
    """Matmul FLOPs of one bench SMC program (propose + anneal).

    Accounting: 1 flow reverse (propose) + the component-cache init
    value-and-grad + ``n_temps * mcmc_steps * n_leapfrog`` leapfrog
    value-and-grads (the component-caching design makes these the ONLY
    density evaluations — sample/mcmc.py). Each value-and-grad costs
    3x a forward in matmul FLOPs (bwd = 2x fwd) plus 1x recompute under
    remat. The target's pairwise term has no matmuls and is excluded.
    """
    F = analytic_flow_flops(P, n_atoms, node_nf, hidden, flow_steps)
    vjp = (4.0 if remat else 3.0) * F
    return F + vjp * (1 + n_temps * mcmc_steps * n_leapfrog)


def flops_fields(r: RateResult, dev, analytic_flops=None):
    """MFU/TFLOP-rate JSON fields (VERDICT r3 items 3/8a).

    ``analytic_flops`` (the matmul cost model above) drives the headline
    rate/MFU: the XLA executable cost model counts each ``scan``/``while``
    BODY once, not per trip — for these scan-heavy programs its 'flops' is
    a ~100x undercount (measured r4: LJ13 SMC cost-model 90 GFLOP vs
    analytic ~10 TFLOP; RESULTS.md roofline). The raw cost-model tally is
    kept as ``program_gflop_xla_cost_model`` for reference only.
    """
    out = {}
    if analytic_flops:
        out["program_gflop_analytic"] = round(analytic_flops / 1e9, 1)
        out["tflop_per_s"] = round(analytic_flops / r.dt / 1e12, 2)
        s = str(dev).lower()
        for k, peak in _PEAK_BF16.items():
            if k in s:
                out["mfu_vs_bf16_peak"] = round(
                    analytic_flops / r.dt / peak, 4)
                break
    if r.flops:
        out["program_gflop_xla_cost_model"] = round(r.flops / 1e9, 1)
    return out


def _cpu_model():
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    return line.split(":", 1)[1].strip()
    except OSError:
        pass
    return "unknown"


def main():
    enable_compilation_cache()
    run = build()
    dev = jax.devices()[0]
    r = timed_rate(run, P_TPU)

    # host-CPU baseline of the same program (per-particle rate).
    # NOTE the ratio is CPU-HOST-DEPENDENT (421x on an 8-core r1 host, 654x
    # on a 2-core r2 host, same TPU numerator) — the absolute samples/s is
    # the cross-round-comparable number; `cpu_host` below records the
    # denominator's context so the ratio is self-describing (VERDICT r2).
    cpu = jax.devices("cpu")
    cpu_times = []
    if cpu and dev.platform != "cpu":
        with jax.default_device(cpu[0]):
            # fair baseline: f32 on CPU (bf16 is emulated and slow there);
            # 3 repeats — a single P=64 CPU repeat made the denominator of
            # the headline ratio noisy (VERDICT r1); spread_repeats=1 keeps
            # the already-slow CPU leg bounded (ADVICE r3)
            rc = timed_rate(build(compute_dtype=None), P_CPU, repeats=3,
                            tpu_opts=False, spread_repeats=1)
            cpu_times = rc.times
        vs_baseline = r.rate / rc.rate
    else:
        vs_baseline = 1.0

    def spread(ts):
        return [round(min(ts), 3), round(max(ts), 3)] if ts else None

    print(json.dumps({
        "metric": "lj13_flow_smc_samples_per_s_per_chip",
        "value": round(r.rate, 2),
        "unit": "samples/s",
        "vs_baseline": round(vs_baseline, 2),
        "ess_per_s": round(r.ess_rate, 2),
        "log_Z": round(r.log_Z, 3),
        "wall_s_per_smc": round(r.dt, 3),
        "wall_spread_s": spread(r.times),
        "compile_s": round(r.compile_s, 1),
        "particles": P_TPU,
        "n_temps": N_TEMPS,
        "device": str(dev),
        **flops_fields(r, dev, analytic_smc_flops(P_TPU, N_ATOMS, N_TEMPS)),
        "cpu_host": {
            "model": _cpu_model(),
            "cores": os.cpu_count(),
            "repeat_spread_s": spread(cpu_times),
            "note": "vs_baseline denominator runs on this host CPU; "
                    "ratio is host-dependent, compare absolute value",
        },
    }))


if __name__ == "__main__":
    main()
