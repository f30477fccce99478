"""log_Z estimator-arbitration panel for a trained flow on an LJ cluster.

Runs the full r5 estimator panel (RESULTS.md "LJ13 log_Z estimator
arbitration") against ONE flow: pure importance sampling, fixed-ladder
AIS, fixed-ladder SMC, adaptive-tempering SMC — all Jensen lower bounds
with provably unbiased weights for the fixed variants — plus
thermodynamic integration (sample/ti.py), the bias-free referee. Any
MBAR-over-REMC value (driver ``sampling.mbar``) can then be audited
against the panel: the r5 finding is that converged MBAR sits 1-1.7
nats BELOW same-flow lower bounds when the REMC ladder's cold end mixes
poorly, and its block SEs cannot see it.

Usage (on-chip, ~10-20 min at LJ13 defaults):
    ALZ_VI_CACHE=/tmp/vi13.npz python scripts/arbitrate_logz.py
Flow source (one required):
    ALZ_VI_CACHE  flat-params npz written by the quality gates'
                  Q*_VI_CACHE knobs (p0..pK arrays)
    ALZ_CKPT      driver checkpoint (.cpt) from vi training
Target/flow knobs (must match how the flow was trained):
    ALZ_TARGET=lj_cluster | lj_fluid (periodic; drift flows)
    ALZ_N=13  ALZ_KBT=2.0  ALZ_COSC=0.5  ALZ_ECAP=0 (0 = no cap)
    ALZ_BOX=6.5  ALZ_CUTOFF=3.0  (lj_fluid only; ECAP defaults to 500)
    ALZ_DT=0.05  ALZ_STEPS=5  ALZ_HIDDEN=128  ALZ_NF=5
    ALZ_POS_UPDATE=coupled (use drift for periodic fluids)
Panel knobs:
    ALZ_P=1024 (particles)  ALZ_REPS=4  ALZ_TEMPS=40  ALZ_SWEEPS=3
    ALZ_TI_NODES=25  ALZ_TI_STEPS=400  ALZ_TI_CHAINS=256
    ALZ_TI_CHUNK=100 (bounded per-program segments — whole-node programs
                      at large N are the 60-90 s tunnel-fault regime)
    ALZ_SKIP=ti,ais (comma list: is | ais | smc | asmc | ti)

Replicate-scatter SEs throughout (within-run ESS SEs understate after
resampling — the quality-gate lesson). Writes ALZ_JSON if set.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from enflow_tpu.data.system import System
from enflow_tpu.flow import FlowConfig, init_flow, forward_core, reverse_core
from enflow_tpu.nn.egcl import EGCLConfig
from enflow_tpu.sample import ais, smc, targets
from enflow_tpu.sample.ti import thermodynamic_integration

E = os.environ.get
TARGET = E("ALZ_TARGET", "lj_cluster")
N = int(E("ALZ_N", "13"))
KBT, COSC = float(E("ALZ_KBT", "2.0")), float(E("ALZ_COSC", "0.5"))
ECAP = float(E("ALZ_ECAP", "500" if TARGET == "lj_fluid" else "0"))
BOX, CUTOFF = float(E("ALZ_BOX", "6.5")), float(E("ALZ_CUTOFF", "3.0"))
DT, STEPS = float(E("ALZ_DT", "0.05")), int(E("ALZ_STEPS", "5"))
HIDDEN, NF = int(E("ALZ_HIDDEN", "128")), int(E("ALZ_NF", "5"))
POS_UPDATE = E("ALZ_POS_UPDATE", "coupled")
P, REPS = int(E("ALZ_P", "1024")), int(E("ALZ_REPS", "4"))
TEMPS, SWEEPS = int(E("ALZ_TEMPS", "40")), int(E("ALZ_SWEEPS", "3"))
TI_NODES = int(E("ALZ_TI_NODES", "25"))
TI_STEPS = int(E("ALZ_TI_STEPS", "400"))
TI_CHAINS = int(E("ALZ_TI_CHAINS", "256"))
TI_CHUNK = int(E("ALZ_TI_CHUNK", "100"))
SKIP = set(s for s in E("ALZ_SKIP", "").split(",") if s)


def build():
    cfg = FlowConfig(n_iter=STEPS, dt=DT,
                     egcl=EGCLConfig(node_nf=NF, hidden_nf=HIDDEN,
                                     compute_dtype="bfloat16"),
                     nbr_mode="all_pairs", exact_ldj=True,
                     position_update=POS_UPDATE)
    params = init_flow(jax.random.PRNGKey(0), cfg, jnp.float32)
    cache, ckpt = E("ALZ_VI_CACHE", ""), E("ALZ_CKPT", "")
    flat, tree = jax.tree_util.tree_flatten(params)
    if cache:
        with np.load(cache) as z:
            params = jax.tree_util.tree_unflatten(
                tree, [jnp.asarray(z[f"p{i}"]) for i in range(len(flat))])
    elif ckpt:
        from enflow_tpu.train.checkpoint import load_checkpoint
        loaded, _ = load_checkpoint(ckpt, {"params": params})
        params = loaded["params"]
    else:
        raise SystemExit("set ALZ_VI_CACHE or ALZ_CKPT (a trained flow is "
                         "the whole point of the panel)")
    if TARGET == "lj_fluid":
        target = targets.lj_fluid(N, box=BOX, kBT=KBT, softening=0.0,
                                  cutoff=CUTOFF,
                                  **({"e_cap": ECAP} if ECAP else {}))
        box_f, rc_f = BOX, CUTOFF
    else:
        target = targets.lj_cluster(N, kBT=KBT, c_osc=COSC, softening=0.0,
                                    **({"e_cap": ECAP} if ECAP else {}))
        box_f, rc_f = 1e3, 1e2
    mask = jnp.ones((1, N), bool)
    box = jnp.full((1, 3), box_f, jnp.float32)
    rc = jnp.full((1,), rc_f, jnp.float32)

    def to_sys(x):
        return System(h=x["h"][None], g=x["g"][None], pos=x["pos"][None],
                      vel=x["vel"][None], mask=mask, box=box, r_cut=rc)

    def log_q0(x):
        out, ldj = forward_core(params, cfg, to_sys(x))
        return (-0.5 * sum((f ** 2).sum() for f in
                           (out.h, out.g, out.vel, out.pos)) + ldj[0])

    def log_p(x):
        s = to_sys(x)
        return (target.log_prob(x["pos"])
                - 0.5 * sum((f ** 2).sum() for f in (s.h, s.g, s.vel)))

    def rev_one(zz):
        s, _ = reverse_core(params, cfg, to_sys(zz))
        return {"h": s.h[0], "g": s.g[0], "pos": s.pos[0], "vel": s.vel[0]}

    def propose(kk, n):
        z = {nm: jax.random.normal(jax.random.fold_in(kk, i), (n, N, dd),
                                   jnp.float32)
             for i, (nm, dd) in enumerate(
                 [("h", NF), ("g", NF), ("pos", 3), ("vel", 3)])}
        return jax.vmap(rev_one)(z)

    return log_q0, log_p, propose


def reps_of(fn, n_particles, seed0):
    vals = []
    for r in range(REPS):
        kz, ks = jax.random.split(jax.random.fold_in(
            jax.random.PRNGKey(seed0), r))
        vals.append(float(fn(ks, kz, n_particles)))
    return (float(np.mean(vals)), float(np.std(vals, ddof=1) / np.sqrt(REPS)),
            [round(v, 3) for v in vals])


def main():
    log_q0, log_p, propose = build()
    prop_jit = jax.jit(propose, static_argnums=1)
    out, t0 = {}, time.time()

    def report(name, mean, se, reps=None):
        out[name] = {"log_Z": round(mean, 3), "se": round(se, 3),
                     **({"reps": reps} if reps else {})}
        print(f"{name:>28}: {mean:.3f} +- {se:.3f}"
              + (f"  {reps}" if reps else ""), flush=True)

    if "is" not in SKIP:
        def one(ks, kz, n):  # AIS with a length-1 ladder = plain IS
            return ais(ks, prop_jit(kz, n), log_q0=log_q0, log_p=log_p,
                       n_temps=1, mcmc_steps=0, step_size=0.05,
                       n_leapfrog=1).log_Z
        report("importance sampling LB", *reps_of(jax.jit(one,
               static_argnums=2), P, 50))
    if "ais" not in SKIP:
        def one(ks, kz, n):
            return ais(ks, prop_jit(kz, n), log_q0=log_q0, log_p=log_p,
                       n_temps=TEMPS, mcmc_steps=SWEEPS, step_size=0.05,
                       n_leapfrog=5).log_Z
        report(f"fixed-ladder AIS LB (K={TEMPS})", *reps_of(jax.jit(one,
               static_argnums=2), P, 60))
    if "smc" not in SKIP:
        def one(ks, kz, n):
            return smc(ks, prop_jit(kz, n), log_q0=log_q0, log_p=log_p,
                       n_temps=TEMPS, mcmc_steps=SWEEPS, step_size=0.05,
                       n_leapfrog=5, adapt_step=True,
                       precondition=True).log_Z
        report(f"fixed-ladder SMC LB (K={TEMPS})", *reps_of(jax.jit(one,
               static_argnums=2), P, 70))
    if "asmc" not in SKIP:
        def one(ks, kz, n):
            return smc(ks, prop_jit(kz, n), log_q0=log_q0, log_p=log_p,
                       n_temps=TEMPS, adaptive=True, target_ess_frac=0.6,
                       mcmc_steps=SWEEPS, step_size=0.05, n_leapfrog=5,
                       adapt_step=True, precondition=True).log_Z
        report("adaptive SMC LB", *reps_of(jax.jit(one,
               static_argnums=2), P, 80))
    if "ti" not in SKIP:
        res = thermodynamic_integration(
            jax.random.PRNGKey(90), prop_jit(jax.random.PRNGKey(91),
                                             TI_CHAINS),
            log_q0=log_q0, log_p=log_p, n_nodes=TI_NODES,
            n_steps=TI_STEPS, n_warmup=TI_STEPS // 3,
            step_size=0.08, step_size_final=0.025,
            adapt_step=True, precondition=True, chunk_steps=TI_CHUNK)
        print("# TI betas:", np.asarray(res.betas).round(4).tolist(),
              file=sys.stderr)
        print("# TI node means:",
              np.asarray(res.node_mean).round(2).tolist(), file=sys.stderr)
        print("# TI accept:", np.asarray(res.accept).round(2).tolist(),
              file=sys.stderr)
        report("thermodynamic integration", float(res.log_Z),
               float(jnp.sqrt(res.se ** 2 + res.quad_err ** 2)))
        out["thermodynamic integration"]["quad_err"] = round(
            float(res.quad_err), 3)
        out["thermodynamic integration"]["node_mean"] = \
            np.asarray(res.node_mean).round(3).tolist()
        out["thermodynamic integration"]["accept"] = \
            np.asarray(res.accept).round(3).tolist()

    out["wall_s"] = round(time.time() - t0, 1)
    out["config"] = {"target": TARGET, "N": N, "kBT": KBT, "P": P,
                     "reps": REPS,
                     "temps": TEMPS, "sweeps": SWEEPS,
                     "pos_update": POS_UPDATE,
                     "flow": E("ALZ_VI_CACHE") or E("ALZ_CKPT")}
    lbs = [v["log_Z"] for k, v in out.items()
           if isinstance(v, dict) and " LB" in f" {k}"]
    if lbs:
        print(f"\nbinding lower bound: {max(lbs):.3f} — any MBAR below "
              "this is ladder-mixing-biased (r5 arbitration)")
    if E("ALZ_JSON"):
        with open(E("ALZ_JSON"), "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", E("ALZ_JSON"))


if __name__ == "__main__":
    main()
