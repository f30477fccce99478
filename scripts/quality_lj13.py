"""Posterior-moment parity: VI-trained flow-SMC vs HMC on the true LJ13 target.

The BASELINE.md quality criterion: "posterior moments (energies, radii of
gyration) within Monte-Carlo error". This script reproduces the check
end-to-end on one chip:

  1. flow-VI train (annealed softening/e_cap) against LJ13, kBT=2, c_osc=0.5
  2. ground truth: dual-averaged HMC, many chains, on the exact target
  3. flow-proposal SMC (adaptive tempering + HMC rejuvenation, exact-ldj
     pushforward density) -> importance-weighted moment estimates

Prints one JSON line with both estimates and their sigma-distance.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/quality_lj13.py
(~6 min on a v5e chip including compiles; scale knobs below.)
"""

import dataclasses
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from enflow_tpu.data.system import System
from enflow_tpu.flow import FlowConfig, init_flow, forward_core, reverse_core
from enflow_tpu.nn.egcl import EGCLConfig
from enflow_tpu.sample import dual_averaging_warmup, run_hmc, smc, targets
from enflow_tpu.sample.vi import flow_vi_loss, make_system_target, sample_base

N_ATOMS, NODE_NF, HIDDEN, FLOW_STEPS = 13, 5, 128, 5
KBT, C_OSC = 2.0, 0.5
VI_STEPS, VI_P = 8000, 512
import os as _os
# 'shift' (default — the frozen r1-r5 gate config) | 'coupled'. When
# coupled, the wall is held at FULL strength through the anneal
# (cap_start = cap_final): position-transporting flows wedge into the
# annealed wall (RESULTS.md r5 runs A/C measured the shift flow wedging
# at LJ55 too, but the frozen LJ13 gate keeps its committed recipe for
# round-over-round comparability — N=13 measured clean since r1).
POS_UPDATE = _os.environ.get("QLJ13_POS_UPDATE", "shift")
# numerics knobs for the log_Z noise-bias probe (r5): symmetric per-
# particle log-weight noise INFLATES logsumexp-based log_Z estimates
# (convexity), and the coupled flow amplifies bf16/f32 round-off through
# exp(S) — compare float32+bfloat16 against float64 to expose it
PRECISION = _os.environ.get("QLJ13_PRECISION", "float32")
COMPUTE_DTYPE = _os.environ.get("QLJ13_COMPUTE_DTYPE", "bfloat16") or None
# optional cross-invocation cache of the trained VI params (as in
# quality_lj55.py): lets follow-up estimator studies (e.g. the r5 MBAR
# mixing-bias calibration) reuse the gate's flow
VI_CACHE = _os.environ.get("QLJ13_VI_CACHE", "")
HMC_CHAINS, HMC_SAMPLES = 64, 1500
SMC_P, SMC_MAX_TEMPS, SMC_SWEEPS = 1024, 40, 6
SMC_REPS = 8   # independent replicates: resampling correlates particle
               # ancestries, so the within-run ESS-based SE understates the
               # true Monte-Carlo error — replicate scatter is the honest SE

DTYPE = jnp.float64 if PRECISION == "float64" else jnp.float32


def observables(pos):
    """Per-sample (LJ energy U, radius of gyration) for ``pos [..., n, 3]``.

    U is the pure LJ cluster energy (no oscillator term): -log_prob of the
    kBT=1, c_osc=0 target."""
    t = targets.lj_cluster(N_ATOMS, kBT=1.0, c_osc=0.0)
    u = -jax.vmap(t.log_prob)(pos.reshape(-1, N_ATOMS, 3)).reshape(
        pos.shape[:-2])
    com = pos.mean(axis=-2, keepdims=True)
    rg = jnp.sqrt(((pos - com) ** 2).sum(-1).mean(-1))
    return u, rg


def moments_weighted(pos, w):
    """Importance-weighted estimates with ESS-based standard errors."""
    u, rg = observables(pos)
    mean = lambda f: float((w * f).sum())
    ess = float(1.0 / (w ** 2).sum())
    se = lambda f: float(jnp.sqrt((w * (f - (w * f).sum()) ** 2).sum() / ess))
    return {"U": mean(u), "U_se": se(u), "Rg": mean(rg), "Rg_se": se(rg),
            "ess": ess}


def moments_chains(samples):
    """MCMC estimates with honest errors from independent-chain means:
    ``samples [S, C, n, 3]`` -> se = std(chain means)/sqrt(C)."""
    u, rg = observables(samples)          # [S, C]
    out = {}
    for name, f in (("U", u), ("Rg", rg)):
        cm = f.mean(axis=0)               # [C] per-chain means
        out[name] = float(cm.mean())
        out[name + "_se"] = float(cm.std(ddof=1) / np.sqrt(cm.shape[0]))
    return out


def main():
    t0 = time.time()
    if PRECISION == "float64":
        jax.config.update("jax_enable_x64", True)
    cfg = FlowConfig(n_iter=FLOW_STEPS, dt=0.05,
                     egcl=EGCLConfig(node_nf=NODE_NF, hidden_nf=HIDDEN,
                                     compute_dtype=(None if COMPUTE_DTYPE
                                                    in ("none", None)
                                                    else COMPUTE_DTYPE)),
                     nbr_mode="all_pairs", exact_ldj=True,
                     position_update=POS_UPDATE)
    params = init_flow(jax.random.PRNGKey(0), cfg, DTYPE)
    target = targets.lj_cluster(N_ATOMS, kBT=KBT, c_osc=C_OSC)

    # ---- 1. flow-VI training with annealed softening/e_cap ---------------
    import optax
    # zero_nans: a coincident-atom flow draw at softening ~0 can NaN one
    # batch gradient; skip that step instead of destroying the params
    opt = optax.chain(optax.zero_nans(), optax.clip_by_global_norm(5.0),
                      optax.adam(1e-3))
    opt_state = opt.init(params)

    def sys_target(soft, cap):
        return make_system_target(
            lambda x: target.log_prob(x, softening=soft, e_cap=cap), 1.0)

    @jax.jit
    def vi_step(params, opt_state, key, soft, cap):
        batch = sample_base(key, VI_P, N_ATOMS, NODE_NF, box=1e3, r_cut=1e2,
                            dtype=DTYPE)
        loss, grads = jax.value_and_grad(
            lambda p: flow_vi_loss(p, cfg, batch, sys_target(soft, cap))[0]
        )(params)
        upd, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    anneal = int(0.5 * VI_STEPS)
    cap_start = 100.0 if POS_UPDATE == "shift" else 500.0   # see POS_UPDATE
    import os as _osp
    if VI_CACHE and _osp.path.exists(VI_CACHE):
        with np.load(VI_CACHE) as z:
            flat, tree = jax.tree_util.tree_flatten(params)
            params = jax.tree_util.tree_unflatten(
                tree, [jnp.asarray(z[f"p{i}"]) for i in range(len(flat))])
        vi_range = range(0)
    else:
        vi_range = range(VI_STEPS)
    for i in vi_range:
        frac = max(0.0, 1.0 - i / anneal)
        soft = 0.2 * frac
        cap = 1.0 / (frac / cap_start + (1.0 - frac) / 500.0)
        params, opt_state, loss = vi_step(
            params, opt_state, jax.random.PRNGKey(10 + i), soft, cap)
    if len(vi_range):
        loss.block_until_ready()
        if VI_CACHE:
            flat, _ = jax.tree_util.tree_flatten(params)
            np.savez(VI_CACHE, **{f"p{i}": np.asarray(l)
                                  for i, l in enumerate(flat)})
    t_vi = time.time() - t0

    # ---- 2. flow-SMC with the corrected pushforward density ---------------
    mask = jnp.ones((1, N_ATOMS), bool)
    box = jnp.full((1, 3), 1e3, DTYPE)
    r_cut = jnp.full((1,), 1e2, DTYPE)

    def to_system(x):
        return System(h=x["h"][None], g=x["g"][None], pos=x["pos"][None],
                      vel=x["vel"][None], mask=mask, box=box, r_cut=r_cut)

    def gauss(s):
        return -0.5 * sum((f * f).sum() for f in (s.h, s.g, s.vel))

    def log_q0(x):
        out, ldj = forward_core(params, cfg, to_system(x))
        return gauss(out) - 0.5 * (out.pos ** 2).sum() + ldj[0]

    def log_p(x):
        return target.log_prob(x["pos"]) + gauss(to_system(x))

    def rev_one(zz):
        s, _ = reverse_core(params, cfg, to_system(zz))
        return {"h": s.h[0], "g": s.g[0], "pos": s.pos[0], "vel": s.vel[0]}

    smc_jit = jax.jit(lambda k, x: smc(
        k, x, log_q0=log_q0, log_p=log_p, n_temps=SMC_MAX_TEMPS,
        adaptive=True, target_ess_frac=0.5, mcmc_steps=SMC_SWEEPS,
        step_size=0.02, n_leapfrog=5))

    reps, logzs, esss = [], [], []
    for r in range(SMC_REPS):
        kz, ks_r = jax.random.split(jax.random.fold_in(
            jax.random.PRNGKey(5), r))
        kk = jax.random.split(kz, 4)
        z = {"h": jax.random.normal(kk[0], (SMC_P, N_ATOMS, NODE_NF), DTYPE),
             "g": jax.random.normal(kk[1], (SMC_P, N_ATOMS, NODE_NF), DTYPE),
             "pos": jax.random.normal(kk[2], (SMC_P, N_ATOMS, 3), DTYPE),
             "vel": jax.random.normal(kk[3], (SMC_P, N_ATOMS, 3), DTYPE)}
        x0s = jax.vmap(rev_one)(z)
        res_smc = smc_jit(ks_r, x0s)
        jax.block_until_ready(res_smc.particles)
        assert float(res_smc.beta_history[-1]) > 1.0 - 1e-5, "anneal incomplete"
        lw = (res_smc.log_weights
              - jax.scipy.special.logsumexp(res_smc.log_weights))
        reps.append(moments_weighted(res_smc.particles["pos"], jnp.exp(lw)))
        logzs.append(float(res_smc.log_Z))
        esss.append(float(res_smc.ess_history[-1]))
    m_smc = {}
    for name in ("U", "Rg"):
        vals = np.array([m[name] for m in reps])
        m_smc[name] = float(vals.mean())
        m_smc[name + "_se"] = float(vals.std(ddof=1) / np.sqrt(len(vals)))
    m_smc["ess"] = float(np.mean(esss))
    m_smc["reps"] = SMC_REPS
    t_smc = time.time() - t0 - t_vi

    # ---- 3. HMC ground truth on the exact target --------------------------
    # Chains start from SMC-resampled states: exact MCMC regardless of the
    # init, but a cold random init can trap chains at astronomical LJ
    # energies (overlapping atoms) that 300 warmup sweeps never escape —
    # observed directly on-chip (stuck-chain U_se ~ 1e11). Init quality
    # only affects burn-in, not the stationary distribution the parity
    # check compares against.
    from enflow_tpu.sample import systematic_resample

    idx = systematic_resample(jax.random.PRNGKey(6), lw, n=HMC_CHAINS)
    x0h = res_smc.particles["pos"][idx]
    eps, x0h = dual_averaging_warmup(jax.random.PRNGKey(2), x0h,
                                     target.log_prob, n_adapt=200,
                                     n_leapfrog=10, init_step_size=0.05)
    res = run_hmc(jax.random.PRNGKey(3), x0h, target.log_prob,
                  n_samples=HMC_SAMPLES, n_warmup=300, step_size=eps,
                  n_leapfrog=10)
    m_hmc = moments_chains(res.samples)   # [S, C, n, 3]
    m_hmc["accept"] = round(float(res.accept_rate), 3)
    t_hmc = time.time() - t0 - t_vi - t_smc

    sig = lambda a, b, sa, sb: abs(a - b) / max((sa ** 2 + sb ** 2) ** 0.5,
                                                 1e-12)
    print(json.dumps({
        "position_update": POS_UPDATE,
        "hmc": m_hmc, "smc": m_smc,
        "U_sigma": round(sig(m_hmc["U"], m_smc["U"], m_hmc["U_se"],
                             m_smc["U_se"]), 2),
        "Rg_sigma": round(sig(m_hmc["Rg"], m_smc["Rg"], m_hmc["Rg_se"],
                              m_smc["Rg_se"]), 2),
        "log_Z": round(float(np.mean(logzs)), 3),
        "log_Z_se": round(float(np.std(logzs, ddof=1)
                                / np.sqrt(len(logzs))), 3),
        "final_ess": round(float(np.mean(esss)), 1),
        "wall_s": {"vi": round(t_vi, 1), "hmc": round(t_hmc, 1),
                   "smc": round(t_smc, 1)},
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
