"""Periodic LJ-fluid quality gate: drift-flow SMC vs HMC moments.

The fluid analogue of ``quality_lj13.py`` for the r5 additions
(``lj_fluid`` target + ``position_update='drift'``): N=32 argon-like fluid
at the reference generate-scale density (rho* ~ 0.117, kBT* = 1 — 120 K;
reference ``example/generate.yaml:8-15`` scaled down), one chip:

  1. flow-VI train a DRIFT flow (PBC-compatible learned translation)
     against the periodic target, wall full strength from step 0 and
     softening-only anneal (the r5 recipe — RESULTS.md r5 run A shows an
     annealed wall wedges pair-collapse behind consistent estimators)
  2. ground truth: dual-averaged HMC on the exact target
  3. replicated drift-flow SMC (adaptive tempering, chunked)

Observables are RAW (uncapped): pair LJ energy U under the cutoff, and
the coordination count N_c (pairs within 1.5 sigma) — the r5 lesson is
that every capped/internal-consistency diagnostic is blind to a shared
wedged basin; only absolute observables arbitrate.

Prints ONE JSON line. Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/quality_fluid.py
(~10 min on a v5e chip including compiles.)
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402
from enflow_tpu.data.system import System  # noqa: E402
from enflow_tpu.flow import FlowConfig, init_flow, forward_core, \
    reverse_core  # noqa: E402
from enflow_tpu.nn.egcl import EGCLConfig  # noqa: E402
from enflow_tpu.sample import dual_averaging_warmup, run_hmc, \
    systematic_resample, targets  # noqa: E402
from enflow_tpu.sample.smc import ess_from_log_weights, smc_segments  # noqa: E402
from enflow_tpu.sample.vi import flow_vi_loss, make_system_target, \
    sample_base  # noqa: E402
from enflow_tpu.utils import conversion as cv  # noqa: E402

N_ATOMS, NODE_NF, HIDDEN = 32, 5, 64
BOX, KBT, CUTOFF, E_CAP = 6.5, 1.0, 3.0, 500.0   # rho* = 32/6.5^3 ~ 0.117
POS_UPDATE = os.environ.get("QFLUID_POS_UPDATE", "drift")
VI_STEPS = int(os.environ.get("QFLUID_VI_STEPS", 4000))
# optional cross-invocation cache of the trained VI params (as in the
# lj13/lj55 gates): lets estimator studies (scripts/arbitrate_logz.py
# with ALZ_TARGET=lj_fluid) reuse the gate's flow
VI_CACHE = os.environ.get("QFLUID_VI_CACHE", "")
VI_ANNEAL, VI_P = 1500, 256
HMC_CHAINS, HMC_SAMPLES, HMC_WARMUP = 64, 1000, 300
SMC_P, SMC_MAX_TEMPS, SMC_SWEEPS, SMC_REPS = 1024, 32, 3, 4
DTYPE = jnp.float32


def observables(pos):
    """Raw (uncapped) per-configuration observables on ``[..., N, 3]``:
    cutoff LJ energy and the 1.5-sigma coordination count."""
    p = pos.reshape(-1, N_ATOMS, 3)
    diff = p[:, :, None, :] - p[:, None, :, :]
    diff = diff - jnp.round(diff / BOX) * BOX
    d2 = (diff * diff).sum(-1)
    iu = jnp.triu(jnp.ones((N_ATOMS, N_ATOMS), dtype=bool), k=1)[None]
    valid = iu & (d2 < CUTOFF * CUTOFF) & (d2 > 0.0)
    r6 = jnp.where(valid, d2, 1.0) ** 3
    e = 4.0 * (1.0 / (r6 * r6) - 1.0 / r6)
    u = jnp.where(valid, e, 0.0).sum(axis=(1, 2))
    nc = (iu & (d2 < 1.5 * 1.5) & (d2 > 0.0)).sum(axis=(1, 2))
    shape = pos.shape[:-2]
    return u.reshape(shape), nc.astype(u.dtype).reshape(shape)


def main():
    t0 = time.time()
    bench.enable_compilation_cache()
    cfg = FlowConfig(n_iter=5, dt=float(cv.time_to_lj(1.0, "pico")),
                     egcl=EGCLConfig(node_nf=NODE_NF, hidden_nf=HIDDEN,
                                     compute_dtype="bfloat16"),
                     nbr_mode="all_pairs", exact_ldj=True, remat=True,
                     position_update=POS_UPDATE)
    params = init_flow(jax.random.PRNGKey(0), cfg, DTYPE)
    target = targets.lj_fluid(N_ATOMS, box=BOX, kBT=KBT, softening=0.0,
                              cutoff=CUTOFF, e_cap=E_CAP)

    # ---- 1. drift-flow VI (full wall, softening-only anneal) -------------
    import optax
    opt = optax.chain(
        optax.stateless(lambda updates, params=None: jax.tree_util.tree_map(
            lambda g: jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0),
            updates)),
        optax.clip_by_global_norm(5.0),
        optax.adam(1e-3))
    opt_state = opt.init(params)

    def sys_target(soft):
        return make_system_target(
            lambda x: target.log_prob(x, softening=soft), 1.0)

    @jax.jit
    def vi_step(params, opt_state, key, soft):
        batch = sample_base(key, VI_P, N_ATOMS, NODE_NF, box=BOX,
                            r_cut=CUTOFF, dtype=DTYPE)
        loss, grads = jax.value_and_grad(
            lambda p: flow_vi_loss(p, cfg, batch, sys_target(soft))[0]
        )(params)
        upd, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    if VI_CACHE and os.path.exists(VI_CACHE):
        with np.load(VI_CACHE) as z:
            flat, tree = jax.tree_util.tree_flatten(params)
            params = jax.tree_util.tree_unflatten(
                tree, [jnp.asarray(z[f"p{i}"]) for i in range(len(flat))])
        vi_range = range(0)
    else:
        vi_range = range(VI_STEPS)
    for i in vi_range:
        soft = 0.2 * max(0.0, 1.0 - i / VI_ANNEAL)
        params, opt_state, loss = vi_step(
            params, opt_state, jax.random.PRNGKey(10 + i),
            jnp.asarray(soft, DTYPE))
        if i % 500 == 0:
            print(f"# VI step {i}: loss {float(loss):.1f} "
                  f"(t={time.time() - t0:.0f}s)", file=sys.stderr,
                  flush=True)
    if len(vi_range) and VI_CACHE:
        flat, _ = jax.tree_util.tree_flatten(params)
        np.savez(VI_CACHE, **{f"p{i}": np.asarray(l)
                              for i, l in enumerate(flat)})
    t_vi = time.time() - t0

    # ---- 2. replicated drift-flow SMC ------------------------------------
    mask = jnp.ones((1, N_ATOMS), bool)
    boxa = jnp.full((1, 3), BOX, DTYPE)
    r_cut = jnp.full((1,), CUTOFF, DTYPE)

    def to_system(x):
        return System(h=x["h"][None], g=x["g"][None], pos=x["pos"][None],
                      vel=x["vel"][None], mask=mask, box=boxa, r_cut=r_cut)

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

    propose = jax.jit(lambda kk: jax.vmap(rev_one)({
        "h": jax.random.normal(jax.random.fold_in(kk, 0),
                               (SMC_P, N_ATOMS, NODE_NF), DTYPE),
        "g": jax.random.normal(jax.random.fold_in(kk, 1),
                               (SMC_P, N_ATOMS, NODE_NF), DTYPE),
        "pos": jax.random.normal(jax.random.fold_in(kk, 2),
                                 (SMC_P, N_ATOMS, 3), DTYPE),
        "vel": jax.random.normal(jax.random.fold_in(kk, 3),
                                 (SMC_P, N_ATOMS, 3), DTYPE)}))

    reps, logzs, esss = [], [], []
    for r in range(SMC_REPS):
        kz, ks = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(5),
                                                     r))
        res = smc_segments(
            ks, propose(kz), log_q0=log_q0, log_p=log_p,
            n_temps=SMC_MAX_TEMPS, adaptive=True, target_ess_frac=0.3,
            mcmc_steps=SMC_SWEEPS, step_size=0.02, n_leapfrog=5,
            adapt_step=True, precondition=True, chunk_temps=8)
        assert float(res.beta_history[-1]) > 1.0 - 1e-5, "anneal incomplete"
        lw = res.log_weights - jax.scipy.special.logsumexp(res.log_weights)
        w = jnp.exp(lw)
        u, nc = observables(res.particles["pos"])
        reps.append({"U": float((w * u).sum()), "Nc": float((w * nc).sum())})
        logzs.append(float(res.log_Z))
        esss.append(float(ess_from_log_weights(res.log_weights)))
        print(f"# SMC rep {r}: log_Z={logzs[-1]:.2f} ESS={esss[-1]:.0f}",
              file=sys.stderr, flush=True)
    m_smc = {}
    for name in ("U", "Nc"):
        vals = np.array([m[name] for m in reps])
        m_smc[name] = float(vals.mean())
        m_smc[name + "_se"] = float(vals.std(ddof=1) / np.sqrt(len(vals)))
    m_smc["ess"] = float(np.mean(esss))
    t_smc = time.time() - t0 - t_vi

    # ---- 3. HMC ground truth (seeded from SMC) ---------------------------
    idx = systematic_resample(jax.random.PRNGKey(6), lw, n=HMC_CHAINS)
    x0h = res.particles["pos"][idx]
    eps, x0h = dual_averaging_warmup(jax.random.PRNGKey(2), x0h,
                                     target.log_prob, n_adapt=200,
                                     n_leapfrog=10, init_step_size=0.02)
    hres = run_hmc(jax.random.PRNGKey(3), x0h, target.log_prob,
                   n_samples=HMC_SAMPLES, n_warmup=HMC_WARMUP,
                   step_size=eps, n_leapfrog=10)
    u, nc = observables(hres.samples)               # [S, C]
    m_hmc = {}
    for name, f in (("U", u), ("Nc", nc)):
        cm = np.asarray(f.mean(axis=0))
        m_hmc[name] = float(cm.mean())
        m_hmc[name + "_se"] = float(cm.std(ddof=1) / np.sqrt(cm.shape[0]))
    m_hmc["accept"] = round(float(hres.accept_rate), 3)
    t_hmc = time.time() - t0 - t_vi - t_smc

    sig = lambda a, b, sa, sb: abs(a - b) / max((sa ** 2 + sb ** 2) ** 0.5,
                                                1e-12)
    print(json.dumps({
        "metric": "fluid_quality",
        "system": {"n_atoms": N_ATOMS, "box": BOX, "rho": N_ATOMS / BOX**3,
                   "kBT": KBT, "cutoff": CUTOFF},
        "flow": {"hidden": HIDDEN, "position_update": POS_UPDATE,
                 "vi_steps": VI_STEPS},
        "hmc": m_hmc, "smc": m_smc,
        "U_sigma": round(sig(m_hmc["U"], m_smc["U"], m_hmc["U_se"],
                             m_smc["U_se"]), 2),
        "Nc_sigma": round(sig(m_hmc["Nc"], m_smc["Nc"], m_hmc["Nc_se"],
                              m_smc["Nc_se"]), 2),
        "smc_log_Z": round(float(np.mean(logzs)), 2),
        "smc_log_Z_se": round(float(np.std(logzs, ddof=1)
                                    / np.sqrt(len(logzs))), 3),
        "wall_s": {"vi": round(t_vi, 1), "smc": round(t_smc, 1),
                   "hmc": round(t_hmc, 1)},
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
