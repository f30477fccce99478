"""LJ55 quality freeze: VI-trained flow-SMC vs HMC moments + MBAR log_Z.

VERDICT r3 item 2 — the LJ55 analogue of ``quality_lj13.py``: without an
independent cross-check, a sampling bias at the round-over-round large-N
line would be invisible (the two r3 Jensen-bound log_Z values disagreed by
13 nats with nothing to arbitrate). This script runs, on one chip:

  1. flow-VI training per the committed recipe (``example/vi_lj55.yaml``:
     annealed softening 0.2->0 and e_cap 200->2000 over the first 25 of 40
     epochs — the bare LJ55 target NaNs at VI step ~1 without it)
  2. replicated flow-SMC (adaptive tempering, HMC rejuvenation, exact-ldj
     pushforward density) -> importance-weighted U / Rg with replicate SEs.
     Runs CHUNKED (smc_segments + one UNAVAILABLE retry): a monolithic
     64-temp LJ55 anneal died mid-execution on this tunnel in r3.
  3. HMC ground truth on the same target (chains seeded from SMC output —
     cold inits strand N=55 chains at astronomic energies)
  4. flow-bridged REMC + MBAR -> the asymptotically unbiased log_Z with
     chain-column block SEs (SMC's log_Z is a Jensen lower bound)

Target: exact LJ55 cluster (softening 0), kBT=2, c_osc=0.5, with
e_cap=2000 as a guard rail far above the thermal typical set (U ~ -230);
identical target for SMC, HMC and REMC so the parity is internally exact.

Prints ONE JSON line. Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/quality_lj55.py
(~25 min on a v5e chip including compiles.)
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
from enflow_tpu.data.system import System  # noqa: E402
from enflow_tpu.flow import FlowConfig, init_flow, forward_core, \
    reverse_core  # noqa: E402
from enflow_tpu.nn.egcl import EGCLConfig  # noqa: E402
from enflow_tpu.sample import dual_averaging_warmup, run_hmc, \
    systematic_resample, targets  # noqa: E402
from enflow_tpu.sample.smc import smc_segments  # noqa: E402
from enflow_tpu.sample.remc import remc_segments  # noqa: E402
from enflow_tpu.sample.mbar import mbar, mbar_block_log_z, \
    mbar_from_remc  # noqa: E402
from enflow_tpu.sample.vi import flow_vi_loss, make_system_target, \
    sample_base  # noqa: E402

import os as _os

N_ATOMS, NODE_NF = 55, 5
# flow-capacity study knobs (env-overridable): the r4 finding is that flow
# capacity/training binds LJ55 quality, so these are the dials to sweep
HIDDEN = int(_os.environ.get("QLJ55_HIDDEN", 128))
FLOW_STEPS = int(_os.environ.get("QLJ55_FLOW_STEPS", 5))
# 'shift' | 'coupled' — the r4 flow-FAMILY fix (learned L2HMC-style drift;
# flow/integrators.py FlowConfig docs): the shift drift moves positions at
# most ~n_iter*dt ~ 0.04 sigma from the base draw, which is the structural
# reason the r4 gate found SMC 15 sigma off HMC moments
POS_UPDATE = _os.environ.get("QLJ55_POS_UPDATE", "shift")
# tempered-VI start temperature (1.0 = untempered): anneal beta -> 1 over
# the same VI_ANNEAL window as softening/e_cap
BETA_START = float(_os.environ.get("QLJ55_BETA_START", 1.0))
# e_cap anneal start (default: the committed recipe's 200). For flows that
# can transport positions (coupled), a low early cap invites atom-collapse:
# the log-cap's gradient ~1/(1+u-cap) vanishes inside the wall, so a flow
# that contracts into overlap while the wall is ~100 nats cheap wedges
# there permanently. Set = E_CAP to hold the wall fixed through the anneal.
CAP_START = float(_os.environ.get("QLJ55_CAP_START", 200.0))
SOFT_START = float(_os.environ.get("QLJ55_SOFT_START", 0.2))
KBT, C_OSC, E_CAP = 2.0, 0.5, 2000.0
VI_STEPS = int(_os.environ.get("QLJS5_VI_STEPS",
                               _os.environ.get("QLJ55_VI_STEPS", 8000)))
VI_P = 256                            # 8000 = 2x vi_lj55.yaml: the 4000-
                                      # step flow left SMC ~19 sigma off
                                      # HMC moments (measured r4)
VI_ANNEAL = int(_os.environ.get("QLJ55_VI_ANNEAL", 2500))   # 25 epochs
VI_LR = float(_os.environ.get("QLJ55_VI_LR", 1e-3))
# base seed for EVERY RNG stream (init, VI, SMC, HMC, REMC): a second run
# with a different seed is an independent flow + independent sampler pass
# — the cross-flow reproducibility probe for the MBAR log_Z (the r4 LJ55
# number carried an unexplained ~24-nat cross-flow band; re-measure it on
# the proper target)
SEED = int(_os.environ.get("QLJ55_SEED", 0))
HMC_CHAINS, HMC_SAMPLES, HMC_WARMUP = 64, 800, 300
SMC_P, SMC_MAX_TEMPS, SMC_SWEEPS, SMC_CHUNK = 1024, 48, 3, 8
SMC_REPS = 6
# ladder knobs env-overridable: the r5 coupled run measured the committed
# K=16 ladder's cold end pinched (swap 0.04 at the last pair) — a denser
# cold end is the first dial against it
REMC_K = int(_os.environ.get("QLJ55_REMC_K", 16))
REMC_M = int(_os.environ.get("QLJ55_REMC_M", 64))
REMC_ROUNDS = int(_os.environ.get("QLJ55_REMC_ROUNDS", 120))
REMC_DISCARD = REMC_ROUNDS // 2

DTYPE = jnp.float32
# optional cross-invocation cache of the trained VI params (skip the ~7 min
# retrain when iterating on the sampler stages); empty string disables
import os as _os
VI_CACHE = _os.environ.get("QLJ55_VI_CACHE", "")


def _key(n):
    """Seed-offset PRNG stream: SEED=0 reproduces the r4/r5 streams
    bitwise; any other seed shifts every stream (independent flow +
    sampler replicate)."""
    import jax as _jax
    return _jax.random.PRNGKey(SEED * 1000 + n)


def observables(pos):
    t = targets.lj_cluster(N_ATOMS, kBT=1.0, c_osc=0.0)
    u = -jax.vmap(t.log_prob)(pos.reshape(-1, N_ATOMS, 3)).reshape(
        pos.shape[:-2])
    com = pos.mean(axis=-2, keepdims=True)
    rg = jnp.sqrt(((pos - com) ** 2).sum(-1).mean(-1))
    return u, rg


def moments_weighted(pos, w):
    u, rg = observables(pos)
    mean = lambda f: float((w * f).sum())
    return {"U": mean(u), "Rg": mean(rg)}


def moments_chains(samples):
    u, rg = observables(samples)          # [S, C]
    out = {}
    for name, f in (("U", u), ("Rg", rg)):
        cm = np.asarray(f.mean(axis=0))   # [C] per-chain means
        out[name] = float(cm.mean())
        out[name + "_se"] = float(cm.std(ddof=1) / np.sqrt(cm.shape[0]))
    return out


def retrying(f, *a):
    for attempt in range(3):
        try:
            out = f(*a)
            jax.block_until_ready(out)
            return out
        except Exception as e:
            if "UNAVAILABLE" not in str(e) or attempt == 2:
                raise
            # back off before re-dispatching: an IMMEDIATE retry re-hit the
            # same fault once (r4) — the tunnel needs a beat to recover
            print(f"# device UNAVAILABLE; retrying in 5 s: {e}",
                  file=sys.stderr, flush=True)
            time.sleep(5.0)


def main():
    t0 = time.time()
    bench.enable_compilation_cache()
    # dt matches the committed recipe EXACTLY (vi_lj55.yaml: dt = 1 ps =
    # 0.00718 reduced). A 0.05 first attempt trained a much weaker flow
    # whose adaptive anneal stalled inside a 48-temp budget.
    from enflow_tpu.utils import conversion as cv
    cfg = FlowConfig(n_iter=FLOW_STEPS, dt=float(cv.time_to_lj(1.0, "pico")),
                     egcl=EGCLConfig(node_nf=NODE_NF, hidden_nf=HIDDEN,
                                     compute_dtype="bfloat16"),
                     nbr_mode="all_pairs", exact_ldj=True, remat=True,
                     position_update=POS_UPDATE)
    params = init_flow(_key(0), cfg, DTYPE)
    target = targets.lj_cluster(N_ATOMS, kBT=KBT, c_osc=C_OSC,
                                softening=0.0, e_cap=E_CAP)

    # ---- 1. flow-VI with the vi_lj55.yaml anneal -------------------------
    import optax
    # nan_to_num (the driver's VI guard), NOT zero_nans: zero_nans passes
    # inf gradients through, and an inf reaching clip_by_global_norm scales
    # to NaN updates that destroy the params permanently — observed here at
    # N=55 (the first quality run NaN'd out of VI)
    opt = optax.chain(
        optax.stateless(lambda updates, params=None: jax.tree_util.tree_map(
            lambda g: jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0),
            updates)),
        optax.clip_by_global_norm(5.0),
        optax.adam(VI_LR))
    opt_state = opt.init(params)

    def sys_target(soft, cap, beta):
        return make_system_target(
            lambda x: beta * target.log_prob(x, softening=soft, e_cap=cap),
            1.0)

    @jax.jit
    def vi_step(params, opt_state, key, soft, cap, beta):
        batch = sample_base(key, VI_P, N_ATOMS, NODE_NF, box=1e3, r_cut=1e2,
                            dtype=DTYPE)
        loss, grads = jax.value_and_grad(
            lambda p: flow_vi_loss(p, cfg, batch,
                                   sys_target(soft, cap, beta))[0]
        )(params)
        upd, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    import os
    if VI_CACHE and os.path.exists(VI_CACHE):
        with np.load(VI_CACHE) as z:
            flat, tree = jax.tree_util.tree_flatten(params)
            params = jax.tree_util.tree_unflatten(
                tree, [jnp.asarray(z[f"p{i}"]) for i in range(len(flat))])
        print(f"# VI params loaded from {VI_CACHE}", file=sys.stderr,
              flush=True)
        vi_steps = 0
    else:
        vi_steps = VI_STEPS
    for i in range(vi_steps):
        frac = max(0.0, 1.0 - i / VI_ANNEAL)
        soft = SOFT_START * frac
        cap = 1.0 / (frac / CAP_START + (1.0 - frac) / E_CAP)
        beta = 1.0 + (BETA_START - 1.0) * frac
        params, opt_state, loss = vi_step(
            params, opt_state, _key(10 + i), soft, cap, beta)
        if i % 500 == 0:
            print(f"# VI step {i}: loss {float(loss):.1f} "
                  f"(soft {soft:.3f}, cap {cap:.0f}, "
                  f"t={time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
    if vi_steps:
        loss.block_until_ready()
        final_loss = float(loss)
        print(f"# VI done in {time.time() - t0:.0f} s, final loss "
              f"{final_loss:.1f}", file=sys.stderr, flush=True)
        # divergence check on the PARAMS, not the last batch: a single
        # poisoned draw can NaN one batch loss (the optimizer guard skips
        # it) without the flow being broken — evaluate a fresh batch
        eval_batch = sample_base(_key(999), VI_P, N_ATOMS,
                                 NODE_NF, box=1e3, r_cut=1e2, dtype=DTYPE)
        eval_loss = float(jax.jit(lambda p: flow_vi_loss(
            p, cfg, eval_batch, sys_target(0.0, E_CAP, 1.0))[0])(params))
        print(f"# VI eval loss {eval_loss:.1f}", file=sys.stderr, flush=True)
        assert np.isfinite(eval_loss), "VI diverged (NaN params)"
    t_vi = time.time() - t0
    if VI_CACHE and vi_steps:
        flat, tree = jax.tree_util.tree_flatten(params)
        np.savez(VI_CACHE, **{f"p{i}": np.asarray(l)
                              for i, l in enumerate(flat)})

    # ---- 2. replicated chunked flow-SMC ----------------------------------
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
        kz, ks_r = jax.random.split(jax.random.fold_in(
            _key(5), r))
        x0s = retrying(propose, kz)
        res_smc = smc_segments(
            ks_r, x0s, log_q0=log_q0, log_p=log_p,
            n_temps=SMC_MAX_TEMPS, adaptive=True,
            target_ess_frac=0.25,   # the r3-validated LJ55 setting — 0.5
                                    # stalls the anneal inside the budget
            mcmc_steps=SMC_SWEEPS, step_size=0.01, n_leapfrog=5,
            adapt_step=True, target_accept=0.65, precondition=True,
            chunk_temps=SMC_CHUNK, run_segment=retrying)
        assert float(res_smc.beta_history[-1]) > 1.0 - 1e-5, \
            "anneal incomplete — raise SMC_MAX_TEMPS"
        lw = (res_smc.log_weights
              - jax.scipy.special.logsumexp(res_smc.log_weights))
        reps.append(moments_weighted(res_smc.particles["pos"], jnp.exp(lw)))
        logzs.append(float(res_smc.log_Z))
        esss.append(float(res_smc.ess_history[-1]))
        print(f"# SMC rep {r}: log_Z={logzs[-1]:.2f} "
              f"ESS={esss[-1]:.0f}", file=sys.stderr, flush=True)
    m_smc = {}
    for name in ("U", "Rg"):
        vals = np.array([m[name] for m in reps])
        m_smc[name] = float(vals.mean())
        m_smc[name + "_se"] = float(vals.std(ddof=1) / np.sqrt(len(vals)))
    m_smc["ess"] = float(np.mean(esss))
    m_smc["reps"] = SMC_REPS
    t_smc = time.time() - t0 - t_vi

    # ---- 3. HMC ground truth (seeded from SMC) ---------------------------
    idx = systematic_resample(_key(6), lw, n=HMC_CHAINS)
    x0h = res_smc.particles["pos"][idx]
    eps, x0h = dual_averaging_warmup(_key(2), x0h,
                                     target.log_prob, n_adapt=200,
                                     n_leapfrog=10, init_step_size=0.01)
    res = run_hmc(_key(3), x0h, target.log_prob,
                  n_samples=HMC_SAMPLES, n_warmup=HMC_WARMUP,
                  step_size=eps, n_leapfrog=10)
    m_hmc = moments_chains(res.samples)
    m_hmc["accept"] = round(float(res.accept_rate), 3)
    m_hmc["step_size"] = round(float(eps), 5)
    t_hmc = time.time() - t0 - t_vi - t_smc
    print(f"# HMC done: accept {m_hmc['accept']}", file=sys.stderr,
          flush=True)

    # ---- 4. flow-bridged REMC + MBAR log_Z -------------------------------
    # K=12 ladder: N=55 energy fluctuations pinch coarse ladders (a K=6
    # geomspace measured swap acceptances collapsing 0.44 -> 0.06 downhill)
    betas = jnp.concatenate([jnp.zeros((1,)),
                             jnp.geomspace(0.02, 1.0, REMC_K - 1)])
    betas = betas.at[-1].set(1.0).astype(DTYPE)
    # per-slot leapfrog steps: cold slots need the dual-averaged beta=1
    # scale (~0.03) while hot slots mix faster with bigger moves — a single
    # 0.01 step left the K=12 ladder's cold swaps at 0.08 (r4 measurement)
    remc_steps = jnp.concatenate(
        [jnp.asarray([0.2]), jnp.geomspace(0.15, 0.03, REMC_K - 1)]
    ).astype(DTYPE)

    @jax.jit
    def draw_remc(kk):
        z = {"h": jax.random.normal(jax.random.fold_in(kk, 0),
                                    (REMC_K * REMC_M, N_ATOMS, NODE_NF),
                                    DTYPE),
             "g": jax.random.normal(jax.random.fold_in(kk, 1),
                                    (REMC_K * REMC_M, N_ATOMS, NODE_NF),
                                    DTYPE),
             "pos": jax.random.normal(jax.random.fold_in(kk, 2),
                                      (REMC_K * REMC_M, N_ATOMS, 3), DTYPE),
             "vel": jax.random.normal(jax.random.fold_in(kk, 3),
                                      (REMC_K * REMC_M, N_ATOMS, 3), DTYPE)}
        x = jax.vmap(rev_one)(z)
        return jax.tree_util.tree_map(
            lambda a: a.reshape((REMC_K, REMC_M) + a.shape[1:]), x)

    x0r = retrying(draw_remc, _key(7))
    # chunked (remc_segments): the monolithic 120-round program is a
    # ~60-90 s single execution, which RELIABLY faults on this tunnel
    # (3/3 attempts incl. backoff, r4) — bounded per-program segments with
    # per-segment retry are the fix the hazard note prescribes
    res_r = remc_segments(
        _key(8), x0r, log_p=log_p, log_q0=log_q0,
        betas=betas, n_rounds=REMC_ROUNDS, mcmc_steps=1,
        step_size=remc_steps, n_leapfrog=5, chunk_rounds=10,
        run_segment=retrying)
    u_kn, counts = mbar_from_remc(res_r, log_p, log_q0)
    states = np.repeat(np.arange(REMC_K), REMC_M)
    columns = np.tile(np.arange(REMC_M), REMC_K)
    # pool thinned post-discard beta=1 rounds (driver mbar_pool_rounds
    # pattern, excluding the final round already in x_final)
    idx_pool = np.unique(np.linspace(REMC_DISCARD, REMC_ROUNDS - 2, 5,
                                     dtype=int))
    pooled = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a)[idx_pool]).reshape(
            (-1,) + a.shape[2:]), res_r.samples)
    lp2 = jax.jit(jax.vmap(log_p))(pooled)
    lq2 = jax.jit(jax.vmap(log_q0))(pooled)
    u2 = -((1.0 - betas)[:, None] * lq2[None, :]
           + betas[:, None] * lp2[None, :])
    u_kn = jnp.concatenate([u_kn, u2], axis=1)
    counts = counts.at[-1].add(lp2.shape[0])
    states = np.concatenate([states, np.full(int(lp2.shape[0]),
                                             REMC_K - 1)])
    columns = np.concatenate(
        [columns, np.tile(np.arange(REMC_M),
                          int(lp2.shape[0]) // REMC_M)])
    # 200 self-consistent iterations leave ~0.24 nats/iter residual on the
    # ~300-nat LJ55 ladder span (measured) — iterate until flat
    mres = jax.jit(lambda u, c: mbar(u, c, n_iter=8000))(u_kn, counts)
    mbar_log_Z = -float(mres.f[-1] - mres.f[0])
    blocks = mbar_block_log_z(u_kn, states, columns, REMC_K, n_blocks=4,
                              n_iter=8000)
    t_remc = time.time() - t0 - t_vi - t_smc - t_hmc

    sig = lambda a, b, sa, sb: abs(a - b) / max((sa ** 2 + sb ** 2) ** 0.5,
                                                1e-12)
    logz_m, logz_se = float(np.mean(logzs)), float(
        np.std(logzs, ddof=1) / np.sqrt(len(logzs)))
    print(json.dumps({
        "metric": "lj55_quality",
        "flow": {"hidden": HIDDEN, "flow_steps": FLOW_STEPS,
                 "vi_steps": VI_STEPS, "position_update": POS_UPDATE,
                 "beta_start": BETA_START, "cap_start": CAP_START,
                 "seed": SEED, "remc_k": REMC_K},
        "hmc": m_hmc, "smc": m_smc,
        "U_sigma": round(sig(m_hmc["U"], m_smc["U"], m_hmc["U_se"],
                             m_smc["U_se"]), 2),
        "Rg_sigma": round(sig(m_hmc["Rg"], m_smc["Rg"], m_hmc["Rg_se"],
                              m_smc["Rg_se"]), 2),
        "smc_log_Z": round(logz_m, 2),
        "smc_log_Z_se": round(logz_se, 3),
        "mbar_log_Z": round(mbar_log_Z, 2),
        "mbar_log_Z_se": round(float(blocks.std(ddof=1)
                                     / np.sqrt(len(blocks))), 3),
        "mbar_converged": float(mres.converged),
        "remc_swap_accept": [round(float(s), 2)
                             for s in np.asarray(res_r.swap_accept)],
        "wall_s": {"vi": round(t_vi, 1), "smc": round(t_smc, 1),
                   "hmc": round(t_hmc, 1), "remc": round(t_remc, 1)},
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
