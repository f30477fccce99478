"""Thermodynamic integration along the flow bridge.

``log Z_p - log Z_q0 = \\int_0^1 E_{x ~ p_beta}[log_p(x) - log_q0(x)] dbeta``
with ``p_beta \\propto q0^{1-beta} p^beta`` — the identity behind TI /
the "law of thermodynamic integration" for free-energy differences.
When ``log_q0`` is a *normalized* density (the flow pushforward with the
exact log-det, as in the driver's sample mode), the integral is
``log Z_p`` itself.

Why this exists (r5 estimator arbitration, RESULTS.md): TI is the one
log_Z estimator family in the framework with NO logsumexp (no Jensen
bias), NO reweighting (no MBAR ladder-mixing bias) and NO resampling —
each node is a plain expectation under long tempered-HMC chains. At LJ13
it refereed a 1–1.7-nat disagreement between converged REMC+MBAR (low)
and fixed-ladder flow-SMC lower bounds (honest). Its costs are the
opposite trade: a quadrature error (controlled by the node grid, and
estimated here by grid halving) and per-node burn-in bias (controlled by
``n_warmup``); it produces expectations, not weighted particles.

No reference equivalent (the reference has no samplers at all); this is
framework-native capability alongside ``smc``/``ais``/``remc``+``mbar``.

Validity diagnostics (read them — TI fails LOUDLY, unlike MBAR): TI is
only as good as per-node mixing, and the geometric bridge
``q0^(1-beta) p^beta`` inherits the FLOW's conditioning at every node
through the ``(1-beta)`` term. On the N=32 fluid drift flow (a weak,
very stiff pushforward) the beta=0 node rejects ~100% of proposals at
any workable step size — per-chain adaptation and ensemble-mass
preconditioning both measured unable to rescue it — so the chains
freeze and every node reports the initial mean log-weight: a flat
``node_mean`` table at ~mean(log w) and a log_Z hundreds of nats below
the same-flow SMC lower bound (measured: -543 vs LB -16, RESULTS.md
r5). The tells, all surfaced in ``TIResult`` and warned about at
runtime: ``accept[0]`` near 0 (frozen q0 end), a node table flat at the
IS mean log-weight, and a TI value below a same-flow SMC/AIS bound.
Where the flow is strong (LJ13/LJ55 coupled flows) the same estimator
agrees with the SMC bound to ~0.01 nats; where it is weak, trust the
SMC bound and treat TI's failure as a flow-conditioning report.

TPU notes: one jitted node program (beta / step size are traced scalars
— a single compile serves every node), internally a ``fori_loop`` of
``tempered_hmc_kernel_batched`` sweeps with the same component-gradient
caching the SMC anneal uses: each sweep costs exactly ``n_leapfrog``
flow value-and-grads. Nodes run as separate dispatches (a Python loop),
which keeps per-program wall time modest — the same chunking discipline
as ``smc_segments`` (long monolithic programs fault the axon tunnel) —
and makes the per-node ``run_node`` retry hook natural.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .mcmc import batched_value_and_grad, tempered_hmc_kernel_batched
from .smc import _ensemble_mass


class TIResult(NamedTuple):
    log_Z: jax.Array       # trapezoid estimate of log(Z_p / Z_q0)
    se: jax.Array          # statistical SE (across-chain, trapezoid-weighted)
    quad_err: jax.Array    # |full-grid - half-grid| quadrature-error estimate
    betas: jax.Array       # [K] node grid
    node_mean: jax.Array   # [K] E_beta[log_p - log_q0] estimates
    node_se: jax.Array     # [K] across-chain SEs of the node means
    accept: jax.Array      # [K] mean HMC acceptance per node (post-warmup
                           # only when adapt_step)
    x: Any                 # final chains (at betas[-1] = 1: target draws)
    step_size: jax.Array = None  # [K] per-node step sizes actually used
                                 # (post-adaptation when adapt_step)


def geometric_grid(n_nodes: int, beta_min: float = 0.01):
    """``[0] + geomspace(beta_min, 1, n_nodes-1)``: the TI integrand
    ``E_beta[log_p - log_q0]`` moves fastest near ``beta=0`` (the proposal
    end sees the raw target mismatch), so a geometric grid spends its
    nodes where the trapezoid error lives. Matches the grid that refereed
    the LJ13 arbitration."""
    if n_nodes < 3:
        raise ValueError(f"n_nodes={n_nodes}; need >= 3")
    return np.concatenate(
        [[0.0], np.geomspace(float(beta_min), 1.0, n_nodes - 1)])


def _trapezoid_weights(betas):
    d = jnp.diff(betas)
    w = jnp.zeros_like(betas)
    w = w.at[:-1].add(0.5 * d)
    w = w.at[1:].add(0.5 * d)
    return w


def thermodynamic_integration(
        key, x0, *, log_q0: Callable, log_p: Callable,
        betas=None, n_nodes: int = 25, beta_min: float = 0.01,
        n_steps: int = 400, n_warmup: int = 150,
        step_size: float = 0.08, step_size_final: float | None = None,
        n_leapfrog: int = 5, adapt_step: bool = False,
        target_accept: float = 0.65, precondition: bool = False,
        batched: bool = False, chunk_steps: int | None = None,
        run_node=None, jit=jax.jit) -> TIResult:
    """Estimate ``log(Z_p / Z_q0)`` by thermodynamic integration.

    Args:
      x0: ``[C, ...]`` chain-state pytree drawn from the proposal (flow
        draws — cold random inits strand LJ chains, same lesson as the
        quality gates).
      log_q0 / log_p: per-chain log-densities (or batched ``[C,...]->[C]``
        callables with ``batched=True``, e.g. shard_map densities).
      betas: optional explicit node grid (must start at 0 and end at 1);
        default :func:`geometric_grid` ``(n_nodes, beta_min)``.
      n_steps / n_warmup: tempered-HMC sweeps per node / discarded sweeps.
        Chains warm-start from the previous node (beta ascends), so
        ``n_warmup`` only has to re-equilibrate a small beta increment.
      step_size / step_size_final: HMC step size, linearly interpolated in
        beta from ``step_size`` at 0 to ``step_size_final`` (default
        ``step_size / 3``) at 1 — the tempered target sharpens as the
        physical term takes over.
      adapt_step: adapt the step size toward ``target_accept`` during each
        node's WARMUP sweeps only (multiplicative log-space updates),
        frozen before any kept sweep — the kept chain is a fixed valid
        kernel, so the estimator is unbiased exactly as without
        adaptation. Adaptation is PER CHAIN (a ``[C]`` step vector, using
        the kernel's per-particle step support): with a single global
        step, a few chains stranded in a pathological region (e.g. a
        zero-gradient e_cap plateau with huge flow-density curvature)
        drive the mean acceptance to ~0, the shared step collapses, and
        every chain freezes at its initial draw — measured on the N=32
        fluid drift flow, where the frozen ensemble reported a flat node
        table at the initial mean log-weight and a nonsense log_Z 500
        nats below the same-flow SMC lower bound. Per-chain adaptation
        confines the freeze to the chains that are actually stuck. The
        adapted vector warm-starts the next node (the interpolation
        schedule seeds the first node). Reported ``accept`` becomes
        post-warmup-only and ``step_size`` the per-node chain-mean.
      precondition: diagonal mass-matrix preconditioning — per-coordinate
        momentum scales from the chain-ensemble std at each node's start,
        frozen within the node (a fixed valid kernel; the same
        ``_ensemble_mass`` smc/ais use per temperature). Necessary for
        stiff anisotropic flow densities: the N=32 fluid drift flow
        rejects ~100% of unit-mass proposals at ANY workable step size,
        which collapses the adaptation and freezes the bridge.
      chunk_steps: split each node's sweeps into bounded per-program
        segments of at most this many sweeps, state carried on-device
        between dispatches — BITWISE identical to the monolithic node
        (the same fori_loop math, just dispatched in pieces). Required at
        LJ55-class cost: a node of 300 sweeps x 5 leapfrog flow
        value-and-grads is a 60-90 s single program, the regime that
        faults the axon tunnel RELIABLY (r4, and re-confirmed by this
        estimator's first LJ55 attempt: 3 consecutive UNAVAILABLEs
        through the retry hook). Keep per-program wall time modest.
      run_node: optional executor ``f(fn, *args) -> fn(*args)`` wrapping
        each dispatch (retry-on-UNAVAILABLE etc., same contract as
        ``smc_segments``'s ``run_segment``).

    Returns:
      :class:`TIResult`. ``se`` is the across-chain statistical error
      propagated through the trapezoid weights; it does not include
      cross-node correlation from warm starts (conservative users should
      compare independent replicates, as everywhere else). ``quad_err``
      re-evaluates the trapezoid on every other node — a direct estimate
      of the discretization error; enlarge ``n_nodes`` until it is small
      against ``se``.
    """
    if betas is None:
        betas = geometric_grid(n_nodes, beta_min)
    betas = np.asarray(betas, np.float64)
    if betas.ndim != 1 or betas.shape[0] < 3:
        raise ValueError(f"betas must be [K>=3]; got shape {betas.shape}")
    if betas[0] != 0.0 or betas[-1] != 1.0 or np.any(np.diff(betas) <= 0):
        raise ValueError("betas must increase from 0 to 1")
    if n_steps <= n_warmup:
        raise ValueError(f"n_steps={n_steps} must exceed n_warmup={n_warmup}")
    eps_final = step_size / 3.0 if step_size_final is None else step_size_final

    # same convention as smc._init_component_caches: batched densities get
    # the ones-cotangent VJP; per-particle ones get vmap(value_and_grad)
    if batched:
        vgq = batched_value_and_grad(log_q0)
        vgp = batched_value_and_grad(log_p)
    else:
        vgq = jax.vmap(jax.value_and_grad(log_q0))
        vgp = jax.vmap(jax.value_and_grad(log_p))

    @jit
    def init_caches(x):
        vq, gq = vgq(x)
        vp, gp = vgp(x)
        return (vq, vp), (gq, gp)

    @jit
    def node_stats(s_d, n_d, eps):
        # reduce on-device so the [C] chain axis never has to be
        # addressable on one host (multi-process chain-sharded runs:
        # the outputs are replicated scalars, safe to float())
        cm = s_d / n_d
        return (cm.mean(), jnp.std(cm, ddof=1) / jnp.sqrt(1.0 * cm.shape[0]),
                jnp.mean(eps))

    seg_fns = {}

    def make_seg(seg_len):
        # one compile per distinct segment length (at most two: the chunk
        # size and a final remainder); beta/eps/i0 are traced
        if seg_len in seg_fns:
            return seg_fns[seg_len]

        @jit
        def seg_fn(key, beta, i0, mass, x, vals, grads, eps, acc, s_d,
                   n_d):
            def sweep(j, st):
                x, vals, grads, eps, acc, s_d, n_d = st
                i = i0 + j                             # global sweep index
                kk = jax.random.fold_in(key, i)
                x, a, vals, grads = tempered_hmc_kernel_batched(
                    kk, x, vgq, vgp, beta, eps, n_leapfrog, vals, grads,
                    mass=mass)
                a_mean = a.mean()
                d = vals[1] - vals[0]                  # [C] log_p - log_q0
                keep = (i >= n_warmup).astype(d.dtype)
                if adapt_step:
                    # warmup-only PER-CHAIN log-space adaptation; frozen
                    # for kept sweeps (see Args: a global step collapses
                    # when a few chains are stuck)
                    upd = jnp.exp(0.15 * (a.astype(eps.dtype)
                                          - target_accept))
                    eps = jnp.where(i < n_warmup, eps * upd, eps)
                    acc = acc + keep * a_mean          # post-warmup only
                else:
                    acc = acc + a_mean
                return (x, vals, grads, eps, acc, s_d + keep * d,
                        n_d + keep)

            return jax.lax.fori_loop(
                0, seg_len, sweep, (x, vals, grads, eps, acc, s_d, n_d))

        seg_fns[seg_len] = seg_fn
        return seg_fn

    run = run_node or (lambda f, *a: f(*a))
    mass_fn = jit(_ensemble_mass)
    chunk = n_steps if chunk_steps is None else max(1, int(chunk_steps))
    C = jax.tree_util.tree_leaves(x0)[0].shape[0]
    x = x0
    means, ses, accs, epss = [], [], [], []
    eps_carry = None
    for i, b in enumerate(betas):
        sched = float(step_size * (1.0 - b) + eps_final * b)
        if adapt_step:
            eps = (eps_carry if eps_carry is not None
                   else jnp.full((C,), sched, jnp.float32))
        else:
            eps = jnp.asarray(sched, jnp.float32)
        key_i = jax.random.fold_in(key, i)
        beta_t = jnp.asarray(b, jnp.float32)
        vals, grads = run(init_caches, x)
        mass = run(mass_fn, x) if precondition else None
        zero = jnp.zeros_like(vals[0])
        st = (x, vals, grads, eps, jnp.zeros(()), zero, jnp.zeros(()))
        i0 = 0
        while i0 < n_steps:
            seg_len = min(chunk, n_steps - i0)
            st = run(make_seg(seg_len), key_i, beta_t,
                     jnp.asarray(i0, jnp.int32), mass, *st)
            i0 += seg_len
        x, vals, grads, eps_used, acc, s_d, n_d = st
        denom = (n_steps - n_warmup) if adapt_step else n_steps
        eps_carry = eps_used
        m, s, e_mean = run(node_stats, s_d, n_d, eps_used)
        means.append(float(m))
        ses.append(float(s))
        accs.append(float(acc) / denom)
        epss.append(float(e_mean))

    if accs[0] < 0.1:
        import warnings
        warnings.warn(
            "TI bridge mixing failure: the beta=0 node accepted "
            f"{accs[0]:.0%} of HMC proposals — the proposal-end chains are "
            "frozen and every node mean collapses to the initial mean "
            "log-weight, so the returned log_Z is NOT a valid estimate "
            "(see sample/ti.py 'Validity diagnostics'). The flow density "
            "is too stiff for the geometric bridge; report a flow-SMC/AIS "
            "lower bound instead.", stacklevel=2)
    means = jnp.asarray(np.asarray(means))
    ses = jnp.asarray(np.asarray(ses))
    bet = jnp.asarray(betas)
    w = _trapezoid_weights(bet)
    log_Z = (w * means).sum()
    se = jnp.sqrt(((w * ses) ** 2).sum())
    # grid-halving quadrature estimate: trapezoid on every other node
    # (always keeping the endpoints)
    idx = np.unique(np.r_[0 : len(betas) : 2, len(betas) - 1])
    w2 = _trapezoid_weights(bet[idx])
    quad_err = jnp.abs((w2 * means[idx]).sum() - log_Z)
    return TIResult(log_Z=log_Z, se=se, quad_err=quad_err, betas=bet,
                    node_mean=means, node_se=ses,
                    accept=jnp.asarray(np.asarray(accs)), x=x,
                    step_size=jnp.asarray(np.asarray(epss)))
