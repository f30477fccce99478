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


class TIResult(NamedTuple):
    log_Z: jax.Array       # trapezoid estimate of log(Z_p / Z_q0)
    se: jax.Array          # statistical SE (across-chain, trapezoid-weighted)
    quad_err: jax.Array    # |full-grid - half-grid| quadrature-error estimate
    betas: jax.Array       # [K] node grid
    node_mean: jax.Array   # [K] E_beta[log_p - log_q0] estimates
    node_se: jax.Array     # [K] across-chain SEs of the node means
    accept: jax.Array      # [K] mean HMC acceptance per node
    x: Any                 # final chains (at betas[-1] = 1: target draws)


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
        n_leapfrog: int = 5, batched: bool = False,
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
      run_node: optional executor ``f(fn, *args) -> fn(*args)`` wrapping
        each node dispatch (retry-on-UNAVAILABLE etc., same contract as
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
    def run_node_fn(key, x, beta, eps):
        vq, gq = vgq(x)
        vp, gp = vgp(x)
        vals, grads = (vq, vp), (gq, gp)

        def sweep(i, st):
            x, vals, grads, acc, s_d, n_d = st
            kk = jax.random.fold_in(key, i)
            x, a, vals, grads = tempered_hmc_kernel_batched(
                kk, x, vgq, vgp, beta, eps, n_leapfrog, vals, grads)
            d = vals[1] - vals[0]                      # [C] log_p - log_q0
            keep = (i >= n_warmup).astype(d.dtype)
            return (x, vals, grads, acc + a.mean(),
                    s_d + keep * d, n_d + keep)

        zero = jnp.zeros_like(vals[0])
        x, vals, grads, acc, s_d, n_d = jax.lax.fori_loop(
            0, n_steps, sweep, (x, vals, grads, 0.0, zero, 0.0))
        chain_means = s_d / n_d                        # [C]
        return x, acc / n_steps, chain_means

    run = run_node or (lambda f, *a: f(*a))
    C = jax.tree_util.tree_leaves(x0)[0].shape[0]
    x = x0
    means, ses, accs = [], [], []
    for i, b in enumerate(betas):
        eps = float(step_size * (1.0 - b) + eps_final * b)
        x, acc, chain_means = run(
            run_node_fn, jax.random.fold_in(key, i), x,
            jnp.asarray(b, jnp.float32), jnp.asarray(eps, jnp.float32))
        cm = np.asarray(chain_means, np.float64)
        means.append(cm.mean())
        ses.append(cm.std(ddof=1) / np.sqrt(C))
        accs.append(float(acc))

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
                    accept=jnp.asarray(np.asarray(accs)), x=x)
