"""MBAR: multistate Bennett acceptance ratio free-energy estimation (JAX).

No reference equivalent — analysis-side extension of the sampling family:
pools configurations drawn from K thermodynamic states (replica-exchange
slots, SMC temperature stages, independent MD runs) into statistically
optimal estimates of the relative free energies ``f_k = -log Z_k`` and
importance weights for computing expectations under ANY of the states
(Shirts & Chodera 2008). The self-consistent iteration is a fixed-count
``lax.scan`` of logsumexp recurrences — one jitted program, no host loop.

Inputs use reduced potentials: ``u_kn[k, n] = -log q_k(x_n)`` (the negative
unnormalized log density of pooled sample ``n`` evaluated under state
``k``). With samples from :func:`..sample.remc.remc`, each temperature
slot contributes its chains and ``u_kn`` comes from evaluating the tempered
family at every beta.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp


class MBARResult(NamedTuple):
    f: jax.Array            # [K] relative free energies, f[0] = 0
    log_w: jax.Array        # [K, N] normalized log weights per target state
    converged: jax.Array    # max |f change| on the last iteration


def mbar(u_kn, counts, n_iter: int = 200) -> MBARResult:
    """Solve the MBAR equations by self-consistent iteration.

    Args:
      u_kn: ``[K, N]`` reduced potentials: sample ``n`` (pooled across all
        states) evaluated under state ``k``.
      counts: ``[K]`` number of pooled samples drawn from each state
        (``counts.sum() == N``).
      n_iter: fixed self-consistent iterations (static under jit).

    Returns:
      :class:`MBARResult` with ``f[k] - f[0] = -log(Z_k / Z_0)`` and
      per-state normalized log weights ``log_w[k]`` such that
      ``E_k[A] = sum_n exp(log_w[k, n]) A(x_n)``.
    """
    u_kn = jnp.asarray(u_kn)
    counts = jnp.asarray(counts, u_kn.dtype)
    log_c = jnp.log(counts)

    def step(f, _):
        # log denominator per sample: logsumexp_j [log N_j + f_j - u_jn]
        log_d = logsumexp(log_c[:, None] + f[:, None] - u_kn, axis=0)  # [N]
        f_new = -logsumexp(-u_kn - log_d[None, :], axis=1)             # [K]
        f_new = f_new - f_new[0]
        return f_new, jnp.max(jnp.abs(f_new - f))

    f0 = jnp.zeros(u_kn.shape[0], u_kn.dtype)
    f, deltas = jax.lax.scan(step, f0, None, length=n_iter)

    log_d = logsumexp(log_c[:, None] + f[:, None] - u_kn, axis=0)
    log_w = -u_kn - log_d[None, :]
    log_w = log_w - logsumexp(log_w, axis=1, keepdims=True)
    return MBARResult(f=f, log_w=log_w, converged=deltas[-1])


def mbar_from_remc(res, log_p, log_q0=None, batched=False):
    """Build MBAR inputs from a :class:`..sample.remc.REMCResult`.

    Pools every slot's post-scan chains (``res.x_final``) and evaluates the
    bridged family ``u_k = -[(1-beta_k) log_q0 + beta_k log_p]`` at all K
    betas. Returns ``(u_kn [K, K*M], counts [K])``.

    ``batched``: the densities map ``[n, ...]`` pytrees to ``[n]`` values
    directly (atom-sharded shard_map bodies) — applied as-is, not vmapped.
    """
    betas = res.betas
    K = betas.shape[0]
    pooled = jax.tree_util.tree_map(
        lambda a: a.reshape((-1,) + a.shape[2:]), res.x_final)   # [K*M, ...]
    apply_d = (lambda f: f) if batched else (lambda f: jax.vmap(f))
    lp = apply_d(log_p)(pooled)                                  # [K*M]
    if log_q0 is None:
        lq0 = jnp.zeros_like(lp)
    else:
        lq0 = apply_d(log_q0)(pooled)
    u_kn = -((1.0 - betas)[:, None] * lq0[None, :]
             + betas[:, None] * lp[None, :])
    M = lp.shape[0] // K
    return u_kn, jnp.full((K,), M, u_kn.dtype)


def mbar_block_log_z(u_kn, states, columns, K: int, n_blocks: int = 4,
                     n_iter: int = 200):
    """Block-replicate MBAR ``log_Z`` estimates over independent chain
    columns.

    The honest error bar for an REMC+MBAR free energy: replica-exchange
    swaps act *within* a chain column and the initial draws are independent
    per slot, so distinct columns are statistically independent replicates
    while per-sample (ESS-style) errors understate (round-to-round and
    swap-induced correlation; same lesson as the SMC replicate-scatter
    finding in scripts/quality_lj13.py). Splits the ``M`` columns into
    ``n_blocks`` equal contiguous blocks, solves MBAR on each block alone,
    and returns the per-block ``-(f[-1] - f[0])`` estimates; report
    ``mean +- std/sqrt(n_blocks)``.

    Args:
      u_kn:    ``[K, N]`` reduced potentials of the pooled samples.
      states:  ``[N]`` int state index each pooled sample was drawn from.
      columns: ``[N]`` int chain-column index (0..M-1) of each sample.
      K:       number of states.
      n_blocks: replicate blocks (columns beyond ``M - M % n_blocks``
        are dropped so every block has identical composition — one jitted
        MBAR shape).
    """
    import numpy as np

    states = np.asarray(states)
    columns = np.asarray(columns)
    M = int(columns.max()) + 1
    n_blocks = max(1, min(int(n_blocks), M))
    width = M // n_blocks
    vals = []
    solve = jax.jit(mbar, static_argnames=("n_iter",))
    for b in range(n_blocks):
        sel = np.nonzero((columns >= b * width)
                         & (columns < (b + 1) * width))[0]
        counts_b = np.bincount(states[sel], minlength=K)
        r = solve(jnp.asarray(np.asarray(u_kn)[:, sel]),
                  jnp.asarray(counts_b, jnp.asarray(u_kn).dtype),
                  n_iter=n_iter)
        vals.append(-float(r.f[-1] - r.f[0]))
    return np.asarray(vals)
