"""Replica-exchange Monte Carlo (parallel tempering), TPU-native.

No reference equivalent (the reference has no samplers at all) — this extends
the north-star sampling family (SMC/AIS/HMC/NUTS) with the classic
multi-modal workhorse: K temperature slots x M chains run tempered-HMC
sweeps in parallel, then adjacent slots propose configuration swaps in the
deterministic even-odd (DEO) pattern. Everything is one jitted program:
replicas live on a ``[K, M, ...]`` leading axis (vmap x vmap over the HMC
kernel), swaps are a per-chain ``take_along_axis`` permutation — no
host-side control flow, static shapes throughout, and the whole ladder
batches onto the MXU at once.

The tempered family matches SMC's bridge: ``pi_beta = (1-beta) log_q0 +
beta log_p`` (``log_q0`` omitted => plain temperature ladder ``beta *
log_p``). The per-replica component caches (values and gradients of both
densities) thread through sweeps AND swaps — a swap permutes cached values
with the configurations, so exchanges cost zero density evaluations, and
each round costs exactly ``mcmc_steps * n_leapfrog`` evaluations per
replica (the same accounting as sample/smc.py rejuvenation).

Swap acceptance for adjacent slots (k, k+1):
  log a = (beta_{k+1} - beta_k) * (e_k - e_{k+1}),   e = log_p - log_q0,
the standard parallel-tempering ratio, exact for the bridged family.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from .mcmc import (batched_value_and_grad, tempered_hmc_kernel,
                   tempered_hmc_kernel_batched)


class REMCResult(NamedTuple):
    samples: Any          # [n_rounds, M, ...] draws from the beta=1 slot
    x_final: Any          # [K, M, ...] final replica states
    swap_accept: Any      # [K-1] mean swap acceptance per adjacent pair
    accept: Any           # [K] mean HMC acceptance per temperature slot
    betas: Any            # [K] the ladder, as used
    # [n_rounds] per-round values of the caller's ``stage_fn`` (None when
    # no stage_fn was given) — e.g. the driver's neighbor-overflow counter
    # over all replica slots (VERDICT r4 item 7)
    round_metric_history: Any = None


def tile_replicas(x, K: int):
    """Broadcast an ``[M, ...]`` chain pytree to ``[K, M, ...]`` replicas."""
    return jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (K,) + a.shape), x)


def _zero_log_q0(x):
    leaves = jax.tree_util.tree_leaves(x)
    return jnp.zeros((), leaves[0].dtype)


def remc(key, x0, *, log_p: Callable, log_q0: Callable | None = None,
         betas, n_rounds: int, mcmc_steps: int = 1, step_size=0.05,
         n_leapfrog: int = 5, batched: bool = False,
         stage_fn=None) -> REMCResult:
    """Parallel tempering from ``betas[0]`` (hottest) to ``betas[-1] == 1``.

    Args:
      x0: ``[K, M, ...]`` pytree of initial replica states. Prefer
        INDEPENDENT draws per slot over :func:`tile_replicas`: swaps only
        exchange configurations within a chain column, so tiling one draw
        across the ladder puts any pathological initial configuration
        (e.g. a flow sample with near-coincident atoms) in EVERY slot of
        its column — no swap can then rescue the column and its beta=1
        slot stays stuck for the whole run. With independent draws a bad
        config occupies one slot and migrates hotward within a few rounds.
        Relatedly, a flow-bridged ladder should start at ``betas[0] == 0``
        (the pure flow pushforward): a beta=0 slot mixes freely under any
        configuration, so migrated pathologies actually relax instead of
        parking in a still-tempered hottest slot.
      log_p: target log density of ONE configuration (vmapped internally).
      log_q0: optional bridge density (as in :func:`..sample.smc.smc`);
        ``None`` gives the plain tempered target ``beta * log_p``.
      betas: ``[K]`` ascending inverse-temperature ladder; ``betas[-1]``
        should be 1 (the target slot whose draws are returned).
      n_rounds: swap rounds; each round = ``mcmc_steps`` tempered-HMC
        sweeps per replica + one even/odd swap phase.
      step_size: scalar or ``[K]`` per-slot leapfrog step (hot slots can
        take larger steps).

    Returns :class:`REMCResult`; ``samples`` stacks the ``beta=1`` slot
    after every round (``[n_rounds, M, ...]``).
    """
    if log_q0 is None:
        log_q0 = _zero_log_q0
    betas = jnp.asarray(betas)

    one_round = _make_one_round(key, log_q0, log_p, betas, step_size,
                                mcmc_steps, n_leapfrog, batched=batched,
                                stage_fn=stage_fn)
    lq0, lp, glq0, glp = _init_remc_caches(log_q0, log_p, x0,
                                           batched=batched)

    (x, lq0, lp, glq0, glp), outs = jax.lax.scan(
        one_round, (x0, lq0, lp, glq0, glp), jnp.arange(n_rounds))
    return _aggregate_remc(x, outs, betas)


def _flatten_km(t, K, M):
    return jax.tree_util.tree_map(
        lambda a: a.reshape((K * M,) + a.shape[2:]), t)


def _unflatten_km(t, K, M):
    return jax.tree_util.tree_map(
        lambda a: a.reshape((K, M) + a.shape[1:]), t)


def _init_remc_caches(log_q0, log_p, x0, batched: bool = False):
    """Per-replica component value/gradient caches at the initial states.

    ``batched``: the densities map ``[n, ...]`` pytrees to ``[n]`` values
    directly (atom-sharded shard_map bodies, fused-kernel flows) — replicas
    are flattened ``[K*M]`` through them and reshaped back."""
    if batched:
        K, M = jax.tree_util.tree_leaves(x0)[0].shape[:2]
        flat = _flatten_km(x0, K, M)
        lq0, glq0 = batched_value_and_grad(log_q0)(flat)
        lp, glp = batched_value_and_grad(log_p)(flat)
        return (lq0.reshape(K, M), lp.reshape(K, M),
                _unflatten_km(glq0, K, M), _unflatten_km(glp, K, M))
    vg_q = jax.vmap(jax.vmap(jax.value_and_grad(log_q0)))
    vg_p = jax.vmap(jax.vmap(jax.value_and_grad(log_p)))
    lq0, glq0 = vg_q(x0)                                    # [K, M], [K, M, ...]
    lp, glp = vg_p(x0)
    return lq0, lp, glq0, glp


def _aggregate_remc(x, outs, betas) -> REMCResult:
    samples, accs, rates, pair_ons, *metrics = outs
    n_on = jnp.maximum(pair_ons.sum(axis=0), 1)             # rounds pair was on
    return REMCResult(
        samples=samples,
        x_final=x,
        swap_accept=rates.sum(axis=0) / n_on,
        accept=accs.mean(axis=0),
        betas=betas,
        round_metric_history=metrics[0] if metrics else None,
    )


def _make_one_round(key, log_q0, log_p, betas, step_size, mcmc_steps,
                    n_leapfrog, batched: bool = False, stage_fn=None):
    """One REMC round ``(carry, r) -> (carry, (target_slot, acc, rate,
    pair_on, metric))``, keyed by the ABSOLUTE round index ``r`` (fold_in)
    — so a chunked scan over ``arange(r0, r1)`` continues the monolithic
    RNG stream bitwise (:func:`remc_segments`).

    ``stage_fn`` (optional): ``flattened [K*M, ...] replicas -> scalar``
    evaluated after every round's swap phase (a zero placeholder rides the
    scan otherwise) — the per-round diagnostics hook (e.g. the driver's
    neighbor-overflow counter, VERDICT r4 item 7).

    ``batched``: run every slot's chains through ONE flattened ``[K*M]``
    batched-density kernel call with per-replica beta/step-size vectors
    (``mcmc._tempered_hmc`` broadcast support) instead of vmap-of-vmap over
    per-replica callables — required for densities whose internals need the
    whole batch (atom-sharded shard_map bodies, fused Pallas flows)."""
    K = betas.shape[0]
    step_size = jnp.broadcast_to(jnp.asarray(step_size, betas.dtype), (K,))

    if batched:
        vgq = batched_value_and_grad(log_q0)
        vgp = batched_value_and_grad(log_p)

        def kernel(kk, x, betas_k, ss_k, vals, grads):
            M = jax.tree_util.tree_leaves(x)[0].shape[1]
            beta_v = jnp.repeat(betas_k, M)
            ss_v = jnp.repeat(ss_k, M)
            fl = lambda t: _flatten_km(t, K, M)
            x2, acc, vals2, grads2 = tempered_hmc_kernel_batched(
                kk, fl(x), vgq, vgp, beta_v, ss_v, n_leapfrog,
                (vals[0].reshape(K * M), vals[1].reshape(K * M)),
                (fl(grads[0]), fl(grads[1])))
            un = lambda t: _unflatten_km(t, K, M)
            return (un(x2), acc.reshape(K, M),
                    (vals2[0].reshape(K, M), vals2[1].reshape(K, M)),
                    (un(grads2[0]), un(grads2[1])))
    else:
        # kernel over [K, M]: inner vmap = chains, outer vmap = temperature
        # slots (beta and step size vary along K)
        kernel = jax.vmap(
            jax.vmap(
                lambda kk, xx, beta, ss, vals, grads: tempered_hmc_kernel(
                    kk, xx, log_q0, log_p, beta, ss, n_leapfrog, vals,
                    grads),
                in_axes=(0, 0, None, None, 0, 0)),
            in_axes=(0, 0, 0, 0, 0, 0))

    ks = jnp.arange(K)

    def swap_phase(parity, k_swap, x, lq0, lp, glq0, glp):
        """Even/odd deterministic pairing: slot k proposes a swap with k+1
        for k = parity, parity+2, ... Swaps permute states AND caches."""
        M = lq0.shape[1]
        e = lp - lq0                                        # [K, M]
        d_beta = betas[1:] - betas[:-1]                     # [K-1]
        log_a = d_beta[:, None] * (e[:-1] - e[1:])          # [K-1, M]
        u = jax.random.uniform(k_swap, log_a.shape, log_a.dtype)
        pair_on = (ks[:-1] % 2) == parity                   # [K-1]
        acc = (jnp.log(u) < log_a) & pair_on[:, None]       # [K-1, M]

        up = jnp.concatenate([acc, jnp.zeros((1, M), bool)])      # [K, M]
        down = jnp.concatenate([jnp.zeros((1, M), bool), acc])
        idx = ks[:, None] + up.astype(jnp.int32) - down.astype(jnp.int32)

        def perm(a):
            ix = idx.reshape(idx.shape + (1,) * (a.ndim - 2))
            return jnp.take_along_axis(a, jnp.broadcast_to(
                ix, idx.shape + a.shape[2:]), axis=0)

        tperm = lambda t: jax.tree_util.tree_map(perm, t)
        x, glq0, glp = tperm(x), tperm(glq0), tperm(glp)
        lq0, lp = perm(lq0), perm(lp)
        # pair acceptance rate, counting only rounds where the pair was on
        rate = jnp.where(pair_on[:, None], acc, 0.0).mean(axis=1)
        return x, lq0, lp, glq0, glp, rate, pair_on

    def one_round(carry, r):
        x, lq0, lp, glq0, glp = carry
        k_round = jax.random.fold_in(key, r)

        M = jax.tree_util.tree_leaves(carry[0])[0].shape[1]

        def sweep(i, state):
            x, acc, lq0, lp, glq0, glp = state
            kk = jax.random.fold_in(k_round, i)
            keys = (kk if batched
                    else jax.random.split(kk, K * M).reshape(K, M, 2))
            x, a, (lq0, lp), (glq0, glp) = kernel(
                keys, x, betas, step_size, (lq0, lp), (glq0, glp))
            return x, acc + a.mean(axis=1), lq0, lp, glq0, glp

        x, acc, lq0, lp, glq0, glp = jax.lax.fori_loop(
            0, mcmc_steps, sweep,
            (x, jnp.zeros((K,), lq0.dtype), lq0, lp, glq0, glp))

        k_swap = jax.random.fold_in(k_round, 7919)
        x, lq0, lp, glq0, glp, rate, pair_on = swap_phase(
            r % 2, k_swap, x, lq0, lp, glq0, glp)

        target_slot = jax.tree_util.tree_map(lambda a: a[-1], x)
        out = (target_slot, acc / mcmc_steps, rate, pair_on)
        if stage_fn is not None:        # metric output only when requested:
            # the default path keeps the exact pre-r5 program
            out = out + (stage_fn(_flatten_km(x, K, M)),)
        return (x, lq0, lp, glq0, glp), out

    return one_round


def remc_segments(key, x0, *, log_p: Callable, log_q0: Callable | None = None,
                  betas, n_rounds: int, mcmc_steps: int = 1, step_size=0.05,
                  n_leapfrog: int = 5, batched: bool = False,
                  stage_fn=None, chunk_rounds: int = 8,
                  run_segment=None, on_segment=None, start_round: int = 0,
                  init_state=None, init_outs=None,
                  compiler_options=None) -> REMCResult:
    """:func:`remc` executed as bounded per-program segments (the REMC half
    of VERDICT r3 item 4 — same contract as ``smc.smc_segments``).

    At most ``chunk_rounds`` swap rounds run per jitted program; between
    segments the host holds the replica carry ``(x, lq0, lp, glq0, glp)``
    and accumulated per-round outputs. Each round is keyed by its ABSOLUTE
    index (``fold_in(key, r)``), so the chunked run is bitwise-identical to
    the monolithic scan for the same key (pinned by tests/test_remc.py).

    ``run_segment(fn, *args)`` wraps every device dispatch (retry hook);
    ``on_segment(next_round, state, outs)`` fires after each completed
    segment (checkpoint hook); ``start_round``/``init_state``/``init_outs``
    resume a killed run from the captured state.
    """
    if log_q0 is None:
        log_q0 = _zero_log_q0
    betas = jnp.asarray(betas)
    if chunk_rounds <= 0:
        chunk_rounds = n_rounds
    run = run_segment or (lambda f, *a: f(*a))

    one_round = _make_one_round(key, log_q0, log_p, betas, step_size,
                                mcmc_steps, n_leapfrog, batched=batched,
                                stage_fn=stage_fn)

    jj = (lambda g: jax.jit(g, compiler_options=compiler_options)) \
        if compiler_options else jax.jit

    @jj
    def init_fn(x0):
        return (x0,) + _init_remc_caches(log_q0, log_p, x0, batched=batched)

    @jj
    def seg_fn(carry, rounds):
        return jax.lax.scan(one_round, carry, rounds)

    state = run(init_fn, x0) if init_state is None else init_state
    outs = list(init_outs) if init_outs else []
    r = int(start_round)
    while r < n_rounds:
        r2 = min(r + chunk_rounds, n_rounds)
        state, out = run(seg_fn, state, jnp.arange(r, r2))
        jax.block_until_ready(state[1])
        outs.append(out)
        if on_segment is not None:
            on_segment(r2, state, outs)
        r = r2

    cat = lambda k: jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs), *[o[k] for o in outs])
    all_outs = tuple(cat(k)
                     for k in range(5 if stage_fn is not None else 4))
    return _aggregate_remc(state[0], all_outs, betas)
