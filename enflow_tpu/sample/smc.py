"""Sequential Monte Carlo and Annealed Importance Sampling with MCMC moves.

The north-star sampling layer (BASELINE.json): flow-proposal SMC over
tempered targets ``log pi_beta = (1-beta) log q0 + beta log p`` with
systematic resampling and HMC rejuvenation, fully jitted — particles are a
leading array axis, so sharding that axis over the ``data``/``chain`` mesh
axis scales the sampler across chips (resampling gathers become XLA
collectives under GSPMD).

AIS is SMC without resampling; both return an unbiased ``logZ`` estimate
(ratio of target to proposal normalizers) and effective sample sizes.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


def ess_from_log_weights(log_w):
    """Kish effective sample size of normalized importance weights."""
    log_w = log_w - jax.scipy.special.logsumexp(log_w)
    return jnp.exp(-jax.scipy.special.logsumexp(2.0 * log_w))


def systematic_resample(key, log_w, n: int | None = None):
    """Systematic (low-variance) resampling: returns ``[n]`` particle indices.

    Uses the inverse-CDF with a single uniform offset per comb tooth.
    """
    p = log_w.shape[0]
    n = n or p
    log_w = log_w - jax.scipy.special.logsumexp(log_w)
    w = jnp.exp(log_w)
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), log_w.dtype) / n
    u = u0 + jnp.arange(n, dtype=log_w.dtype) / n
    return jnp.searchsorted(cdf, u).astype(jnp.int32).clip(0, p - 1)


class SMCResult(NamedTuple):
    particles: object        # pytree [P, ...]
    log_weights: jax.Array   # [P] (normalized up to a constant)
    log_Z: jax.Array         # scalar log normalizer estimate
    ess_history: jax.Array   # [n_temps]
    accept_history: jax.Array  # [n_temps]
    beta_history: jax.Array = None  # [n_temps] (adaptive schedules)


def _adaptive_delta(log_w, d, beta_prev, target_ess, n_bisect: int = 26):
    """Largest temperature increment with incremental ESS >= target.

    ``d = log_p - log_q0`` per particle; the ESS of ``log_w + delta*d`` is
    monotone (decreasing) in ``delta``, so bisection on [0, 1-beta_prev]
    finds the increment where the tempered weights hit the target ESS —
    standard adaptive tempering (cf. ChEES-SMC), done entirely on cached
    per-particle values (no extra density evaluations).
    """
    hi0 = 1.0 - beta_prev

    def ess_at(delta):
        return ess_from_log_weights(log_w + delta * d)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        ok = ess_at(mid) >= target_ess
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, hi = jax.lax.fori_loop(0, n_bisect, body,
                               (jnp.zeros_like(hi0), hi0))
    # take the full remaining step when even it satisfies the target
    return jnp.where(ess_at(hi0) >= target_ess, hi0, lo)


def _tempered(log_q0, log_p, beta):
    return lambda x: (1.0 - beta) * log_q0(x) + beta * log_p(x)


def smc(key, x0, *, log_q0: Callable, log_p: Callable,
        n_temps: int = 10, betas=None, adaptive: bool = False,
        target_ess_frac: float = 0.6, mcmc_steps: int = 2,
        step_size=0.05, n_leapfrog: int = 5,
        resample_threshold: float = 0.5) -> SMCResult:
    """Tempered SMC from proposal samples to the target.

    Args:
      x0: particle pytree with leading axis ``[P, ...]`` drawn from the
        proposal (e.g. flow samples via ``flow.reverse_core``).
      log_q0 / log_p: per-particle proposal / target log-density callables
        (for flow proposals, ``log_q0`` runs the forward flow; see
        ``flow.reverse_core`` docstring).
      betas: optional ``[n_temps]`` schedule (default linear, ending at 1).
      adaptive: pick each temperature increment by bisection so the
        incremental ESS stays at ``target_ess_frac * P`` (``n_temps``
        becomes the maximum; once beta reaches 1, remaining steps are
        extra MCMC refinement sweeps).
      mcmc_steps: HMC rejuvenation sweeps per temperature.
      resample_threshold: resample when ESS < threshold * P.

    Returns ``SMCResult``; ``log_Z`` estimates ``log(Z_p / Z_q0)``.
    """
    from .mcmc import hmc_kernel

    P = jax.tree_util.tree_leaves(x0)[0].shape[0]
    if betas is None:
        betas = jnp.linspace(1.0 / n_temps, 1.0, n_temps)
    else:
        betas = jnp.asarray(betas)
        n_temps = betas.shape[0]
    betas_prev = jnp.concatenate([jnp.zeros((1,), betas.dtype), betas[:-1]])

    lq0 = jax.vmap(log_q0)
    lp = jax.vmap(log_p)

    def anneal_step(carry, inputs):
        x, log_w, log_z, beta_carry = carry
        beta_sched, beta_prev_sched, k = inputs
        k_res, k_mcmc = jax.random.split(k)

        # incremental weights: pi_beta / pi_beta_prev. log_w enters
        # normalized (logsumexp == 0), so the normalizer increment is
        # log sum_i w_i * exp(inc_i). The component evaluations are cached
        # and re-combined for the tempered target value the HMC kernel needs.
        lq0_x, lp_x = lq0(x), lp(x)
        d = lp_x - lq0_x
        if adaptive:
            beta_prev = beta_carry
            delta = _adaptive_delta(log_w, d, beta_prev,
                                    target_ess_frac * P)
            beta = beta_prev + delta
        else:
            beta, beta_prev = beta_sched, beta_prev_sched
            delta = beta - beta_prev
        log_w = log_w + delta * d
        lse = jax.scipy.special.logsumexp(log_w)
        log_z = log_z + lse
        log_w = log_w - lse
        ess = ess_from_log_weights(log_w)

        # adaptive systematic resampling (cached log-densities gathered too)
        def do_resample(args):
            x, log_w, lq0_x, lp_x = args
            idx = systematic_resample(k_res, log_w)
            x_r = jax.tree_util.tree_map(lambda a: a[idx], x)
            return (x_r, jnp.full_like(log_w, -jnp.log(P * 1.0)),
                    lq0_x[idx], lp_x[idx])

        # Adaptive tempering resamples every active step (the increment is
        # chosen to land exactly at the target ESS, so weights would stay
        # degenerate and stall the schedule otherwise).
        resample_now = ess < resample_threshold * P
        if adaptive:
            resample_now = resample_now | (beta < 1.0 - 1e-9)
        x, log_w, lq0_x, lp_x = jax.lax.cond(
            resample_now, do_resample, lambda a: a,
            (x, log_w, lq0_x, lp_x))

        # HMC rejuvenation targeting pi_beta
        target = _tempered(log_q0, log_p, beta)
        kernel = jax.vmap(
            lambda kk, xx, lpx: hmc_kernel(kk, xx, target, step_size,
                                           n_leapfrog, log_prob_x=lpx))

        def mcmc_sweep(i, xa):
            x, acc, lp_comb = xa
            keys = jax.vmap(jax.random.fold_in, (0, None))(
                jax.random.split(k_mcmc, P), i)
            x, accepted, lp_comb = kernel(keys, x, lp_comb)
            return x, acc + accepted.mean(), lp_comb

        lp_comb0 = (1.0 - beta) * lq0_x + beta * lp_x
        x, acc, _ = jax.lax.fori_loop(0, mcmc_steps, mcmc_sweep,
                                      (x, 0.0, lp_comb0))
        return ((x, log_w, log_z, beta),
                (ess, acc / jnp.maximum(mcmc_steps, 1), beta))

    init_w = jnp.full((P,), -jnp.log(P * 1.0), betas.dtype)
    keys = jax.random.split(key, n_temps)
    (x, log_w, log_z, _), (ess_hist, acc_hist, beta_hist) = jax.lax.scan(
        anneal_step,
        (x0, init_w, jnp.zeros((), betas.dtype),
         jnp.zeros((), betas.dtype)),
        (betas, betas_prev, keys))
    return SMCResult(particles=x, log_weights=log_w, log_Z=log_z,
                     ess_history=ess_hist, accept_history=acc_hist,
                     beta_history=beta_hist)


def ais(key, x0, *, log_q0: Callable, log_p: Callable,
        n_temps: int = 10, betas=None, mcmc_steps: int = 2, step_size=0.05,
        n_leapfrog: int = 5) -> SMCResult:
    """Annealed importance sampling: SMC machinery without resampling.

    Each particle carries its full annealed weight; ``log_Z`` is the AIS
    estimate ``logmeanexp(log_w)``.
    """
    from .mcmc import hmc_kernel

    P = jax.tree_util.tree_leaves(x0)[0].shape[0]
    if betas is None:
        betas = jnp.linspace(1.0 / n_temps, 1.0, n_temps)
    else:
        betas = jnp.asarray(betas)
        n_temps = betas.shape[0]
    betas_prev = jnp.concatenate([jnp.zeros((1,), betas.dtype), betas[:-1]])

    lq0 = jax.vmap(log_q0)
    lp = jax.vmap(log_p)

    def anneal_step(carry, inputs):
        x, log_w = carry
        beta, beta_prev, k = inputs
        delta = beta - beta_prev
        lq0_x, lp_x = lq0(x), lp(x)
        log_w = log_w + delta * (lp_x - lq0_x)

        target = _tempered(log_q0, log_p, beta)
        kernel = jax.vmap(
            lambda kk, xx, lpx: hmc_kernel(kk, xx, target, step_size,
                                           n_leapfrog, log_prob_x=lpx))

        def mcmc_sweep(i, xa):
            x, acc, lp_comb = xa
            keys = jax.vmap(jax.random.fold_in, (0, None))(
                jax.random.split(k, P), i)
            x, accepted, lp_comb = kernel(keys, x, lp_comb)
            return x, acc + accepted.mean(), lp_comb

        lp_comb0 = (1.0 - beta) * lq0_x + beta * lp_x
        x, acc, _ = jax.lax.fori_loop(0, mcmc_steps, mcmc_sweep,
                                      (x, 0.0, lp_comb0))
        ess = ess_from_log_weights(log_w)
        return (x, log_w), (ess, acc / jnp.maximum(mcmc_steps, 1))

    keys = jax.random.split(key, n_temps)
    (x, log_w), (ess_hist, acc_hist) = jax.lax.scan(
        anneal_step, (x0, jnp.zeros((P,), betas.dtype)),
        (betas, betas_prev, keys))
    log_z = (jax.scipy.special.logsumexp(log_w)
             - jnp.log(jnp.asarray(P, log_w.dtype)))
    return SMCResult(particles=x, log_weights=log_w, log_Z=log_z,
                     ess_history=ess_hist, accept_history=acc_hist)
