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
    step_history: jax.Array = None  # [n_temps] (adapt_step=True)
    # [n_temps] per-stage values of the caller's ``stage_fn`` (None when no
    # stage_fn was given) — e.g. the driver's mid-anneal neighbor-overflow
    # counter (VERDICT r4 item 7)
    stage_metric_history: jax.Array = None


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


def _init_component_caches(log_q0, log_p, x0, mcmc_steps,
                           batched: bool = False):
    """Per-particle caches of the two density *components* (and, when HMC
    rejuvenation will run, their gradients). Tempered values/gradients at any
    beta are linear recombinations, so across the whole anneal the only
    density work is the leapfrog value-and-grads inside the HMC kernel (for
    flow proposals, each log_q0 call is a full flow fwd/bwd — the hot path).
    With mcmc_steps == 0 no kernel ever runs: values only (None gradient
    leaves vanish from the pytrees).

    ``batched``: the densities map ``[P, ...]`` pytrees to ``[P]`` values
    directly (see :func:`..sample.mcmc.batched_value_and_grad`) — one fused
    program over the particle axis instead of ``vmap`` over per-particle
    callables."""
    from .mcmc import batched_value_and_grad

    if mcmc_steps > 0:
        if batched:
            lq0_0, glq0_0 = batched_value_and_grad(log_q0)(x0)
            lp_0, glp_0 = batched_value_and_grad(log_p)(x0)
        else:
            lq0_0, glq0_0 = jax.vmap(jax.value_and_grad(log_q0))(x0)
            lp_0, glp_0 = jax.vmap(jax.value_and_grad(log_p))(x0)
        return lq0_0, lp_0, glq0_0, glp_0
    if batched:
        return log_q0(x0), log_p(x0), None, None
    return jax.vmap(log_q0)(x0), jax.vmap(log_p)(x0), None, None


def _ensemble_mass(x):
    """Per-coordinate momentum scales from the particle ensemble: the std
    across particles, floored at 5% of the leaf RMS so a degenerate
    coordinate (e.g. post-resampling collapse) cannot blow up the
    preconditioned drift ``p / s^2``."""
    def leaf_mass(a):
        s = a.std(axis=0)
        rms = jnp.sqrt((a * a).mean())
        return jnp.maximum(s, 0.05 * rms + 1e-6)
    return jax.tree_util.tree_map(leaf_mass, x)


def _rejuvenate(k, x, beta, vals, grads, *, log_q0, log_p, mcmc_steps,
                step_size, n_leapfrog, P, batched: bool = False,
                mass=None):
    """``mcmc_steps`` tempered-HMC sweeps over all particles, threading the
    component caches. Returns ``(x, mean_accept, vals, grads)``."""
    from .mcmc import (batched_value_and_grad, tempered_hmc_kernel,
                       tempered_hmc_kernel_batched)

    if mcmc_steps <= 0:
        return x, 0.0, vals, grads

    if batched:
        vgq = batched_value_and_grad(log_q0)
        vgp = batched_value_and_grad(log_p)
        kernel = lambda kk, xx, vals, grads: tempered_hmc_kernel_batched(
            kk, xx, vgq, vgp, beta, step_size, n_leapfrog, vals, grads,
            mass=mass)
    else:
        kernel = jax.vmap(
            lambda kk, xx, vals, grads: tempered_hmc_kernel(
                kk, xx, log_q0, log_p, beta, step_size, n_leapfrog,
                vals, grads, mass=mass),
            in_axes=(0, 0, 0, 0))

    def mcmc_sweep(i, xa):
        x, acc, vals, grads = xa
        if batched:
            keys = jax.random.fold_in(k, i)
        else:
            keys = jax.vmap(jax.random.fold_in, (0, None))(
                jax.random.split(k, P), i)
        x, accepted, vals, grads = kernel(keys, x, vals, grads)
        return x, acc + accepted.mean(), vals, grads

    x, acc, vals, grads = jax.lax.fori_loop(
        0, mcmc_steps, mcmc_sweep, (x, 0.0, vals, grads))
    return x, acc / mcmc_steps, vals, grads


def _adapted_step(step_size, accept, target_accept, gain: float = 1.0):
    """Multiplicative step-size update from the measured mean acceptance
    (log-space, fixed gain — the anneal is short, a decaying schedule would
    barely move). Applied between temperatures, so MH correctness within
    each temperature is untouched."""
    return step_size * jnp.exp(gain * (accept - target_accept))


def _schedule(n_temps, betas):
    """(betas, betas_prev) for the anneal scan (default linear to 1)."""
    if betas is None:
        betas = jnp.linspace(1.0 / n_temps, 1.0, n_temps)
    else:
        betas = jnp.asarray(betas)
    betas_prev = jnp.concatenate([jnp.zeros((1,), betas.dtype), betas[:-1]])
    return betas, betas_prev


def _make_anneal_step(log_q0, log_p, *, P, adaptive, target_ess_frac,
                      mcmc_steps, n_leapfrog, resample_threshold, adapt_step,
                      target_accept, precondition, batched, stage_fn=None):
    """The per-temperature SMC transition ``(carry, (beta, beta_prev, key))
    -> (carry, (ess, accept, beta, eps, metric))`` — one function shared by
    the monolithic scan (:func:`smc`) and the chunked segment runner
    (:func:`smc_segments`), so chunked == monolithic bitwise.

    ``stage_fn`` (optional): ``particles -> scalar`` evaluated on the
    post-rejuvenation particles of every stage (a zero placeholder rides
    the scan otherwise). This is how truncation-class diagnostics see the
    MID-ANNEAL configurations — positions pass through their most
    distorted geometries between the proposal and the target, exactly
    where a final-particles-only probe is blind (VERDICT r4 item 7)."""

    def anneal_step(carry, inputs):
        (x, log_w, log_z, beta_carry, eps,
         lq0_x, lp_x, glq0_x, glp_x) = carry
        beta_sched, beta_prev_sched, k = inputs
        k_res, k_mcmc = jax.random.split(k)

        # incremental weights: pi_beta / pi_beta_prev. log_w enters
        # normalized (logsumexp == 0), so the normalizer increment is
        # log sum_i w_i * exp(inc_i). The component evaluations come from
        # the carried caches (no recomputation).
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

        # adaptive systematic resampling (caches gathered alongside)
        def do_resample(args):
            x, log_w, lq0_x, lp_x, glq0_x, glp_x = args
            idx = systematic_resample(k_res, log_w)
            take = lambda t: jax.tree_util.tree_map(lambda a: a[idx], t)
            return (take(x), jnp.full_like(log_w, -jnp.log(P * 1.0)),
                    lq0_x[idx], lp_x[idx], take(glq0_x), take(glp_x))

        # Adaptive tempering resamples every active step (the increment is
        # chosen to land exactly at the target ESS, so weights would stay
        # degenerate and stall the schedule otherwise).
        resample_now = ess < resample_threshold * P
        if adaptive:
            resample_now = resample_now | (beta < 1.0 - 1e-9)
        x, log_w, lq0_x, lp_x, glq0_x, glp_x = jax.lax.cond(
            resample_now, do_resample, lambda a: a,
            (x, log_w, lq0_x, lp_x, glq0_x, glp_x))

        # HMC rejuvenation targeting pi_beta, reusing the component caches
        x, acc, (lq0_x, lp_x), (glq0_x, glp_x) = _rejuvenate(
            k_mcmc, x, beta, (lq0_x, lp_x), (glq0_x, glp_x),
            log_q0=log_q0, log_p=log_p, mcmc_steps=mcmc_steps,
            step_size=eps, n_leapfrog=n_leapfrog, P=P,
            batched=batched,
            mass=_ensemble_mass(x) if precondition else None)
        eps_next = (_adapted_step(eps, acc, target_accept)
                    if (adapt_step and mcmc_steps > 0) else eps)
        # the metric output exists ONLY when a stage_fn was given: the
        # default path keeps the exact pre-r5 program (an always-present
        # placeholder measured ~1% off the frozen LJ13 bench line)
        hist = (ess, acc, beta, eps)
        if stage_fn is not None:
            hist = hist + (stage_fn(x),)
        return ((x, log_w, log_z, beta, eps_next,
                 lq0_x, lp_x, glq0_x, glp_x), hist)

    return anneal_step


def smc(key, x0, *, log_q0: Callable, log_p: Callable,
        n_temps: int = 10, betas=None, adaptive: bool = False,
        target_ess_frac: float = 0.6, mcmc_steps: int = 2,
        step_size=0.05, n_leapfrog: int = 5,
        resample_threshold: float = 0.5,
        adapt_step: bool = False, target_accept: float = 0.65,
        precondition: bool = False,
        batched: bool = False, stage_fn=None) -> SMCResult:
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
      adapt_step: adapt the HMC step size between temperatures from the
        measured mean acceptance (multiplicative log-space update toward
        ``target_accept``); ``step_size`` becomes the initial value. The
        update happens outside the MH kernels, so per-temperature
        correctness is unaffected.
      precondition: diagonal mass-matrix preconditioning — per-coordinate
        momentum scales set to the particle-ensemble std at each
        temperature (standard adaptive-SMC practice; fixed within a
        temperature's MH sweeps). Helps anisotropic targets where one
        global step size either stalls the wide directions or rejects on
        the narrow ones.
      batched: ``log_q0``/``log_p`` are *batched* — they map the full
        ``[P, ...]`` particle pytree to ``[P]`` log-densities in one program
        (gradients via one ones-cotangent VJP). Use for densities whose
        internals *require* the whole particle batch at once, e.g. flows
        running the fused Pallas EGCL kernel (a vmapped B=1 ``pallas_call``
        would see degenerate tiles). For pure-XLA densities prefer the
        default vmapped path: A/B on v5e at the LJ13 bench workload measured
        vmapped SMC ~8% faster end-to-end (6081 vs 5640 samples/s), even
        though the isolated batched flow forward is faster — XLA compiles
        the vmapped anneal better.

    Returns ``SMCResult``; ``log_Z`` estimates ``log(Z_p / Z_q0)``.
    ``exp(log_Z)`` is unbiased for the ratio, so by Jensen ``log_Z`` itself
    is biased LOW, increasingly so for poorly-mixed anneals — measured on
    LJ13: 9.6 (untrained flow, 8 temps) -> 12.6 (weak flow, adaptive) ->
    16.3 (trained flow, 40 temps x 6 sweeps) -> 21.7 (coupled flow, fixed
    48-temp ladder). The r5 estimator arbitration (RESULTS.md) showed this
    lower bound is usually the most TRUSTWORTHY number the framework
    produces: converged MBAR-over-REMC sat 1-1.7 nats BELOW same-flow SMC
    bounds at LJ13 (ladder-mixing bias invisible to its block SEs), with
    thermodynamic integration (``sample/ti.py``, no logsumexp/reweighting/
    resampling) refereeing in SMC's favor. Report the SMC/AIS bound with a
    strong flow as the primary log_Z evidence; use ``sampling.mbar`` as a
    cross-check only when cold-end swap acceptance is demonstrably healthy,
    and ``sampling.algo: ti`` to certify a bound.
    """
    P = jax.tree_util.tree_leaves(x0)[0].shape[0]
    if betas is not None:
        n_temps = jnp.asarray(betas).shape[0]
    betas, betas_prev = _schedule(n_temps, betas)

    lq0_0, lp_0, glq0_0, glp_0 = _init_component_caches(
        log_q0, log_p, x0, mcmc_steps, batched)

    anneal_step = _make_anneal_step(
        log_q0, log_p, P=P, adaptive=adaptive,
        target_ess_frac=target_ess_frac, mcmc_steps=mcmc_steps,
        n_leapfrog=n_leapfrog, resample_threshold=resample_threshold,
        adapt_step=adapt_step, target_accept=target_accept,
        precondition=precondition, batched=batched, stage_fn=stage_fn)

    init_w = jnp.full((P,), -jnp.log(P * 1.0), betas.dtype)
    keys = jax.random.split(key, n_temps)
    ((x, log_w, log_z, *_),
     (ess_hist, acc_hist, beta_hist, step_hist, *metric_hist)) = \
        jax.lax.scan(
            anneal_step,
            (x0, init_w, jnp.zeros((), betas.dtype),
             jnp.zeros((), betas.dtype), jnp.asarray(step_size, betas.dtype),
             lq0_0, lp_0, glq0_0, glp_0),
            (betas, betas_prev, keys))
    return SMCResult(particles=x, log_weights=log_w, log_Z=log_z,
                     ess_history=ess_hist, accept_history=acc_hist,
                     beta_history=beta_hist, step_history=step_hist,
                     stage_metric_history=(metric_hist[0] if metric_hist
                                           else None))


def smc_segments(key, x0, *, log_q0: Callable, log_p: Callable,
                 n_temps: int = 10, betas=None, adaptive: bool = False,
                 target_ess_frac: float = 0.6, mcmc_steps: int = 2,
                 step_size=0.05, n_leapfrog: int = 5,
                 resample_threshold: float = 0.5,
                 adapt_step: bool = False, target_accept: float = 0.65,
                 precondition: bool = False, batched: bool = False,
                 stage_fn=None,
                 chunk_temps: int = 4, run_segment=None, on_segment=None,
                 start_stage: int = 0, init_state=None,
                 init_hists=None, compiler_options=None) -> SMCResult:
    """:func:`smc` executed as bounded per-program segments with the carry
    held on the host between them (VERDICT r3 item 4 — fault-tolerant long
    runs).

    One monolithic jitted anneal loses everything when the device faults
    mid-execution (observed: a ~35 s 64-temp LJ55 program died with
    ``UNAVAILABLE: TPU device error``, RESULTS.md r3). Here at most
    ``chunk_temps`` temperatures run per program; between segments the
    host holds the full SMC state, so a caller can retry a failed segment
    (``run_segment``) or persist the state (``on_segment``) and resume a
    killed run (``start_stage``/``init_state``/``init_hists``).

    Bitwise equality with :func:`smc` (same key): the segment scans apply
    the identical ``_make_anneal_step`` transition to the identical
    ``(betas, betas_prev, keys)`` slices — pinned by
    tests/test_sample.py::test_smc_segments_matches_monolithic.

    Extra args over :func:`smc`:
      chunk_temps: max temperatures per jitted program (the "modest stage
        budget" policy; <=0 means one segment).
      run_segment: optional executor ``f(fn, *args) -> fn(*args)`` wrapping
        every device dispatch (init + segments) — the hook where the driver
        injects retry-on-``UNAVAILABLE``.
      on_segment: optional callback ``(next_stage, state, hists)`` after
        each completed segment; ``state`` is the host-held carry and
        ``hists`` the per-stage history tuples so far (checkpointing hook).
      start_stage / init_state / init_hists: resume a run from a stage
        checkpoint (as captured by ``on_segment``); ``x0`` may be None then.
      compiler_options: optional dict passed to ``jax.jit`` for the init and
        segment programs (e.g. a tuned ``xla_tpu_scoped_vmem_limit_kib`` —
        48 MiB measured -16% at LJ55 shapes, bench_lj55.py).
    """
    if init_state is not None:
        P = init_state[1].shape[0]
    else:
        P = jax.tree_util.tree_leaves(x0)[0].shape[0]
    if betas is not None:
        n_temps = jnp.asarray(betas).shape[0]
    betas, betas_prev = _schedule(n_temps, betas)
    keys = jax.random.split(key, n_temps)
    if chunk_temps <= 0:
        chunk_temps = n_temps
    run = run_segment or (lambda f, *a: f(*a))

    anneal_step = _make_anneal_step(
        log_q0, log_p, P=P, adaptive=adaptive,
        target_ess_frac=target_ess_frac, mcmc_steps=mcmc_steps,
        n_leapfrog=n_leapfrog, resample_threshold=resample_threshold,
        adapt_step=adapt_step, target_accept=target_accept,
        precondition=precondition, batched=batched, stage_fn=stage_fn)

    jj = (lambda g: jax.jit(g, compiler_options=compiler_options)) \
        if compiler_options else jax.jit

    @jj
    def init_fn(x0):
        caches = _init_component_caches(log_q0, log_p, x0, mcmc_steps,
                                        batched)
        init_w = jnp.full((P,), -jnp.log(P * 1.0), betas.dtype)
        return (x0, init_w, jnp.zeros((), betas.dtype),
                jnp.zeros((), betas.dtype),
                jnp.asarray(step_size, betas.dtype)) + caches

    @jj
    def seg_fn(carry, xs):
        return jax.lax.scan(anneal_step, carry, xs)

    if init_state is None:
        state = run(init_fn, x0)
    else:
        state = init_state
    hists = list(init_hists) if init_hists else []
    i = int(start_stage)
    while i < n_temps:
        j = min(i + chunk_temps, n_temps)
        state, hist = run(seg_fn, state,
                          (betas[i:j], betas_prev[i:j], keys[i:j]))
        # materialize on host before declaring the segment survived
        jax.block_until_ready(state[1])
        hists.append(hist)
        if on_segment is not None:
            on_segment(j, state, hists)
        i = j

    cat = lambda k: jnp.concatenate([h[k] for h in hists])
    x, log_w, log_z = state[0], state[1], state[2]
    # a resumed pre-r5 state file may carry 4-entry hist tuples while the
    # new segments carry 5 — pad the short ones with zeros
    if stage_fn is not None:
        hists = [h if len(h) > 4
                 else h + (jnp.zeros_like(h[0], dtype=jnp.int32),)
                 for h in hists]
    return SMCResult(particles=x, log_weights=log_w, log_Z=log_z,
                     ess_history=cat(0), accept_history=cat(1),
                     beta_history=cat(2), step_history=cat(3),
                     stage_metric_history=(cat(4) if stage_fn is not None
                                           else None))


def ais(key, x0, *, log_q0: Callable, log_p: Callable,
        n_temps: int = 10, betas=None, mcmc_steps: int = 2, step_size=0.05,
        n_leapfrog: int = 5, adapt_step: bool = False,
        target_accept: float = 0.65, precondition: bool = False,
        batched: bool = False, stage_fn=None) -> SMCResult:
    """Annealed importance sampling: SMC machinery without resampling.

    Each particle carries its full annealed weight; ``log_Z`` is the AIS
    estimate ``logmeanexp(log_w)``. ``batched``/``adapt_step``/
    ``precondition``/``stage_fn`` as in :func:`smc`.
    """
    P = jax.tree_util.tree_leaves(x0)[0].shape[0]
    if betas is None:
        betas = jnp.linspace(1.0 / n_temps, 1.0, n_temps)
    else:
        betas = jnp.asarray(betas)
        n_temps = betas.shape[0]
    betas_prev = jnp.concatenate([jnp.zeros((1,), betas.dtype), betas[:-1]])

    lq0_0, lp_0, glq0_0, glp_0 = _init_component_caches(
        log_q0, log_p, x0, mcmc_steps, batched)

    def anneal_step(carry, inputs):
        x, log_w, eps, lq0_x, lp_x, glq0_x, glp_x = carry
        beta, beta_prev, k = inputs
        delta = beta - beta_prev
        log_w = log_w + delta * (lp_x - lq0_x)

        x, acc, (lq0_x, lp_x), (glq0_x, glp_x) = _rejuvenate(
            k, x, beta, (lq0_x, lp_x), (glq0_x, glp_x),
            log_q0=log_q0, log_p=log_p, mcmc_steps=mcmc_steps,
            step_size=eps, n_leapfrog=n_leapfrog, P=P,
            batched=batched,
            mass=_ensemble_mass(x) if precondition else None)
        eps_next = (_adapted_step(eps, acc, target_accept)
                    if (adapt_step and mcmc_steps > 0) else eps)
        ess = ess_from_log_weights(log_w)
        hist = (ess, acc, eps)
        if stage_fn is not None:                  # see _make_anneal_step
            hist = hist + (stage_fn(x),)
        return ((x, log_w, eps_next, lq0_x, lp_x, glq0_x, glp_x), hist)

    keys = jax.random.split(key, n_temps)
    (x, log_w, *_), (ess_hist, acc_hist, step_hist, *metric_hist) = \
        jax.lax.scan(
            anneal_step, (x0, jnp.zeros((P,), betas.dtype),
                          jnp.asarray(step_size, betas.dtype),
                          lq0_0, lp_0, glq0_0, glp_0),
            (betas, betas_prev, keys))
    log_z = (jax.scipy.special.logsumexp(log_w)
             - jnp.log(jnp.asarray(P, log_w.dtype)))
    return SMCResult(particles=x, log_weights=log_w, log_Z=log_z,
                     ess_history=ess_hist, accept_history=acc_hist,
                     step_history=step_hist,
                     stage_metric_history=(metric_hist[0] if metric_hist
                                           else None))
