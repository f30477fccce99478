"""MCMC kernels (HMC, MALA) over pytree states, vectorized over chains.

TPU-native design: every kernel is a pure function ``(key, state) -> state``
over an arbitrary pytree state; chains are a leading axis handled by ``vmap``
and steps by ``lax.scan`` — thousands of chains run as one fused XLA program
(there is no MCMC in the reference; this is the north-star refinement layer,
BASELINE.json "HMC/NUTS refinement").
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


def _tree_randn_like(key, tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(k, x.shape, x.dtype)
                  for k, x in zip(keys, leaves)])


def _tree_dot(a, b):
    return sum((x * y).sum() for x, y in
               zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


def _tree_axpy(alpha, x, y):
    """alpha * x + y over pytrees. ``alpha`` is cast to each leaf's dtype so
    a strongly-typed f64 scalar (e.g. a beta/step-size from an x64 schedule)
    can't promote f32 particle states out of their loop-carry type; a
    per-particle ``[P]`` alpha broadcasts over trailing leaf axes."""
    return jax.tree_util.tree_map(
        lambda a, b: _coef(alpha, a) * a + b, x, y)


def batched_value_and_grad(f: Callable) -> Callable:
    """Batched value-and-grad of a per-particle density: ``f`` maps a
    ``[P, ...]`` pytree to ``[P]`` log-densities; returns ``(vals [P],
    grads [P, ...])``.

    Equivalent to ``vmap(value_and_grad(f_single))`` when particles are
    independent (one cotangent of ones recovers every per-particle gradient),
    but keeps the whole computation one batched program — so fused kernels
    (e.g. the Pallas EGCL edge pipeline) see the full particle batch instead
    of vmapped B=1 slices, and XLA schedules one large matmul stream.
    """
    def vg(x):
        vals, pull = jax.vjp(f, x)
        (g,) = pull(jnp.ones_like(vals))
        return vals, g
    return vg


def _bcast_to(v, leaf):
    """Reshape a ``[P]`` vector for broadcasting against a ``[P, ...]`` leaf."""
    return v.reshape(v.shape + (1,) * (leaf.ndim - v.ndim))


def _coef(v, leaf):
    """A scalar or per-particle ``[P]`` coefficient, dtype-cast and shaped to
    broadcast against ``leaf [P, ...]`` (identity for scalars — the
    per-chain kernels keep their exact scalar arithmetic)."""
    v = jnp.asarray(v, leaf.dtype)
    return v if v.ndim == 0 else _bcast_to(v, leaf)


def _tree_dot_batched(a, b):
    """Per-particle inner product over pytrees with leading ``[P]`` axes."""
    return sum((x * y).sum(axis=tuple(range(1, x.ndim)))
               for x, y in zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(b)))


def hmc_kernel(key, x, log_prob: Callable, step_size, n_leapfrog: int,
               grad_log_prob: Callable | None = None, log_prob_x=None):
    """One HMC step for a single chain. Returns ``(x', accepted, log_prob')``.

    The shared force between adjacent leapfrog steps is computed once
    (``n_leapfrog + 1`` gradient evaluations, not ``2 * n_leapfrog``) — for
    flow-proposal targets each gradient is a full flow fwd+bwd, so this is
    the SMC hot path. ``log_prob_x`` (optional) skips recomputing the
    current state's log density when the caller already has it.
    """
    glp = grad_log_prob or jax.grad(log_prob)
    kmom, kacc = jax.random.split(key)
    p0 = _tree_randn_like(kmom, x)

    def leapfrog(carry, _):
        q, p, g = carry
        p = _tree_axpy(0.5 * step_size, g, p)
        q = _tree_axpy(step_size, p, q)
        g = glp(q)
        p = _tree_axpy(0.5 * step_size, g, p)
        return (q, p, g), None

    (q_new, p_new, _), _ = jax.lax.scan(leapfrog, (x, p0, glp(x)), None,
                                        length=n_leapfrog)

    lp0 = log_prob(x) if log_prob_x is None else log_prob_x
    lp1 = log_prob(q_new)
    h0 = -lp0 + 0.5 * _tree_dot(p0, p0)
    h1 = -lp1 + 0.5 * _tree_dot(p_new, p_new)
    log_alpha = h0 - h1
    accept = jnp.log(jax.random.uniform(kacc)) < log_alpha
    x_out = jax.tree_util.tree_map(
        lambda a, b: jnp.where(accept, a, b), q_new, x)
    return x_out, accept, jnp.where(accept, lp1, lp0)


def tempered_hmc_kernel(key, x, log_q0: Callable, log_p: Callable, beta,
                        step_size, n_leapfrog: int, vals, grads, mass=None):
    """One HMC step targeting ``(1-beta) log_q0 + beta log_p`` with cached
    per-component values and gradients.

    ``vals = (lq0_x, lp_x)`` and ``grads = (glq0_x, glp_x)`` are the two
    density components and their gradients at the current state. Caching the
    *components* (rather than the tempered combination) lets the SMC anneal
    loop reuse them across temperature changes: the tempered value/gradient at
    any ``beta`` is a linear recombination, so neither the kernel's initial
    gradient nor the incremental-weight evaluation at the next temperature
    costs a density call. For flow-proposal targets each ``log_q0``
    value/gradient is a full EGCL-flow forward/backward — with this caching
    each kernel invocation costs exactly ``n_leapfrog`` flow value-and-grads
    and nothing else (``mcmc_steps * n_leapfrog`` per SMC temperature; the
    final acceptance values ride along with the last leapfrog gradient via
    ``value_and_grad``).

    Returns ``(x', accepted, vals', grads')`` with the caches at the accepted
    state.
    """
    return _tempered_hmc(key, x, jax.value_and_grad(log_q0),
                         jax.value_and_grad(log_p), beta, step_size,
                         n_leapfrog, vals, grads, _tree_dot, mass=mass)


def _tempered_hmc(key, x, vgq, vgp, beta, step_size, n_leapfrog, vals, grads,
                  tree_dot, mass=None):
    """Shared tempered-HMC core for the per-chain and batched kernels.

    ``vgq``/``vgp`` are value-and-grad callables; ``tree_dot`` computes the
    momentum inner product (``_tree_dot`` → scalar per-chain energies,
    ``_tree_dot_batched`` → ``[P]``). All selects broadcast the acceptance
    over trailing leaf axes, which is a no-op in the scalar case.

    ``mass``: optional pytree of per-coordinate POSITION scales ``s``
    (e.g. the target's marginal stds) broadcastable against the state
    leaves. Sets the mass matrix to the inverse covariance,
    ``M = diag(1/s^2)`` — the optimal diagonal choice for a target with
    stds ``s``: ``p ~ N(0, 1/s^2)``, drift ``q += eps * s^2 * p``,
    kinetic ``sum((s*p)^2) / 2``. Equivalent to unit-mass HMC in the
    whitened coordinates ``q / s`` with position moves ~ ``eps * s``.

    Batched mode additionally accepts PER-PARTICLE ``beta``/``step_size``
    vectors ``[P]`` (broadcast over trailing leaf axes) — the batched-REMC
    path runs every temperature slot's chains in one flattened ``[K*M]``
    kernel call with per-replica betas (``sample/remc.py: batched=True``).
    """
    w0, w1 = 1.0 - beta, beta

    def comb(gq, gp):
        # per-leaf cast (see _tree_axpy); [P] coefficients broadcast
        return jax.tree_util.tree_map(
            lambda a, b: _coef(w0, a) * a + _coef(w1, b) * b, gq, gp)

    kmom, kacc = jax.random.split(key)
    p0 = _tree_randn_like(kmom, x)
    if mass is not None:
        p0 = jax.tree_util.tree_map(
            lambda n, s: n / jnp.asarray(s, n.dtype), p0, mass)

        def drift(q, p):
            return jax.tree_util.tree_map(
                lambda qq, pp, s: qq + (_coef(step_size, qq)
                                        * jnp.asarray(s * s, qq.dtype) * pp),
                q, p, mass)

        def scaled(p):
            return jax.tree_util.tree_map(
                lambda pp, s: pp * jnp.asarray(s, pp.dtype), p, mass)

        def kinetic(p):
            ps = scaled(p)
            return tree_dot(ps, ps)
    else:
        def drift(q, p):
            return _tree_axpy(step_size, p, q)

        def kinetic(p):
            return tree_dot(p, p)

    def leapfrog(carry, _):
        q, p, gq, gp, _, _ = carry
        p = _tree_axpy(0.5 * step_size, comb(gq, gp), p)
        q = drift(q, p)
        vq, gq = vgq(q)
        vp, gp = vgp(q)
        p = _tree_axpy(0.5 * step_size, comb(gq, gp), p)
        return (q, p, gq, gp, vq, vp), None

    (q_new, p_new, gq_new, gp_new, vq_new, vp_new), _ = jax.lax.scan(
        leapfrog, (x, p0, grads[0], grads[1], vals[0], vals[1]), None,
        length=n_leapfrog)

    lp0 = w0 * vals[0] + w1 * vals[1]            # [] per-chain | [P] batched
    lp1 = w0 * vq_new + w1 * vp_new
    h0 = -lp0 + 0.5 * kinetic(p0)
    h1 = -lp1 + 0.5 * kinetic(p_new)
    accept = jnp.log(jax.random.uniform(kacc, lp0.shape, lp0.dtype)) < h0 - h1

    sel = lambda a, b: jax.tree_util.tree_map(
        lambda u, v: jnp.where(_bcast_to(accept, u), u, v), a, b)
    x_out = sel(q_new, x)
    vals_out = (jnp.where(accept, vq_new, vals[0]),
                jnp.where(accept, vp_new, vals[1]))
    grads_out = (sel(gq_new, grads[0]), sel(gp_new, grads[1]))
    return x_out, accept, vals_out, grads_out


def tempered_hmc_kernel_batched(key, x, vgq: Callable, vgp: Callable, beta,
                                step_size, n_leapfrog: int, vals, grads,
                                mass=None):
    """Batched-particle :func:`tempered_hmc_kernel`: ``x`` is ``[P, ...]``;
    ``vgq``/``vgp`` are *batched* value-and-grad callables (see
    :func:`batched_value_and_grad`) returning ``([P], [P, ...])``. One key
    drives all particles (leading-axis draws are independent). Same component
    caching contract as the per-chain kernel; ``mass`` leaves have no
    leading P axis and broadcast across particles."""
    return _tempered_hmc(key, x, vgq, vgp, beta, step_size, n_leapfrog,
                         vals, grads, _tree_dot_batched, mass=mass)


def mala_kernel(key, x, log_prob: Callable, step_size,
                grad_log_prob: Callable | None = None):
    """One Metropolis-adjusted Langevin step for a single chain."""
    glp = grad_log_prob or jax.grad(log_prob)
    knoise, kacc = jax.random.split(key)
    noise = _tree_randn_like(knoise, x)
    g = glp(x)
    mean_fwd = _tree_axpy(step_size, g, x)
    prop = _tree_axpy(jnp.sqrt(2.0 * step_size), noise, mean_fwd)
    g_prop = glp(prop)
    mean_rev = _tree_axpy(step_size, g_prop, prop)

    def lsq(a, b):
        return sum(((u - v) ** 2).sum() for u, v in
                   zip(jax.tree_util.tree_leaves(a),
                       jax.tree_util.tree_leaves(b)))

    log_alpha = (log_prob(prop) - log_prob(x)
                 + (-lsq(x, mean_rev) + lsq(prop, mean_fwd)) / (4.0 * step_size))
    accept = jnp.log(jax.random.uniform(kacc)) < log_alpha
    x_out = jax.tree_util.tree_map(lambda a, b: jnp.where(accept, a, b),
                                   prop, x)
    return x_out, accept


class HMCResult(NamedTuple):
    samples: object          # pytree with leading [n_samples, C, ...]
    final_state: object      # pytree [C, ...]
    accept_rate: jax.Array   # scalar


def run_hmc(key, x0, log_prob: Callable, *, n_samples: int, n_warmup: int = 0,
            step_size=0.1, n_leapfrog: int = 10, thin: int = 1) -> HMCResult:
    """Run vmapped HMC chains. ``x0`` has a leading chain axis ``[C, ...]``;
    ``log_prob`` maps one chain state to a scalar.

    The current-state log density rides along in the carry (the kernel's
    ``log_prob_x`` fast path), so each step costs exactly one fresh density
    evaluation at the proposal — for flow targets a density call is a full
    flow forward, so recomputing ``log_prob(x)`` per step would double the
    hot-path cost."""
    kernel = jax.vmap(
        lambda k, x, lp: hmc_kernel(k, x, log_prob, step_size, n_leapfrog,
                                    log_prob_x=lp),
        in_axes=(0, 0, 0))
    n_chains = jax.tree_util.tree_leaves(x0)[0].shape[0]
    lp0 = jax.vmap(log_prob)(x0)

    def sweep(carry, k):
        x, lp, acc = carry
        keys = jax.random.split(k, n_chains)

        def one(i, xa):
            x, lp, a = xa
            x, accepted, lp = kernel(jax.vmap(jax.random.fold_in,
                                              (0, None))(keys, i), x, lp)
            return x, lp, a + accepted.mean()

        x, lp, acc_inc = jax.lax.fori_loop(0, thin, one, (x, lp, 0.0))
        return (x, lp, acc + acc_inc / thin), x

    # warmup (discarded)
    key, kw = jax.random.split(key)
    if n_warmup:
        (x0, lp0, _), _ = jax.lax.scan(
            sweep, (x0, lp0, 0.0), jax.random.split(kw, n_warmup))

    (xf, _, acc), samples = jax.lax.scan(
        sweep, (x0, lp0, 0.0), jax.random.split(key, n_samples))
    return HMCResult(samples=samples, final_state=xf,
                     accept_rate=acc / n_samples)


def dual_averaging_warmup(key, x0, log_prob: Callable, *, n_adapt: int = 100,
                          n_leapfrog: int = 10, target_accept: float = 0.65,
                          init_step_size: float = 0.1):
    """Nesterov dual-averaging step-size adaptation (Hoffman & Gelman 2014).

    Returns ``(adapted_step_size, x_adapted)``. Chains share one step size
    (mean acceptance statistic).
    """
    kernel = jax.vmap(
        lambda k, x, lp, eps: hmc_kernel(k, x, log_prob, eps, n_leapfrog,
                                         log_prob_x=lp),
        in_axes=(0, 0, 0, None))
    n_chains = jax.tree_util.tree_leaves(x0)[0].shape[0]
    lp0 = jax.vmap(log_prob)(x0)

    mu = jnp.log(10.0 * init_step_size)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def step(carry, tk):
        t, k = tk
        x, lp, log_eps, log_eps_bar, h_bar = carry
        keys = jax.random.split(k, n_chains)
        x, accepted, lp = kernel(keys, x, lp, jnp.exp(log_eps))
        a = accepted.mean()
        tt = t + 1.0
        h_bar = (1.0 - 1.0 / (tt + t0)) * h_bar + (target_accept - a) / (tt + t0)
        log_eps = mu - jnp.sqrt(tt) / gamma * h_bar
        w = tt ** (-kappa)
        log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
        return (x, lp, log_eps, log_eps_bar, h_bar), a

    init = (x0, lp0, jnp.log(init_step_size), jnp.log(init_step_size), 0.0)
    (x, _, _, log_eps_bar, _), _ = jax.lax.scan(
        step, init,
        (jnp.arange(n_adapt, dtype=jnp.float32),
         jax.random.split(key, n_adapt)))
    return jnp.exp(log_eps_bar), x


def run_mala(key, x0, log_prob: Callable, *, n_samples: int,
             n_warmup: int = 0, step_size=0.01, thin: int = 1) -> HMCResult:
    """Run vmapped MALA chains (same contract/result type as :func:`run_hmc`).

    ``x0`` carries a leading chain axis ``[C, ...]``; each sweep applies
    ``thin`` :func:`mala_kernel` steps per chain; warmup sweeps are
    discarded. Gradients are one density backward per proposal — the cheap
    local-move companion to HMC for targets where leapfrog trajectories
    don't pay (library capability claimed by PARITY.md; YAML-reachable via
    ``sampling.algo: mala``).
    """
    kernel = jax.vmap(lambda k, x: mala_kernel(k, x, log_prob, step_size))
    n_chains = jax.tree_util.tree_leaves(x0)[0].shape[0]

    def sweep(carry, k):
        x, acc = carry
        keys = jax.random.split(k, n_chains)

        def one(i, xa):
            x, a = xa
            x, accepted = kernel(jax.vmap(jax.random.fold_in,
                                          (0, None))(keys, i), x)
            return x, a + accepted.mean()

        x, acc_inc = jax.lax.fori_loop(0, thin, one, (x, 0.0))
        return (x, acc + acc_inc / thin), x

    key, kw = jax.random.split(key)
    if n_warmup:
        (x0, _), _ = jax.lax.scan(sweep, (x0, 0.0),
                                  jax.random.split(kw, n_warmup))
    (xf, acc), samples = jax.lax.scan(sweep, (x0, 0.0),
                                      jax.random.split(key, n_samples))
    return HMCResult(samples=samples, final_state=xf,
                     accept_rate=acc / n_samples)
