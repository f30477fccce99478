"""No-U-Turn Sampler (iterative, multinomial), TPU-native.

Implements multinomial NUTS (Hoffman & Gelman 2014; Betancourt 2017 for the
multinomial weighting) with the *iterative* tree-building scheme: a doubling
tree of depth ``max_depth`` is explored one leapfrog at a time inside
``lax.while_loop`` with an O(max_depth) checkpoint stack for sub-tree U-turn
checks — no recursion, fixed shapes, fully jittable and ``vmap``-able over
chains.

Sub-tree bookkeeping (derived from the binary structure of the doubling
tree): leaves are indexed 0..2^d-1 within a subtree. A leaf ``s`` with
``tz(s)`` trailing zero bits *starts* subtrees of sizes 2..2^tz(s); a leaf
``j`` with ``to(j)`` trailing one bits *ends* subtrees of sizes 2..2^to(j)
whose start leaves are the top ``to(j)`` entries of the checkpoint stack.
After checking the generalized U-turn criterion (momentum-sum against both
boundary momenta) for those subtrees, the top ``to(j)-1`` checkpoints are
popped (the deepest one still bounds a larger, incomplete subtree).

State is a flat vector per chain; wrap structured states with ravel/unravel
at the call site. Energies follow the convention ``H = -log_prob + |p|^2/2``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

DIVERGENCE_THRESHOLD = 1000.0


class _TreeState(NamedTuple):
    q_left: jax.Array
    p_left: jax.Array
    q_right: jax.Array
    p_right: jax.Array
    q_prop: jax.Array        # current multinomial proposal
    log_w: jax.Array         # logsumexp of -dH over the tree
    p_sum: jax.Array         # momentum sum over the tree
    turning: jax.Array
    diverging: jax.Array


def _leapfrog(glp, q, p, eps, g):
    """One leapfrog step with the incoming force ``g = glp(q)`` cached
    (adjacent steps share the endpoint force: n+1 gradient evals, not 2n)."""
    p = p + 0.5 * eps * g
    q = q + eps * p
    g = glp(q)
    p = p + 0.5 * eps * g
    return q, p, g


def _uturn(p_sum, p_first, p_last):
    return (p_sum @ p_first < 0.0) | (p_sum @ p_last < 0.0)


def _count_trailing_ones(n):
    """Trailing one bits of ``n`` (int32, n >= 0), branch-free."""
    # tz of (n+1) == trailing ones of n
    m = n + 1
    return _count_trailing_zeros(m)


def _count_trailing_zeros(m):
    tz = jnp.zeros((), jnp.int32)
    # m fits in 31 bits (max_depth <= 20 in practice)
    def body(i, carry):
        tz, done = carry
        bit = (m >> i) & 1
        newly_done = done | (bit == 1)
        tz = jnp.where(done | (bit == 1), tz, tz + 1)
        return tz, newly_done
    tz, _ = jax.lax.fori_loop(0, 31, body, (tz, jnp.asarray(False)))
    return tz


def _build_subtree(key, glp, log_prob, q0, p0, h0, eps, direction, depth,
                   max_depth):
    """Simulate one subtree of ``2**depth`` leapfrog leaves from (q0, p0).

    Returns a ``_TreeState`` for the subtree (left = first state simulated,
    right = last). Terminates early (flags set) on divergence or any
    sub-tree U-turn.
    """
    dim = q0.shape[0]
    n_leaf = jnp.asarray(2, jnp.int32) ** depth

    # checkpoint stack: start-leaf momenta and exclusive momentum cumsums
    # (stored in the global "rightward" convention)
    p_ckpt = jnp.zeros((max_depth + 1, dim), q0.dtype)
    psum_ckpt = jnp.zeros((max_depth + 1, dim), q0.dtype)

    init = dict(
        i=jnp.asarray(0, jnp.int32),
        # simulate in a direction-local frame: momentum flipped for leftward
        q=q0, p=direction * p0, g=glp(q0),
        tree=_TreeState(q_left=q0, p_left=p0, q_right=q0, p_right=p0,
                        q_prop=q0, log_w=jnp.asarray(-jnp.inf, q0.dtype),
                        p_sum=jnp.zeros_like(p0),
                        turning=jnp.asarray(False),
                        diverging=jnp.asarray(False)),
        p_ckpt=p_ckpt, psum_ckpt=psum_ckpt, sp=jnp.asarray(0, jnp.int32),
        key=key,
    )

    def cond(s):
        return ((s["i"] < n_leaf) & ~s["tree"].turning
                & ~s["tree"].diverging)

    def body(s):
        i = s["i"]
        key, k_acc = jax.random.split(s["key"])
        q, p_sim, g = _leapfrog(glp, s["q"], s["p"], eps, s["g"])
        p = direction * p_sim  # back to the global rightward convention
        h = -log_prob(q) + 0.5 * (p @ p)
        dh = h - h0
        diverging = dh > DIVERGENCE_THRESHOLD
        log_w_leaf = -dh

        tree = s["tree"]
        p_sum = tree.p_sum + p
        # progressive multinomial proposal within the subtree
        log_w_new = jnp.logaddexp(tree.log_w, log_w_leaf)
        accept_prob = jnp.exp(log_w_leaf - log_w_new)
        take = jax.random.uniform(k_acc) < accept_prob
        q_prop = jnp.where(take, q, tree.q_prop)

        # push a checkpoint when this leaf starts subtrees (even leaf):
        # store the leaf momentum and the momentum cumsum BEFORE this leaf.
        is_even = (i % 2) == 0
        sp = s["sp"]
        p_ckpt = jax.lax.cond(
            is_even, lambda a: a.at[sp].set(p), lambda a: a, s["p_ckpt"])
        psum_ckpt = jax.lax.cond(
            is_even, lambda a: a.at[sp].set(tree.p_sum), lambda a: a,
            s["psum_ckpt"])
        sp = jnp.where(is_even, sp + 1, sp)

        # at an odd leaf: check the subtrees ending here against the top
        # to(i) checkpoints, then pop to(i)-1 of them
        t_ones = _count_trailing_ones(i)

        def check_level(k, turning):
            # k = 1..t_ones ; checkpoint index sp-k
            idx = sp - k
            valid = k <= t_ones
            rho = p_sum - psum_ckpt[idx]
            turn = _uturn(rho, p_ckpt[idx], p)
            return turning | (valid & turn)

        turning = jax.lax.fori_loop(
            1, max_depth + 1,
            lambda k, t: check_level(k, t), tree.turning)
        turning = jnp.where((i % 2) == 1, turning, tree.turning)
        sp = jnp.where((i % 2) == 1, sp - (t_ones - 1), sp)

        tree = _TreeState(
            q_left=jnp.where(i == 0, q, tree.q_left),
            p_left=jnp.where(i == 0, p, tree.p_left),
            q_right=q, p_right=p,
            q_prop=q_prop, log_w=log_w_new, p_sum=p_sum,
            turning=turning, diverging=tree.diverging | diverging)
        return dict(i=i + 1, q=q, p=p_sim, g=g, tree=tree, p_ckpt=p_ckpt,
                    psum_ckpt=psum_ckpt, sp=sp, key=key)

    out = jax.lax.while_loop(cond, body, init)
    return out["tree"]


def nuts_kernel(key, q, log_prob: Callable, step_size, max_depth: int = 8,
                grad_log_prob: Callable | None = None):
    """One NUTS transition for a single chain over a flat state vector ``q``.

    Returns ``(q', info dict)`` with ``accept_prob`` (average multinomial
    acceptance statistic), ``depth`` reached, ``diverging``.
    """
    glp = grad_log_prob or jax.grad(log_prob)
    k_mom, k_loop = jax.random.split(key)
    p0 = jax.random.normal(k_mom, q.shape, q.dtype)
    h0 = -log_prob(q) + 0.5 * (p0 @ p0)

    init_tree = _TreeState(q_left=q, p_left=p0, q_right=q, p_right=p0,
                           q_prop=q, log_w=jnp.zeros((), q.dtype),
                           p_sum=p0, turning=jnp.asarray(False),
                           diverging=jnp.asarray(False))

    def cond(s):
        tree, depth, key = s
        return (depth < max_depth) & ~tree.turning & ~tree.diverging

    def body(s):
        tree, depth, key = s
        key, k_dir, k_sub, k_swap = jax.random.split(key, 4)
        go_right = jax.random.bernoulli(k_dir)
        direction = jnp.where(go_right, 1.0, -1.0).astype(q.dtype)
        q_edge = jnp.where(go_right, tree.q_right, tree.q_left)
        p_edge = jnp.where(go_right, tree.p_right, tree.p_left)

        sub = _build_subtree(k_sub, glp, log_prob, q_edge, p_edge, h0,
                             step_size, direction, depth, max_depth)

        # biased progressive sampling between old tree and new subtree
        accept_prob = jnp.minimum(1.0, jnp.exp(sub.log_w - tree.log_w))
        take = (jax.random.uniform(k_swap) < accept_prob) & ~sub.turning \
            & ~sub.diverging
        q_prop = jnp.where(take, sub.q_prop, tree.q_prop)

        q_left = jnp.where(go_right, tree.q_left, sub.q_right)
        p_left = jnp.where(go_right, tree.p_left, sub.p_right)
        q_right = jnp.where(go_right, sub.q_right, tree.q_right)
        p_right = jnp.where(go_right, sub.p_right, tree.p_right)
        p_sum = tree.p_sum + sub.p_sum
        turning = (sub.turning | sub.diverging
                   | _uturn(p_sum, p_left, p_right))
        merged = _TreeState(
            q_left=q_left, p_left=p_left, q_right=q_right, p_right=p_right,
            q_prop=q_prop,
            log_w=jnp.logaddexp(tree.log_w, sub.log_w),
            p_sum=p_sum, turning=turning,
            diverging=tree.diverging | sub.diverging)
        return (merged, depth + 1, key)

    tree, depth, _ = jax.lax.while_loop(cond, body,
                                        (init_tree, jnp.asarray(0), k_loop))
    info = {"depth": depth, "diverging": tree.diverging}
    return tree.q_prop, info


class NUTSResult(NamedTuple):
    samples: jax.Array       # [n_samples, C, dim]
    final_state: jax.Array   # [C, dim]
    mean_depth: jax.Array
    divergence_rate: jax.Array


def run_nuts(key, x0, log_prob: Callable, *, n_samples: int,
             n_warmup: int = 0, step_size=0.1, max_depth: int = 8,
             target_accept: float = 0.8) -> NUTSResult:
    """Run vmapped NUTS chains over flat states ``x0 [C, dim]``.

    Warmup adapts the step size by dual averaging on the divergence-free
    depth statistic... (simple scheme: reuse HMC dual averaging with
    n_leapfrog=2^(max_depth/2) as a proxy is inaccurate, so here warmup runs
    NUTS itself and adapts on the empirical acceptance proxy
    ``exp(min(0, -dH))`` is not directly available; instead we adapt on the
    divergence indicator: shrink on divergence, grow slowly otherwise.)
    """
    kernel = jax.vmap(lambda k, xx, eps: nuts_kernel(k, xx, log_prob, eps,
                                                     max_depth),
                      in_axes=(0, 0, None))
    C = x0.shape[0]

    def warm_step(carry, k):
        x, log_eps = carry
        keys = jax.random.split(k, C)
        x, info = kernel(keys, x, jnp.exp(log_eps))
        div_rate = info["diverging"].mean()
        # multiplicative step-size control: back off hard on divergences
        log_eps = log_eps + jnp.where(div_rate > 0.05, -0.3, 0.02)
        return (x, log_eps), None

    log_eps = jnp.log(jnp.asarray(step_size, x0.dtype))
    if n_warmup:
        key, kw = jax.random.split(key)
        (x0, log_eps), _ = jax.lax.scan(warm_step, (x0, log_eps),
                                        jax.random.split(kw, n_warmup))

    def step(x, k):
        keys = jax.random.split(k, C)
        x, info = kernel(keys, x, jnp.exp(log_eps))
        return x, (x, info["depth"], info["diverging"])

    xf, (samples, depths, divs) = jax.lax.scan(
        step, x0, jax.random.split(key, n_samples))
    return NUTSResult(samples=samples, final_state=xf,
                      mean_depth=depths.mean(),
                      divergence_rate=divs.mean())
