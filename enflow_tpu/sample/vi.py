"""Flow-VI: train the flow as a variational family against a Boltzmann target.

North-star capability (BASELINE.json: "flows ... trained as variational
families against Boltzmann targets", "LJ13: flow-VI training"). The reference
only trains by maximum likelihood on MD data (reference
``enflow/main.py:197-261``); flow-VI needs no data at all:

    KL(q || p) = E_{z~base}[ log q(x) - log p(x) ],   x = R(z)
               = E_{z~base}[ log p0(z) - ldj_R(z) - log p(x) ]
               = -E[ ldj_R + log p(x) ] + const(params)

so the reparameterized loss is ``-(ldj_R + log p(x)).mean()`` with gradients
flowing through the deterministic reverse flow ``R`` (``flow.reverse_core``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax
import jax.numpy as jnp

from ..data.system import System
from ..flow.integrators import FlowConfig, forward_core, reverse_core


def sample_base(key, B, n_atoms, node_nf, *, box, r_cut, pos_std=1.0,
                vel_std=1.0, feat_std=1.0, dtype=jnp.float32) -> System:
    """Draw a batch of latent Systems from the Gaussian base distribution."""
    ks = jax.random.split(key, 4)
    shape2 = (B, n_atoms, node_nf)
    shape3 = (B, n_atoms, 3)
    return System(
        h=feat_std * jax.random.normal(ks[0], shape2, dtype),
        g=feat_std * jax.random.normal(ks[1], shape2, dtype),
        pos=pos_std * jax.random.normal(ks[2], shape3, dtype),
        vel=vel_std * jax.random.normal(ks[3], shape3, dtype),
        mask=jnp.ones((B, n_atoms), bool),
        box=jnp.full((B, 3), box, dtype),
        r_cut=jnp.full((B,), r_cut, dtype),
    )


def make_base_log_prob(pos_std=1.0, vel_std=1.0, feat_std=1.0):
    """Per-molecule ``[B]`` Gaussian log density matching
    :func:`sample_base`'s draws (normalized, masked)."""

    def log_prob(s: System):
        am = s.mask[..., None]

        def term(f, std):
            n_dims = jnp.where(am, jnp.ones_like(f), 0.0).sum(axis=(1, 2))
            sq = jnp.where(am, (f / std) ** 2, 0.0).sum(axis=(1, 2))
            return -0.5 * (sq + n_dims * math.log(2.0 * math.pi * std * std))

        return (term(s.h, feat_std) + term(s.g, feat_std)
                + term(s.pos, pos_std) + term(s.vel, vel_std))

    return log_prob


def flow_vi_loss(params, cfg: FlowConfig, base_batch: System,
                 target_log_prob: Callable, *, stl: bool = False,
                 base_log_prob: Callable | None = None):
    """Reverse-KL loss: ``-(ldj_R + log p(R(z))).mean()``.

    ``target_log_prob`` maps a System batch to per-molecule ``[B]`` log
    densities.

    The ldj here is the *true* log-det (``exact_ldj`` forced on): the KL
    identity requires log q(x) = log p0(z) - ldj_R with the mathematical
    Jacobian. ``FlowConfig.exact_ldj=False`` is an NLL-parity quirk
    (reference accumulates ``Q.sum()`` though the velocity scaling acts on
    all 3 components — flow/integrators.py docstring); training VI with the
    parity ldj would optimize a mis-weighted objective (1/3 of the volume
    term), and sampling with it would bias SMC/AIS importance weights.

    ``stl=True`` uses the sticking-the-landing estimator (Roeder et al.
    2017): ``log q`` is evaluated by re-encoding ``x`` through the *forward*
    flow with stop-gradient parameters, which removes the score term
    ``E[∂_φ log q_φ]`` (zero in expectation, nonzero per sample) from the
    gradient. At ``q = p`` the per-sample STL gradient vanishes identically
    — near convergence the gradient variance drops to the sampling noise of
    the mismatch. Costs one extra flow forward+backward per step.
    ``base_log_prob`` (default: unit-std :func:`make_base_log_prob`) must
    match the distribution ``base_batch`` was drawn from. The loss *value*
    differs from the default estimator by exactly ``+ E[log p0(z)]`` (the
    parameter-independent constant the default form drops); gradients are
    what change.
    """
    cfg = dataclasses.replace(cfg, exact_ldj=True)
    out, ldj = reverse_core(params, cfg, base_batch)
    if not stl:
        return -(ldj + target_log_prob(out)).mean(), out
    sg = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
    z_re, ldj_fwd = forward_core(sg, cfg, out)
    lp0 = (base_log_prob or make_base_log_prob())(z_re)
    log_q = lp0 + ldj_fwd
    return (log_q - target_log_prob(out)).mean(), out


def make_system_target(log_prob_pos: Callable, kBT_aux: float = 1.0):
    """Lift a positions-only target (e.g. ``targets.lj_cluster(...).log_prob``)
    to a System target: Boltzmann on positions, unit Gaussians (scaled by
    ``kBT_aux``) on velocities and features."""

    def log_prob(sys_b: System):
        lp = jax.vmap(log_prob_pos)(sys_b.pos)
        am = sys_b.mask[..., None]
        aux = 0.0
        for f in (sys_b.vel, sys_b.h, sys_b.g):
            aux = aux + jnp.where(am, f * f, 0.0).sum(axis=(1, 2))
        return lp - 0.5 * aux / kBT_aux

    return log_prob
