"""Alchemical negative log-likelihood against the LJ-fluid Boltzmann base.

Formula parity with reference ``enflow/flow/loss.py:5-25``::

    H      = sum_mol sum_{i<j} 4*(1/r12 - 1/r6),  r_sq = |x_i-x_j|^2 + softening
           + 0.5 * sum(vel^2)
    logZ   = -num_atoms * (log(z_lj) - 1.5*log(2*pi/kBT))      # z_lj = 10
    log_px = -H/kBT + logZ + ldj + log_gaussian(h) + log_gaussian(g)
    loss   = -log_px / num_mols

Notes on deliberate parity quirks:
- No periodic wrap in the pairwise distances (the reference uses raw
  positions, loss.py:14).
- ``log_gaussian`` adds a single ``log(2*pi)`` per *call* on the whole
  batched tensor (reference helpers.py:4-5), not per dimension.
- The reference excludes pairs with exactly zero distance
  (``dist_sq[dist_sq != 0]``, loss.py:15); here padded atoms are excluded by
  mask and coincident real atoms keep the same exclusion.

TPU-native redesign: the per-molecule Python loop (reference loss.py:13) and
upper-triangular indexing become one masked ``[B, N, N]`` computation —
``vmap``-free dense batched math XLA fuses into a handful of kernels.
"""

import math

import jax
import jax.numpy as jnp

from ..data.system import System
from ..utils.helpers import LOG_2PI


def lj_potential(pos, mask, softening):
    """Batched softened LJ energy, ``[B]`` per molecule.

    ``sum_{i<j} 4*((r^2+s)^-6 - (r^2+s)^-3)`` over real, non-coincident pairs
    (reference loss.py:11-19).
    """
    B, N = mask.shape
    diff = pos[:, :, None, :] - pos[:, None, :, :]
    d2 = (diff * diff).sum(-1)                                   # [B,N,N]
    iu = jnp.triu(jnp.ones((N, N), dtype=bool), k=1)
    valid = iu[None] & mask[:, :, None] & mask[:, None, :] & (d2 != 0.0)
    r_sq = jnp.where(valid, d2 + softening, 1.0)
    r_6 = r_sq * r_sq * r_sq
    r_12 = r_6 * r_6
    e = 4.0 * (1.0 / r_12 - 1.0 / r_6)
    return jnp.where(valid, e, 0.0).sum(axis=(1, 2))


def alchemical_log_px(out: System, ldj, kBT, softening, partition_func=10.0,
                      axis_name=None, pair_impl="dense"):
    """Per-molecule latent log density ``[B]`` under the LJ-fluid base.

    ``ldj`` is the per-molecule log-det vector from ``flow.forward``. The
    reference computes one batch scalar with a single global ``log(2*pi)``
    from each ``log_gaussian`` call (helpers.py:4-5); per molecule we charge
    that constant once per call per molecule — ``alchemical_nll`` subtracts
    the difference so the batch scalar keeps bitwise formula parity.

    Samplers (SMC/AIS) use this as the flow-proposal log density: for
    ``x -> forward -> (out, ldj)``, ``log q(x) = alchemical_log_px(out, ldj)``.

    ``axis_name`` (inside shard_map, atoms sharded): per-shard partial sums
    are psummed — the pairwise term goes blockwise around the ICI ring
    (``parallel/pairwise.py:ring_alchemical_lj``) instead of materializing
    the dense ``[B, N, N]`` matrix on one device.

    ``pair_impl='pallas'`` (single-device large-N): the blockwise Pallas
    kernel (``ops/pairwise_kernel.py``) — O(N) memory instead of O(N^2),
    analytic custom-VJP gradient.
    """
    am = out.mask[..., None]

    def _asum(x):   # per-molecule sum over (local) atoms
        s = x.sum(axis=(1, 2))
        return jax.lax.psum(s, axis_name) if axis_name else s

    if axis_name:
        from ..parallel.pairwise import ring_alchemical_lj
        H = ring_alchemical_lj(out.pos, out.mask, softening, axis_name)
        n_atoms = jax.lax.psum(out.mask.sum(axis=1), axis_name)
    else:
        if pair_impl == "pallas":
            from ..ops.pairwise_kernel import pallas_lj_potential
            H = pallas_lj_potential(out.pos, out.mask, softening)    # [B]
        else:
            H = lj_potential(out.pos, out.mask, softening)           # [B]
        n_atoms = out.mask.sum(axis=1)
    H = H + 0.5 * _asum(jnp.where(am, out.vel * out.vel, 0.0))
    n_atoms = n_atoms.astype(out.pos.dtype)                          # [B]
    logZ = -n_atoms * (math.log(partition_func)
                       - 1.5 * jnp.log(2.0 * jnp.pi / kBT))
    log_gh = -0.5 * (_asum(jnp.where(am, out.h * out.h, 0.0)) + LOG_2PI)
    log_gg = -0.5 * (_asum(jnp.where(am, out.g * out.g, 0.0)) + LOG_2PI)
    return -H / kBT + logZ + ldj + log_gh + log_gg


def alchemical_nll(out: System, ldj, kBT, softening, partition_func=10.0,
                   num_log_gaussian_calls=3, axis_name=None,
                   pair_impl="dense"):
    """Scalar NLL for a batched flow output (reference loss.py:21-25).

    Exactly the reference value: the per-molecule terms are summed over real
    molecules and the ``log(2*pi)``-per-``log_gaussian``-call constant is
    re-globalized — the reference charges it once per *batch* per call
    (helpers.py:4-5) while the per-molecule helper charges it once per
    molecule. ``num_log_gaussian_calls`` is 3 for the ArgMax dequantizer
    (its log_q + the loss's h and g terms) and 2 for Floor (no Gaussian in
    its log_q).
    """
    real = out.mask.any(axis=1)
    if axis_name:
        real = jax.lax.psum(real.astype(jnp.int32), axis_name) > 0
    per_mol = alchemical_log_px(out, ldj, kBT, softening, partition_func,
                                axis_name=axis_name, pair_impl=pair_impl)
    num_mols = real.sum().astype(out.pos.dtype)
    log_px = (jnp.where(real, per_mol, 0.0).sum()
              + 0.5 * num_log_gaussian_calls * LOG_2PI * (num_mols - 1.0))
    return -log_px / num_mols
