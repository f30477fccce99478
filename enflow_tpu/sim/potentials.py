"""Pairwise potential-energy functions (JAX, reduced units).

TPU-native replacement for the force kernels the reference delegates to
OpenMM's C++/CUDA engine:

- ``softened_lj_energy`` reproduces the reference's
  ``CustomNonbondedForce`` expression (reference ``enflow/data/lj.py:65-76``)::

      4*eps*((sigma/(scale*sigma + r))^12 - (sigma/(scale*sigma + r))^6)

  in reduced units (sigma = eps = 1): ``4*((1/(s+r))^12 - (1/(s+r))^6)`` with
  ``r`` the min-image distance, cutoff-periodic like
  ``CustomNonbondedForce.CutoffPeriodic`` (lj.py:78-79).

- ``lj_energy`` is the plain LJ potential (no softening / no PBC option) used
  by sampler targets (LJ13/LJ55 clusters).

All energies are per-system scalars over ``[N, 3]`` positions; forces come
from ``jax.grad``. Batched variants via ``jax.vmap``.
"""

import jax
import jax.numpy as jnp

from ..utils.helpers import min_image


def _upper_pairs_r(pos, box=None):
    """Squared min-image pair distances with an i<j validity mask."""
    n = pos.shape[0]
    diff = pos[:, None, :] - pos[None, :, :]
    if box is not None:
        diff = min_image(diff, box)
    d2 = (diff * diff).sum(-1)
    iu = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
    return d2, iu


def softened_lj_energy(pos, box, softening, cutoff, mask=None):
    """Softened LJ energy with periodic cutoff (reduced units).

    Args:
      pos: ``[N, 3]``.
      box: ``[3]`` periodic box lengths.
      softening: the ``scale`` global parameter (reference lj.py:70,75).
      cutoff: cutoff radius in reduced units (reference uses
        ``cutoff*sigma``, lj.py:79; sigma = 1 here).
      mask: optional ``[N]`` real-atom mask.
    """
    d2, valid = _upper_pairs_r(pos, box)
    if mask is not None:
        valid = valid & mask[:, None] & mask[None, :]
    valid = valid & (d2 < cutoff * cutoff)
    r = jnp.sqrt(jnp.where(valid, d2, 1.0))
    inv = 1.0 / (softening + r)
    inv6 = inv**6
    e = 4.0 * (inv6 * inv6 - inv6)
    return jnp.where(valid, e, 0.0).sum()


def lj_energy(pos, mask=None, epsilon=1.0, sigma=1.0):
    """Plain (unsoftened, non-periodic) LJ cluster energy in reduced units."""
    d2, valid = _upper_pairs_r(pos)
    if mask is not None:
        valid = valid & mask[:, None] & mask[None, :]
    inv2 = jnp.where(valid, (sigma * sigma) / jnp.where(valid, d2, 1.0), 0.0)
    inv6 = inv2 * inv2 * inv2
    e = 4.0 * epsilon * (inv6 * inv6 - inv6)
    return jnp.where(valid, e, 0.0).sum()


def force_fn(energy_fn):
    """F = -dE/dpos for any scalar energy function of positions."""
    grad = jax.grad(energy_fn)

    def force(pos, *args, **kwargs):
        return -grad(pos, *args, **kwargs)

    return force
