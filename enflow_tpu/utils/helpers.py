"""Core tensor helpers (JAX), parity with reference ``enflow/utils/helpers.py``.

All functions are pure, jit-safe, and mask-aware (the TPU-native design pads
molecules to a static max atom count; a boolean mask marks real atoms).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from .constants import ELEMENTS

LOG_2PI = math.log(2.0 * math.pi)


def log_gaussian(z, mask=None):
    """Unnormalized standard-normal log density, reference parity.

    Reference ``helpers.py:4-5``: ``-0.5*((z**2).sum() + log(2*pi))`` — note the
    ``log(2*pi)`` is added ONCE per call, not once per dimension. That quirk is
    preserved deliberately: the Alchemical NLL (reference ``flow/loss.py:24``)
    and ArgMax dequantizer (reference ``nn/argmax.py:19``) consume exactly this
    convention, and NLL parity requires it.

    Args:
      z: array of any shape.
      mask: optional boolean array broadcastable against ``z`` selecting real
        (non-padded) entries.
    """
    sq = z * z
    if mask is not None:
        sq = jnp.where(mask, sq, 0.0)
    return -0.5 * (sq.sum() + LOG_2PI)


def log_gaussian_per_mol(z, atom_mask):
    """Per-molecule reference-convention Gaussian log density.

    ``z`` is ``[B, N, D]``, ``atom_mask`` is ``[B, N]``. Returns ``[B]`` with the
    single ``log(2*pi)`` constant charged once per molecule (matching what the
    reference computes when called on a single molecule's tensor).
    """
    sq = jnp.where(atom_mask[..., None], z * z, 0.0)
    return -0.5 * (sq.sum(axis=(-1, -2)) + LOG_2PI)


def apply_pbc(pos, box):
    """Wrap positions (or displacements) into ``[-box/2, box/2)``.

    Reference ``helpers.py:7-8``: ``pos - (pos/box).round()*box``. ``box``
    broadcasts against the last axis of ``pos``.
    """
    return pos - jnp.round(pos / box) * box


def min_image(diff, box):
    """Minimum-image convention for displacement vectors.

    This is the physically correct min-image wrap ``diff - round(diff/box)*box``.
    Note: the reference wraps edge displacements with *half* the box
    (``enflow/data/base.py:17``: ``apply_pbc(coord_diff, self.box*0.5)``), which
    is not the minimum-image convention; we use the correct full-box form by
    default (documented deviation).
    """
    return diff - jnp.round(diff / box) * box


def get_box_len(pos):
    """Infer an integer box length from position extent (reference helpers.py:10-13)."""
    return jnp.round(pos.max(axis=0) - pos.min(axis=0))


def get_box_len_np(pos):
    """Host-side (NumPy) twin of :func:`get_box_len` for dataset code."""
    return np.round(np.asarray(pos).max(axis=0) - np.asarray(pos).min(axis=0))


def one_hot(index, num_classes, dtype=jnp.float32):
    """One-hot encoding (reference helpers.py:43-52)."""
    return jax.nn.one_hot(index, num_classes, dtype=dtype)


def unsorted_segment_sum(data, segment_ids, num_segments):
    """Scatter-sum rows of ``data`` by ``segment_ids`` (reference helpers.py:54-60).

    Provided for edge-list-style code paths; the dense EGCL uses masked
    reductions instead (better on TPU).
    """
    return jax.ops.segment_sum(data, segment_ids, num_segments)


def unsorted_segment_mean(data, segment_ids, num_segments):
    """Scatter-mean with count clamped to >=1 (reference helpers.py:63-70)."""
    total = jax.ops.segment_sum(data, segment_ids, num_segments)
    count = jax.ops.segment_sum(jnp.ones_like(data), segment_ids, num_segments)
    return total / jnp.clip(count, 1, None)


def get_element(elem, mass):
    """Guess an element symbol from its mass when the symbol is absent.

    Reference ``helpers.py:31-41`` (which references an undefined ``ELEMENTS``
    global — fixed here). Host-side helper; not jittable.
    """
    if elem == '':
        mass_int = int(round(float(mass)))
        if mass_int == 1:
            return 'H'
        if 1 < mass_int < 36:
            return ELEMENTS[mass_int // 2]
        raise ValueError(f"cannot guess element from mass {mass}")
    return elem


def masked_mean(x, mask, axis=None):
    """Mean of ``x`` over entries where ``mask`` is True."""
    num = jnp.where(mask, x, 0.0).sum(axis=axis)
    den = jnp.clip(mask.astype(x.dtype).sum(axis=axis), 1, None)
    return num / den
