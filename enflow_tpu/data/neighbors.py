"""Static-shape neighbor lists for periodic molecular systems.

TPU-native replacement for the reference's dynamic 27-periodic-image edge list
(reference ``enflow/data/base.py:122-144`` + ``enflow/utils/helpers.py:15-29``),
which materializes a dense ``[~27N, N]`` distance matrix per molecule and emits a
data-dependent number of edges — impossible under ``jit`` and hostile to XLA.

Design here:
- Displacements use the **minimum-image convention** directly (no image
  replication): for ``box >= 2*r_cut`` this yields exactly the reference's edge
  set. (The reference additionally wraps its edge displacements by *half* the
  box, ``base.py:17`` — a bug we do not reproduce; see
  ``utils.helpers.min_image``.)
- Two static-shape formats:
  1. **Dense all-pairs** (``K == N``): a ``[B, N, N]`` boolean adjacency — best
     for small molecules (training batches), where the mask costs nothing and
     every reduction is a dense masked sum the MXU/VPU love.
  2. **Fixed-capacity top-K** (``K < N``): per-atom padded neighbor arrays
     ``idx/mask [B, N, K]`` selected by ``lax.top_k`` on negative squared
     distance — for large systems (e.g. the 2,944-atom LJ generate config,
     reference ``example/generate.yaml:8``), where ``K ~ O(neighbors within
     r_cut)`` bounds memory at ``O(N*K)``.

Both formats present the same ``Neighbors(idx, mask)`` interface consumed by the
EGCL (``enflow_tpu/nn/egcl.py``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.helpers import min_image


class Neighbors(NamedTuple):
    """Fixed-capacity neighbor structure.

    idx:  ``[B, N, K]`` int32 — neighbor atom indices (within the molecule).
    mask: ``[B, N, K]`` bool — True for valid (real, within-cutoff) neighbors.
    """

    idx: jax.Array
    mask: jax.Array

    @property
    def capacity(self) -> int:
        return self.idx.shape[-1]


def _pair_dist_sq(pos, box):
    """``[N, N]`` min-image squared distances and ``[N, N, 3]`` displacements."""
    diff = pos[:, None, :] - pos[None, :, :]
    diff = min_image(diff, box)
    return (diff * diff).sum(-1), diff


def _valid_pairs(pos, box, mask, r_cut):
    """``[N, N]`` bool: j is a neighbor of i (i real, j real, i != j, within cutoff)."""
    n = pos.shape[0]
    d2, _ = _pair_dist_sq(pos, box)
    eye = jnp.eye(n, dtype=bool)
    return (
        mask[:, None]
        & mask[None, :]
        & ~eye
        & (d2 < r_cut * r_cut)
    ), d2


def _neighbors_one_dense(pos, box, mask, r_cut):
    n = pos.shape[0]
    valid, _ = _valid_pairs(pos, box, mask, r_cut)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (n, n))
    return idx, valid


def _neighbors_one_topk(pos, box, mask, r_cut, capacity):
    valid, d2 = _valid_pairs(pos, box, mask, r_cut)
    score = jnp.where(valid, -d2, -jnp.inf)
    top, idx = jax.lax.top_k(score, capacity)
    # dropped in-cutoff slots (one masked reduce; ~free next to the top_k)
    excess = jnp.maximum(valid.sum(axis=-1) - capacity, 0).sum()
    return idx.astype(jnp.int32), top > -jnp.inf, excess


def neighbor_list(pos, box, mask, r_cut, capacity: int | None = None) -> Neighbors:
    """Build a static-shape neighbor list for a batch of molecules.

    Args:
      pos:   ``[B, N, 3]`` positions.
      box:   ``[B, 3]`` box lengths.
      mask:  ``[B, N]`` real-atom mask.
      r_cut: ``[B]`` per-molecule cutoffs.
      capacity: max neighbors per atom (static). ``None`` or ``>= N`` selects
        the dense all-pairs format.

    Returns:
      ``Neighbors`` with ``idx``/``mask`` of shape ``[B, N, K]``.
    """
    n = pos.shape[1]
    if capacity is None or capacity >= n:
        idx, m = jax.vmap(_neighbors_one_dense)(pos, box, mask, r_cut)
    else:
        idx, m, _ = jax.vmap(_neighbors_one_topk, in_axes=(0, 0, 0, 0, None))(
            pos, box, mask, r_cut, capacity
        )
    return Neighbors(idx=idx, mask=m)


def neighbor_overflow(pos, box, mask, r_cut, capacity: int):
    """Diagnostic: True if any atom has more than ``capacity`` in-cutoff neighbors.

    The fixed-capacity format silently truncates beyond ``capacity``; call this
    (e.g. under a debug flag / checkify) to validate a chosen capacity.
    """
    valid, _ = jax.vmap(_valid_pairs)(pos, box, mask, r_cut)
    return (valid.sum(axis=-1) > capacity).any()


def max_neighbor_count(pos, box, mask, r_cut):
    """Scalar int: the largest per-atom in-cutoff neighbor count in the batch.

    The loud production counterpart of :func:`neighbor_overflow`: the driver
    runs this once over every dataset batch at setup (train/driver.py
    ``_validate_capacities``) so a too-small ``nbr_capacity`` raises with the
    needed value instead of silently dropping edges.
    """
    valid, _ = jax.vmap(_valid_pairs)(pos, box, mask, r_cut)
    return valid.sum(axis=-1).max()


# 27 periodic-image offsets in {-1, 0, 1}^3 (own cell included).
# Host-side numpy constant: a module-level jnp.array would initialize the
# XLA backend at import time, which breaks jax.distributed.initialize()
# in multi-host workers (import enflow_tpu must stay backend-free).
_IMAGE_OFFSETS = np.array(
    [[a, b, c] for a in (-1, 0, 1) for b in (-1, 0, 1) for c in (-1, 0, 1)],
    dtype=np.int32)


def _neighbors_one_images(pos, box, mask, r_cut, capacity):
    """Per-molecule (neighbor, image) slots with per-image displacements.

    Emits one slot per in-cutoff *periodic image* of each neighbor — the
    reference's multi-image edge multiplicity (``data/base.py:122-144``):
    when ``box < 2*r_cut`` a pair (i, j) can be within cutoff through more
    than one boundary, and each such image is a distinct edge. Unlike the
    reference, each slot carries its own image displacement (the reference
    recomputes one shared displacement per pair with a half-box wrap,
    ``base.py:17`` — a documented bug) and no ellipse pre-prune is applied
    (the reference's ``helpers.py:15-29`` prune can drop in-cutoff corner
    images: at the train.yaml geometry box=17, r_cut=10.2 the corner of the
    wrapped box lies outside the ellipse). Self-image pairs (i with its own
    periodic image) are excluded, matching the reference's ``row != col``
    filter. Coverage is the same 27 images as the reference — complete for
    ``r_cut <= box``.

    Returns ``(idx [N,K], valid [N,K], diff [N,K,3])``.
    """
    n = pos.shape[0]
    diff0 = pos[:, None, :] - pos[None, :, :]               # [N, N, 3]
    offs = _IMAGE_OFFSETS.astype(pos.dtype) * box           # [27, 3]
    d = diff0[None, :, :, :] + offs[:, None, None, :]       # [27, N, N, 3]
    d2 = (d * d).sum(-1)                                    # [27, N, N]
    eye = jnp.eye(n, dtype=bool)
    valid = (mask[None, :, None] & mask[None, None, :]
             & ~eye[None] & (d2 < r_cut * r_cut))
    # pack per atom i over the flattened (image, j) axis
    score = jnp.where(valid, -d2, -jnp.inf)                 # [27, N, N]
    score = score.transpose(1, 0, 2).reshape(n, 27 * n)     # [N, 27N]
    top, flat = jax.lax.top_k(score, capacity)              # [N, K]
    j = (flat % n).astype(jnp.int32)
    slot_ok = top > -jnp.inf
    d_rows = d.transpose(1, 0, 2, 3).reshape(n, 27 * n, 3)  # [N, 27N, 3]
    diff = jnp.take_along_axis(d_rows, flat[..., None], axis=1)
    excess = jnp.maximum(valid.sum(axis=(0, 2)) - capacity, 0).sum()
    return j, slot_ok, jnp.where(slot_ok[..., None], diff, 0.0), excess


def image_neighbor_list(pos, box, mask, r_cut, capacity: int):
    """Batched multi-image neighbor list (``nbr_mode: images``).

    Static-shape TPU replacement for the reference's 27-image edge builder
    in its *divergent* regime ``box < 2*r_cut`` where min-image lists keep
    at most one edge per pair but the reference emits one per in-cutoff
    image. For ``box >= 2*r_cut`` only the minimum image can be within
    cutoff, so this reduces exactly to :func:`neighbor_list`'s edge set.

    ``capacity`` counts (neighbor, image) slots per atom. Cost is an
    ``[27, N, N]`` candidate tensor per molecule — intended for
    small-to-medium molecules (training batches), not large fluids.

    Returns ``(Neighbors, diff [B, N, K, 3])`` — displacements are per
    *image* and cannot be recomputed from ``idx`` alone, so this builder
    returns them directly.
    """
    idx, m, diff, _ = jax.vmap(_neighbors_one_images,
                               in_axes=(0, 0, 0, 0, None))(
        pos, box, mask, r_cut, capacity)
    return Neighbors(idx=idx, mask=m), diff


def max_image_neighbor_count(pos, box, mask, r_cut):
    """Scalar int: largest per-atom (neighbor, image) slot count in the
    batch — the capacity validator for ``nbr_mode: images``."""
    def one(p, b, msk, rc):
        n = p.shape[0]
        diff0 = p[:, None, :] - p[None, :, :]
        offs = _IMAGE_OFFSETS.astype(p.dtype) * b
        d2 = ((diff0[None] + offs[:, None, None, :]) ** 2).sum(-1)
        eye = jnp.eye(n, dtype=bool)
        valid = (msk[None, :, None] & msk[None, None, :]
                 & ~eye[None] & (d2 < rc * rc))
        return valid.sum(axis=(0, 2)).max()

    return jax.vmap(one)(pos, box, mask, r_cut).max()


def all_pairs(mask) -> Neighbors:
    """Static all-pairs adjacency: every real atom neighbors every other.

    For cluster targets (huge box, r_cut beyond the system size — the LJ13
    flow-SMC workload) the distance test always passes, so the dense
    neighbor list's min-image + compare pipeline is pure overhead (~40% of a
    flow step at [1024, 13] on v5e). This variant does no arithmetic at all.
    """
    B, N = mask.shape
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, None, :],
                           (B, N, N))
    eye = jnp.eye(N, dtype=bool)
    m = mask[:, :, None] & mask[:, None, :] & ~eye[None]
    return Neighbors(idx=idx, mask=m)


def neighbors_with_diffs(pos, box, mask, r_cut, capacity=None,
                         mode: str = "dense", cells_per_dim=None,
                         cell_capacity=None, with_overflow: bool = False):
    """Build neighbors and min-image displacements with one shared diff
    computation (the split API computes the ``[B,N,K,3]`` diff twice).

    ``mode``: 'dense'/'topk' follow :func:`neighbor_list`; 'all_pairs' skips
    the distance test entirely (see :func:`all_pairs`); 'cell' bins atoms
    into a grid first — O(N * 27C) instead of O(N^2) distance tests
    (``data/celllist.py``; requires ``capacity``, ``cells_per_dim`` and
    ``cell_capacity``); 'images' emits one slot per in-cutoff periodic
    image (required for correctness when ``box < 2*r_cut`` — see
    :func:`image_neighbor_list`; requires ``capacity``).

    ``with_overflow``: also return a scalar int32 counting TRUNCATED slots
    this build dropped (0 for the exact dense/all_pairs formats; for 'cell'
    it adds atoms dropped from over-full cells, whose edges are lost from
    the candidate table). Cost is one masked reduce over quantities the
    build already computes — cheap enough to leave on in production
    (``FlowConfig.track_overflow`` threads it through the flow and the
    driver surfaces it per epoch in the metrics CSV), closing the silent-
    truncation hole the one-time startup validation cannot (positions move
    during flow integration; VERDICT r3 item 5).
    """
    zero = jnp.zeros((), jnp.int32)
    if mode == "images":
        if capacity is None:
            raise ValueError(
                "nbr_mode 'images' needs nbr_capacity ((neighbor, image) "
                "slots per atom; 'auto' works in the driver)")
        idx, m, diff, excess = jax.vmap(
            _neighbors_one_images, in_axes=(0, 0, 0, 0, None))(
            pos, box, mask, r_cut, capacity)
        out = Neighbors(idx=idx, mask=m), diff
        return out + (excess.sum().astype(jnp.int32),) if with_overflow \
            else out
    if mode == "all_pairs":
        nbrs = all_pairs(mask)
        diff = pos[:, :, None, :] - pos[:, None, :, :]
        diff = min_image(diff, box[:, None, None, :])
        out = nbrs, jnp.where(nbrs.mask[..., None], diff, 0.0)
        return out + (zero,) if with_overflow else out
    ovf = zero
    if mode == "cell":
        from .celllist import cell_neighbor_list
        if capacity is None or cells_per_dim is None or cell_capacity is None:
            raise ValueError(
                "nbr_mode 'cell' needs nbr_capacity (per-atom neighbor "
                "slots; 'auto' works), cells_per_dim and cell_capacity "
                "(ints or 'auto' in the dynamics section)")
        nbrs, ovf = cell_neighbor_list(pos, box, mask, r_cut, capacity,
                                       cells_per_dim, cell_capacity,
                                       with_overflow=True)
    else:
        n = pos.shape[1]
        if capacity is None or capacity >= n:
            idx, m = jax.vmap(_neighbors_one_dense)(pos, box, mask, r_cut)
            nbrs = Neighbors(idx=idx, mask=m)
        else:
            idx, m, excess = jax.vmap(
                _neighbors_one_topk, in_axes=(0, 0, 0, 0, None))(
                pos, box, mask, r_cut, capacity)
            nbrs = Neighbors(idx=idx, mask=m)
            ovf = excess.sum().astype(jnp.int32)
    out = nbrs, coord_diffs(pos, box, nbrs)
    return out + (ovf,) if with_overflow else out


def coord_diffs(pos, box, nbrs: Neighbors):
    """Min-image displacement vectors for each (atom, neighbor-slot) pair.

    Returns ``[B, N, K, 3]`` with ``diff[b,i,k] = pos[b,i] - pos[b, idx[b,i,k]]``
    (reference edge convention: ``coord[row] - coord[col]``, ``base.py:16``),
    zeroed on invalid slots.
    """
    nbr_pos = jax.vmap(lambda p, i: p[i])(pos, nbrs.idx)  # [B, N, K, 3]
    diff = pos[:, :, None, :] - nbr_pos
    diff = min_image(diff, box[:, None, None, :])
    return jnp.where(nbrs.mask[..., None], diff, 0.0)
