"""Device-side cell-list neighbor construction (static shapes, jit-safe).

The O(N^2) wall: both the reference's 27-image edge list (reference
``enflow/data/base.py:122-144``) and our dense/top-k builders
(``data/neighbors.py``) evaluate all N^2 pair distances per flow step. A
cell list bins atoms into a grid of cells of side >= r_cut, so each atom
only tests candidates from its 27 neighboring cells — O(N * 27 * C) with C
the per-cell capacity. This is the standard MD decomposition (the reference
delegates it to OpenMM's ``CutoffPeriodic``; here it runs on-device under
jit with every shape static).

Static parameters (per config, from the YAML ``dynamics`` section):
  - ``cells_per_dim`` m: the box is split into m^3 cells. Correctness needs
    ``box/m >= r_cut`` (every in-cutoff pair lies in adjacent cells) — use
    ``suggest_cells_per_dim``.
  - ``cell_capacity`` C: max atoms per cell. Overflowing atoms are dropped
    from the candidate table — validate with :func:`cell_overflow` (same
    contract as ``neighbors.neighbor_overflow`` for top-k capacity).

Output is the same fixed-capacity ``Neighbors(idx, mask)`` the EGCL
consumes, selected by ``lax.top_k`` over the 27C candidates — bitwise the
same neighbor *set* as the dense builder whenever nothing overflows.

Measured reality (v5e, f32, reduced density 0.3, r_cut 3): TPU gathers are
expensive, so the dense/top-k builder stays faster while 27C is within ~an
order of magnitude of N — N=2944 (the generate.yaml scale): top-k 5 ms vs
cell 102 ms; N=8192: 52 vs 70 ms; the cell list takes over at large N —
N=32768: top-k 1196 ms vs cell 317 ms (3.8x). Rule of thumb: keep the
default top-k below ~10^4 atoms, switch ``nbr_mode: cell`` above.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .neighbors import Neighbors
from ..utils.helpers import min_image


def suggest_cells_per_dim(box, r_cut, max_cells: int = 32) -> int:
    """Largest m with box/m >= r_cut (host-side helper; box in reduced
    units). m=1 degenerates to all-pairs-in-one-cell."""
    m = int(np.floor(np.min(np.asarray(box)) / float(r_cut)))
    return max(1, min(m, max_cells))


# the 27 neighboring-cell offsets, a static [27, 3] table
_OFFSETS = np.array([[i, j, k]
                     for i in (-1, 0, 1)
                     for j in (-1, 0, 1)
                     for k in (-1, 0, 1)], dtype=np.int32)


def _cell_ids(pos, box, m):
    """``[N]`` flat cell index per atom (positions wrapped into [0, box))."""
    frac = pos / box + 0.5                    # [-box/2, box/2) -> [0, 1)
    frac = frac - jnp.floor(frac)             # robust wrap for outliers
    ijk = jnp.clip((frac * m).astype(jnp.int32), 0, m - 1)   # [N, 3]
    return (ijk[:, 0] * m + ijk[:, 1]) * m + ijk[:, 2], ijk


def _build_cell_table(cell_id, mask, m, cap):
    """``[m^3, cap]`` atom indices per cell (N entries scattered by rank
    within cell); overflow beyond ``cap`` is dropped. Padded atoms land in a
    virtual overflow bucket."""
    n = cell_id.shape[0]
    n_cells = m * m * m
    cid = jnp.where(mask, cell_id, n_cells)          # padded -> overflow row
    order = jnp.argsort(cid)                         # stable
    sorted_cid = cid[order]
    # rank of each sorted atom within its cell
    first = jnp.searchsorted(sorted_cid, jnp.arange(n_cells + 1))
    rank = jnp.arange(n) - first[jnp.clip(sorted_cid, 0, n_cells)]
    table = jnp.full((n_cells + 1, cap), n, jnp.int32)   # n == "no atom"
    ok = rank < cap
    table = table.at[jnp.where(ok, sorted_cid, n_cells),
                     jnp.where(ok, rank, cap - 1)].set(
        jnp.where(ok, order.astype(jnp.int32), n), mode="drop")
    # real atoms dropped from over-full cells (their edges silently vanish
    # from every candidate list) — one masked reduce for the overflow counter
    dropped = (~ok & (sorted_cid < n_cells)).sum()
    return table[:n_cells], dropped


def _neighbors_one_cell(pos, box, mask, r_cut, m, cap, capacity):
    """Cell-list neighbor build for one molecule ([N,3] pos)."""
    n = pos.shape[0]
    cell_id, ijk = _cell_ids(pos, box, m)
    table, dropped = _build_cell_table(cell_id, mask, m, cap)

    # candidate atoms: the 27 neighbor cells' tables -> [N, 27*cap].
    # For m <= 2 the periodic wrap makes some of the 27 offsets hit the same
    # cell; keep each distinct cell once (27x27 static compare) so no
    # candidate (hence no edge) is duplicated.
    nbr_ijk = (ijk[:, None, :] + _OFFSETS[None]) % m          # [N, 27, 3]
    nbr_cell = (nbr_ijk[..., 0] * m + nbr_ijk[..., 1]) * m + nbr_ijk[..., 2]
    earlier = np.tril(np.ones((27, 27), dtype=bool), k=-1)
    dup_cell = ((nbr_cell[:, :, None] == nbr_cell[:, None, :])
                & earlier[None]).any(-1)                      # [N, 27]
    cand = table[nbr_cell]                                    # [N, 27, cap]
    cand_valid = (cand < n) & ~dup_cell[..., None]
    cand = cand.reshape(n, 27 * cap)
    cand_valid = cand_valid.reshape(n, 27 * cap)
    cand_safe = jnp.where(cand_valid, cand, 0)

    diff = pos[:, None, :] - pos[cand_safe]                   # [N, 27C, 3]
    diff = min_image(diff, box)
    d2 = (diff * diff).sum(-1)
    valid = (cand_valid
             & mask[:, None]
             & mask[cand_safe]
             & (cand_safe != jnp.arange(n)[:, None])
             & (d2 < r_cut * r_cut))
    score = jnp.where(valid, -d2, -jnp.inf)
    top, idx_c = jax.lax.top_k(score, capacity)               # [N, K]
    idx = jnp.take_along_axis(cand_safe, idx_c, axis=1)
    # truncation counter: per-atom in-cutoff candidates beyond the top-k
    # capacity, plus atoms dropped from over-full cells (see
    # _build_cell_table)
    excess = jnp.maximum(valid.sum(axis=-1) - capacity, 0).sum()
    return idx.astype(jnp.int32), top > -jnp.inf, excess + dropped


def cell_neighbor_list(pos, box, mask, r_cut, capacity: int,
                       cells_per_dim: int, cell_capacity: int,
                       with_overflow: bool = False):
    """Batched cell-list neighbor build (same interface as
    ``neighbors.neighbor_list`` with top-k capacity).

    Args:
      pos/box/mask/r_cut: ``[B,N,3] / [B,3] / [B,N] / [B]``.
      capacity: neighbor slots per atom (K).
      cells_per_dim: static grid size m (``box/m >= r_cut`` required).
      cell_capacity: static per-cell atom capacity C.
      with_overflow: also return a scalar int32 truncation counter (dropped
        in-cutoff slots + atoms dropped from over-full cells).
    """
    f = jax.vmap(_neighbors_one_cell, in_axes=(0, 0, 0, 0, None, None, None))
    idx, msk, ovf = f(pos, box, mask, r_cut, cells_per_dim, cell_capacity,
                      capacity)
    nbrs = Neighbors(idx=idx, mask=msk)
    if with_overflow:
        return nbrs, ovf.sum().astype(jnp.int32)
    return nbrs


def cell_overflow(pos, box, mask, r_cut, cells_per_dim: int,
                  cell_capacity: int):
    """Diagnostic: True if any cell holds more than ``cell_capacity`` real
    atoms (candidates beyond capacity are silently dropped)."""
    def one(p, b, msk):
        cid, _ = _cell_ids(p, b, cells_per_dim)
        n_cells = cells_per_dim ** 3
        counts = jnp.zeros((n_cells,), jnp.int32).at[cid].add(
            msk.astype(jnp.int32))
        return (counts > cell_capacity).any()

    return jax.vmap(one)(pos, box, mask).any()


def max_cell_occupancy(pos, box, mask, cells_per_dim: int):
    """Scalar int: the most real atoms any single cell holds in the batch.

    Loud counterpart of :func:`cell_overflow` for the driver's one-time
    dataset capacity validation (train/driver.py ``_validate_capacities``)."""
    def one(p, b, msk):
        cid, _ = _cell_ids(p, b, cells_per_dim)
        n_cells = cells_per_dim ** 3
        counts = jnp.zeros((n_cells,), jnp.int32).at[cid].add(
            msk.astype(jnp.int32))
        return counts.max()

    return jax.vmap(one)(pos, box, mask).max()
