"""Ring EGCL: atom-axis-sharded E(n)-equivariant message passing.

The ring-attention analogue for the flow itself (SURVEY §5 long-context
plan). The dense EGCL materializes ``[B, N, K, hidden]`` edge tensors on one
device (``enflow_tpu/nn/egcl.py``); for large systems the atom axis is
sharded over the mesh instead and each device holds only its ``[B, N/P]``
block of atoms. Neighbor blocks ``(h, pos, mask)`` rotate around the ICI
ring with ``lax.ppermute`` while each device accumulates its atoms' message
aggregate, gated-displacement sum, and neighbor count — O(N^2/P) compute and
O((N/P)^2 * hidden) peak memory per device, bandwidth overlapped by XLA.

The per-block math is ``nn.egcl.edge_messages`` / ``node_outputs`` — the
exact same functions the dense path uses — so sharded and single-device
results agree to float tolerance (pinned by ``tests/test_sharded_flow.py``).

Supports ``nbr_mode`` 'dense' (min-image + r_cut test, reference
``data/base.py:122-144`` semantics) and 'all_pairs' (cluster targets, no
distance test). Fixed-capacity top-k lists don't shard this way (a top-k
over the atom axis is a global op) — large-N sharded runs use the modes
whose edge set is defined blockwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.egcl import EGCLConfig, edge_messages, node_outputs
from ..utils.helpers import min_image


def ring_egcl(params, cfg: EGCLConfig, h_blk, pos_blk, mask_blk, box, r_cut,
              axis_name: str, nbr_mode: str = "dense"):
    """One EGCL evaluation with atoms sharded over ``axis_name``.

    Args (per-shard blocks, ``n_blk = N / n_devices``):
      h_blk:    ``[B, n_blk, nf]`` local node features.
      pos_blk:  ``[B, n_blk, 3]`` local positions.
      mask_blk: ``[B, n_blk]`` local real-atom mask.
      box:      ``[B, 3]`` (replicated).
      r_cut:    ``[B]`` (replicated).

    Returns local ``(Q [B,n_blk,1], F [B,n_blk,3], G [B,n_blk,nf])`` —
    identical to the corresponding rows of the dense ``apply_egcl``.
    """
    in_dtype = h_blk.dtype
    if cfg.compute_dtype is not None:
        cdt = jnp.dtype(cfg.compute_dtype)
        params = jax.tree_util.tree_map(lambda x: x.astype(cdt), params)
        h_blk = h_blk.astype(cdt)
        pos_blk = pos_blk.astype(cdt)

    n_dev = jax.lax.psum(1, axis_name)
    B, n_blk, _ = h_blk.shape
    eye = jnp.eye(n_blk, dtype=bool)[None]                       # [1,blk,blk]
    box_b = box[:, None, None, :].astype(pos_blk.dtype)
    r2_cut = (r_cut * r_cut)[:, None, None].astype(pos_blk.dtype)

    def block(s, h_j, pos_j, mask_j):
        """Messages from the rotating block (originating shard my+s)."""
        diff = pos_blk[:, :, None, :] - pos_j[:, None, :, :]     # [B,bi,bj,3]
        diff = min_image(diff, box_b)
        valid = mask_blk[:, :, None] & mask_j[:, None, :]
        if nbr_mode == "dense":
            d2 = (diff * diff).sum(-1)
            valid = valid & (d2 < r2_cut)
        # self-pairs exist only on the s == 0 diagonal
        valid = valid & ~(jnp.where(s == 0, eye, jnp.zeros_like(eye)))
        diff = jnp.where(valid[..., None], diff, 0.0)
        m, trans = edge_messages(params, cfg, h_blk, h_j[:, None],
                                 diff, valid)
        return (m.sum(axis=2), trans.sum(axis=2),
                valid.sum(axis=2).astype(jnp.int32))

    perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def step(s, carry):
        agg, f_sum, count, h_j, pos_j, mask_j = carry
        a, f, c = block(s, h_j, pos_j, mask_j)
        h_j = jax.lax.ppermute(h_j, axis_name, perm)
        pos_j = jax.lax.ppermute(pos_j, axis_name, perm)
        mask_j = jax.lax.ppermute(mask_j, axis_name, perm)
        return (agg + a, f_sum + f, count + c, h_j, pos_j, mask_j)

    # zero carries derived from the inputs so their varying-axes types match
    # the loop outputs on any mesh (e.g. ("data", "atom") — inputs vary over
    # both, and a bare jnp.zeros would vary over neither)
    agg0 = jnp.zeros((B, n_blk, cfg.hidden_nf), h_blk.dtype) + 0.0 * h_blk[..., :1]
    f0 = 0.0 * pos_blk
    c0 = jnp.zeros((B, n_blk), jnp.int32) + 0 * mask_blk.astype(jnp.int32)
    agg, f_sum, count, _, _, _ = jax.lax.fori_loop(
        0, n_dev, step, (agg0, f0, c0, h_blk, pos_blk, mask_blk))

    Q, F, G = node_outputs(params, cfg, h_blk, agg, f_sum,
                           count[..., None], mask_blk)
    if cfg.compute_dtype is not None:
        Q, F, G = (Q.astype(in_dtype), F.astype(in_dtype), G.astype(in_dtype))
    return Q, F, G
