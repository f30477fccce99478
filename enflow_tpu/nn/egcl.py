"""E(n)-equivariant graph convolutional layer (EGCL), dense/TPU-native.

Semantic parity with reference ``enflow/nn/egcl.py:5-93`` (itself adapted from
Satorras et al.'s E(n)-GNN), returning per flow step:

- ``Q`` ``[B, N, 1]``  — log velocity scale, ``vel_scaling_nn(h)`` (egcl.py:52-55,91)
- ``F`` ``[B, N, 3]``  — equivariant force, scatter-mean of gated coordinate
  differences (egcl.py:32-43,71-75)
- ``G`` ``[B, N, nf]`` — node feature update, scatter-sum message aggregation
  (egcl.py:27-30,65-69)

TPU-first redesign: instead of a ragged edge list with ``scatter_add`` (the
reference's ``unsorted_segment_sum``, helpers.py:54-70), messages live in a
dense fixed-capacity tensor ``[B, N, K, hidden]`` indexed by the static-shape
neighbor list; aggregation is a masked reduction over the K axis — a fused,
layout-friendly pattern XLA maps straight onto the MXU/VPU with no scatters.

Optional flags mirror the reference (all default off, egcl.py:11): ``attention``
(sigmoid edge gating, :46-49,60-62), ``norm_diff`` (normalize coordinate
differences, :82-84), ``tanh`` (bounded coordinate gate with learned range,
:40-42), ``clamp`` semantics (the ±100 force clamp, :73) are always applied as
in the reference default path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .mlp import init_linear, apply_linear, init_mlp, apply_mlp, silu


@dataclasses.dataclass(frozen=True)
class EGCLConfig:
    node_nf: int
    hidden_nf: int
    coords_weight: float = 1.0
    attention: bool = False
    norm_diff: bool = False
    tanh: bool = False
    # Optional reduced-precision compute for the message-passing internals
    # (e.g. 'bfloat16'): halves HBM traffic of the [B,N,K,hidden] edge
    # tensors and doubles MXU rate; outputs are cast back to the input
    # dtype. Flow invertibility is unaffected — forward and reverse evaluate
    # the identical network at identical states, so the values cancel
    # exactly whatever the internal precision.
    compute_dtype: str | None = None
    # Opt-in fused Pallas edge pipelines (both require attention/norm_diff/
    # tanh off; measured analyses in the kernel module docstrings):
    #   True / "v1": ops/edge_kernel.py — fuses the edge MLP + gate +
    #     aggregations from XLA-materialized [A*K, 2nf+1] edge inputs.
    #   "v2": ops/egcl_fused.py — all-pairs only; starts from raw per-atom
    #     state so no [B,N,K,.] tensor ever touches HBM (dispatched by the
    #     flow integrators; requires nbr_mode == 'all_pairs').
    #   "v3": ops/egcl_fused_v3.py — same contract as v2 with the
    #     full-width edge-block design (no per-neighbor unroll).
    use_pallas: bool | str = False

    @property
    def edge_in(self) -> int:
        return 2 * self.node_nf + 1  # [h_i, h_j, |dx|^2] (reference egcl.py:13,18)


def init_egcl(key, cfg: EGCLConfig, dtype=jnp.float32):
    """Initialize one EGCL's parameters as a pytree."""
    keys = jax.random.split(key, 6)
    params = {
        # edge_nn: Linear, SiLU, Linear, SiLU (reference egcl.py:21-25)
        "edge_nn": init_mlp(keys[0], [cfg.edge_in, cfg.hidden_nf, cfg.hidden_nf], dtype),
        # node_nn: Linear, SiLU, Linear (reference egcl.py:27-30)
        "node_nn": init_mlp(keys[1], [cfg.hidden_nf + cfg.node_nf, cfg.hidden_nf,
                                      cfg.node_nf], dtype),
        # coord_nn: Linear, SiLU, Linear(hidden->1, no bias, xavier gain 1e-3)
        # (reference egcl.py:32-43)
        "coord_nn": [
            init_linear(keys[2], cfg.hidden_nf, cfg.hidden_nf, dtype),
            init_linear(keys[3], cfg.hidden_nf, 1, dtype, bias=False,
                        init="xavier_uniform", gain=0.001),
        ],
        # vel_scaling_nn: Linear, SiLU, Linear (reference egcl.py:52-55)
        "vel_scaling_nn": init_mlp(keys[4], [cfg.node_nf, cfg.hidden_nf, 1], dtype),
    }
    if cfg.attention:
        params["att_nn"] = init_linear(keys[5], cfg.hidden_nf, 1, dtype)
    if cfg.tanh:
        params["coords_range"] = 3.0 * jnp.ones((1,), dtype)
    return params


def edge_messages(params, cfg: EGCLConfig, h_i, h_j, coord_diff, valid):
    """Block-pair edge pipeline shared by the dense and ring paths.

    ``h_i [..., I, nf]`` query features, ``h_j [..., I|1, J, nf]`` neighbor
    features (a broadcastable ``I=1`` axis is the all-pairs fast path),
    ``coord_diff [..., I, J, 3]`` displacements ``x_i - x_j``,
    ``valid [..., I, J]`` edge mask. Returns the masked per-edge message
    ``m [..., I, J, hidden]`` (reference egcl.py:57-63) and the clipped gated
    displacement ``trans [..., I, J, 3]`` (egcl.py:71-73) — callers aggregate
    over J (and, for the ring path, accumulate across rotations).

    (A split evaluation of the first layer — node-level ``h_i @ W1_i`` /
    ``h_j @ W1_j`` projections broadcast-added with the rank-1 ``r^2 * w1_r``
    term instead of the K=2*nf+1 concat matmul — was measured TWICE on v5e
    at the bench workload and lost both times: 21% slower pre-remat (extra
    materialized [.., I, J, hidden] pre-activation, HBM-bound regime) and
    3% slower post-remat (6073 -> 5879 samples/s; XLA fuses the narrow
    concat into the dot well enough that the saved K=11 MXU pass doesn't
    pay for the broadcast-add). Keep the concat form.)
    """
    radial = (coord_diff * coord_diff).sum(-1, keepdims=True)
    if cfg.norm_diff:
        coord_diff = coord_diff / (jnp.sqrt(radial) + 1.0)
    full = jnp.broadcast_to(h_j, radial.shape[:-1] + (h_j.shape[-1],))
    h_i = jnp.broadcast_to(h_i[..., :, None, :], full.shape)
    edge_in = jnp.concatenate([h_i, full, radial], axis=-1)
    m = apply_mlp(params["edge_nn"], edge_in, final_act=silu)
    if cfg.attention:
        m = m * jax.nn.sigmoid(apply_linear(params["att_nn"], m))
    m = jnp.where(valid[..., None], m, 0.0)
    gate = apply_linear(params["coord_nn"][1],
                        silu(apply_linear(params["coord_nn"][0], m)))
    if cfg.tanh:
        gate = jnp.tanh(gate) * params["coords_range"]
    trans = jnp.clip(coord_diff * gate, -100.0, 100.0)
    trans = jnp.where(valid[..., None], trans, 0.0)
    return m, trans


def node_outputs(params, cfg: EGCLConfig, h, agg, f_sum, count, atom_mask):
    """Per-node heads from aggregated edge quantities (shared dense/ring).

    ``agg [..., N, hidden]`` summed messages, ``f_sum [..., N, 3]`` summed
    gated displacements, ``count [..., N, 1]`` valid-neighbor counts.
    Returns ``(Q, F, G)`` zeroed on padded atoms.
    """
    am = atom_mask[..., None]
    G = apply_mlp(params["node_nn"], jnp.concatenate([h, agg], axis=-1))
    G = jnp.where(am, G, 0.0)
    F = f_sum / jnp.clip(count, 1, None).astype(f_sum.dtype)
    F = jnp.where(am, F * cfg.coords_weight, 0.0)
    Q = apply_mlp(params["vel_scaling_nn"], h)
    Q = jnp.where(am, Q, 0.0)
    return Q, F, G


def apply_egcl(params, cfg: EGCLConfig, h, coord_diff, nbr_idx, nbr_mask,
               atom_mask, all_pairs: bool = False):
    """Apply one EGCL.

    Args:
      h:          ``[B, N, nf]`` node features.
      coord_diff: ``[B, N, K, 3]`` min-image displacements ``pos_i - pos_j``
                  (zeroed on invalid slots).
      nbr_idx:    ``[B, N, K]`` neighbor indices.
      nbr_mask:   ``[B, N, K]`` valid-neighbor mask.
      atom_mask:  ``[B, N]`` real-atom mask.
      all_pairs:  static hint that ``nbr_idx[b,i,k] == k`` (K == N), so the
                  neighbor-feature lookup is a broadcast, not a gather.

    Returns:
      ``(Q [B,N,1], F [B,N,3], G [B,N,nf])``, all zeroed on padded atoms.
    """
    am = atom_mask[..., None]
    in_dtype = h.dtype
    if cfg.compute_dtype is not None:
        cdt = jnp.dtype(cfg.compute_dtype)
        params = jax.tree_util.tree_map(lambda x: x.astype(cdt), params)
        h = h.astype(cdt)
        coord_diff = coord_diff.astype(cdt)

    # -- edge model (reference egcl.py:57-63) ------------------------------
    if all_pairs:
        h_j = h[:, None, :, :]          # broadcastable I=1 axis (fast path)
    else:
        h_j = jax.vmap(lambda hb, ib: hb[ib])(h, nbr_idx)      # [B,N,K,nf]

    if cfg.use_pallas and cfg.use_pallas != "v2":
        if cfg.attention or cfg.norm_diff or cfg.tanh:
            # same contract as the v2 kernel (apply_egcl_fused_allpairs):
            # fail loudly rather than silently benchmarking the XLA path
            raise ValueError(
                "use_pallas requires attention/norm_diff/tanh off; the "
                "fused edge kernel implements only the default EGCL path")
        B, N, nf = h.shape
        radial = (coord_diff * coord_diff).sum(-1, keepdims=True)
        full = jnp.broadcast_to(h_j, radial.shape[:-1] + (nf,))
        h_i = jnp.broadcast_to(h[:, :, None, :], full.shape)
        edge_in = jnp.concatenate([h_i, full, radial], axis=-1)
        return _apply_egcl_fused(params, cfg, h, edge_in, coord_diff,
                                 nbr_mask, am, in_dtype)

    m, trans = edge_messages(params, cfg, h, h_j, coord_diff, nbr_mask)
    # masked scatter-sum == dense sum over K (egcl.py:65-69); masked mean for
    # the force (egcl.py:71-75)
    count = nbr_mask.sum(axis=2, keepdims=True)
    Q, F, G = node_outputs(params, cfg, h, m.sum(axis=2), trans.sum(axis=2),
                           count, atom_mask)

    if cfg.compute_dtype is not None:
        Q, F, G = (Q.astype(in_dtype), F.astype(in_dtype),
                   G.astype(in_dtype))
    return Q, F, G


def apply_egcl_fused_allpairs(params, cfg: EGCLConfig, h, pos, box,
                              atom_mask, mol_tile=None, kernel="v2"):
    """EGCL via a fused all-pairs Pallas kernel (``kernel``: "v2" =
    ops/egcl_fused.py per-neighbor-unrolled, "v3" = ops/egcl_fused_v3.py
    full-width edge block).

    Takes raw per-atom state — no ``[B,N,K,·]`` displacement/edge tensors are
    ever materialized in HBM. Requires ``nbr_mode == 'all_pairs'`` semantics
    and attention/norm_diff/tanh off (raises otherwise — the kernel would
    silently ignore those branches). Same ``(Q, F, G)`` contract as
    :func:`apply_egcl`.
    """
    if kernel == "v3":
        from ..ops.egcl_fused_v3 import \
            fused_allpairs_edges_v3 as fused_allpairs_edges
    else:
        from ..ops.egcl_fused import fused_allpairs_edges

    if cfg.attention or cfg.norm_diff or cfg.tanh:
        raise ValueError(
            "apply_egcl_fused_allpairs supports only the default EGCL path; "
            "attention/norm_diff/tanh must be off (use apply_egcl)")
    in_dtype = h.dtype
    if cfg.compute_dtype is not None:
        cdt = jnp.dtype(cfg.compute_dtype)
        params = jax.tree_util.tree_map(lambda x: x.astype(cdt), params)
        h = h.astype(cdt)
    if jnp.dtype(h.dtype) == jnp.float64:
        # the kernel computes in f32 internally; don't silently degrade
        # f64 runs (x64 tests / CPU) — the XLA path delivers real f64
        raise ValueError(
            "apply_egcl_fused_allpairs computes in <= f32; for float64 use "
            "apply_egcl or set compute_dtype")
    agg, f_sum, count = fused_allpairs_edges(params, h, pos, box, atom_mask,
                                             mol_tile=mol_tile)
    Q, F, G = node_outputs(params, cfg, h, agg, f_sum, count, atom_mask)
    if cfg.compute_dtype is not None:
        Q, F, G = (Q.astype(in_dtype), F.astype(in_dtype),
                   G.astype(in_dtype))
    return Q, F, G


def _apply_egcl_fused(params, cfg: EGCLConfig, h, edge_in, coord_diff,
                      nbr_mask, am, in_dtype):
    """EGCL tail using the fused Pallas edge pipeline (ops/edge_kernel.py)."""
    from ..ops.edge_kernel import fused_edge_pipeline

    B, N, K, C = edge_in.shape
    A = B * N
    emask = nbr_mask.reshape(A, K)
    agg, f_sum = fused_edge_pipeline(
        edge_in.reshape(A, K, C), coord_diff.reshape(A, K, 3),
        emask,
        params["edge_nn"][0]["w"], params["edge_nn"][0]["b"],
        params["edge_nn"][1]["w"], params["edge_nn"][1]["b"],
        params["coord_nn"][0]["w"], params["coord_nn"][0]["b"],
        params["coord_nn"][1]["w"])
    agg = agg.reshape(B, N, -1)
    f_sum = f_sum.reshape(B, N, 3)

    G = apply_mlp(params["node_nn"], jnp.concatenate([h, agg], axis=-1))
    G = jnp.where(am, G, 0.0)

    count = jnp.clip(nbr_mask.sum(axis=2, keepdims=True), 1, None)
    F = f_sum / count.astype(f_sum.dtype)
    F = jnp.where(am, F * cfg.coords_weight, 0.0)

    Q = apply_mlp(params["vel_scaling_nn"], h)
    Q = jnp.where(am, Q, 0.0)

    if cfg.compute_dtype is not None:
        Q, F, G = (Q.astype(in_dtype), F.astype(in_dtype),
                   G.astype(in_dtype))
    return Q, F, G
