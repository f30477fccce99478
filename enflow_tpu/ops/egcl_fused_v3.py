"""Fused all-pairs EGCL edge pipeline, v3 (Pallas TPU): full-width edge
block, no per-neighbor unroll.

Why v3 (measured motivation, RESULTS.md r2 roofline): the bench workload
spends 38% of its runtime in two XLA fusions streaming the [P,13,13,128]
edge tensors between fusion boundaries, and a perfect fused kernel bounds
the EGCL grad step at ~4-5x below the XLA schedule. The r1/r2 kernels lost
to XLA for two structural reasons recorded in ``egcl_fused.py``: (a) a
static per-neighbor unroll — N narrow [rows,3]/[rows,1] geometry ops per
layer where XLA batches them once, and N-scaled Mosaic compile times
(861 s at N=55); (b) all-f32 elementwise (2x VPU vs XLA's bf16).

v3 removes both (the CLAUDE.md round-2 sketch):

- ONE edge-row block per grid program: ``E = T*N*N`` rows, e = (t, i, j)
  i-major. Node state is replicated to edge rows by two 0/1 matmuls
  (``Ri``: rows repeat i-side, ``Rj``: j-side), precomputed host-side and
  passed as constant-index-map inputs (``_repl_mats``) — the *narrow*
  [T*N, nf+4] node concat is replicated (~1.3M MACs at T=8), never a
  hidden-wide tensor.
- Every hidden-wide matmul (edge layers 1/2, gate 1/2) runs full-width
  over all E rows — one MXU pass each per program instead of N narrow
  passes. Aggregations back to nodes are single ``R^T @ X`` contractions
  over the E axis (agg over j = Ri^T, over i = Rj^T).
- Geometry (cd / r2 / clip, [E,3]-narrow) is computed ONCE per program in
  f32; the hidden-wide elementwise chain stays in the compute dtype
  (bf16), f32 only inside the sigmoid (Mosaic has no bf16 logistic here).
- Backward recomputes the forward in-VMEM (residuals = inputs only, the
  same policy as the flow's remat default) and emits node grads directly:
  ``dh = Ri^T (dz1 W1a^T) + Rj^T (dz1 W1b^T)`` — no per-j ``dmol`` stack.
  Parameter grads accumulate across the sequential grid (constant out
  index_map, first-program init).

Semantics match ``nn.egcl.edge_messages`` + K-sums in ``all_pairs`` mode
(reference enflow/nn/egcl.py:57-93) with attention/norm_diff/tanh off —
same contract as the v2 kernel (``use_pallas: "v3"`` dispatches here from
the flow integrators). Interpret mode off-TPU so tests exercise the same
kernel code on CPU.

Measured verdict (v5 lite, round 3 — chained-scan harness, ms per EGCL
application; full table + ablation split in RESULTS.md):

    B=1024 N=13 H=128   xla fwd 0.327  fwd+bwd 1.444 | v3 0.867  3.369
    B=256  N=55 H=256   xla fwd 2.236  fwd+bwd 14.12 | v3 4.503  19.88
    nf=128 (wide)       xla fwd 0.461  fwd+bwd 2.484 | v3 0.880  3.001
    nf=256 (wide)       xla fwd 0.990  fwd+bwd 5.153 | v3 1.405  5.242

XLA wins every regime. The structural reason (quantified by ablation:
replication machinery 0.45 ms + narrow geometry 0.37 ms vs 0.33 ms for
XLA's ENTIRE fused fwd): XLA's fused broadcasts make neighbor replication
free, while the MXU cannot read broadcasts — any kernel formulation must
materialize [E, .] operands, and that machinery alone costs more than the
pipeline it feeds. The narrow [E,3]/[E,1] geometry ops cost one vector
instruction per 8 sublanes regardless of lane occupancy, so they are
~15 wide-op equivalents in any row-major edge-block design. What v3 DOES
fix vs v2 is compile time (no unroll): N=55 compiles in 7-34 s vs 861 s /
>29 min. The wide-nf sweep shows the
gap closing monotonically as real compute amortizes materialization
(fwd+bwd 2.3x at nf=5 -> 1.017x at nf=256) WITHOUT crossing — parity is
the asymptote, not a win. Kept opt-in (``use_pallas: "v3"``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _compiler_params():
    if _interpret():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _silu(x):
    # sigmoid in f32: Mosaic's bf16 logistic lowering is broken on this
    # target; the surrounding chain stays in the compute dtype
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)


def _dsilu(x):
    xf = x.astype(jnp.float32)
    s = jax.nn.sigmoid(xf)
    return (s * (1.0 + xf * (1.0 - s))).astype(x.dtype)


def _mol_tile(N: int, B: int) -> int:
    """Molecules per grid program: target ~1-2k edge rows (E = T*N*N)."""
    t = max(1, 1024 // (N * N))
    return min(t, B)


def _dot(a, b, cdt):
    return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(cdt)


def _dot_t(a, b, cdt=jnp.float32):
    """a^T @ b contracting axis 0 of both (the big E axis), f32 accumulate."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32).astype(cdt)


def _repl_mats(T, N, R8, cdt):
    """Host-side (XLA, loop-invariant) construction of the 0/1 replication
    matrices and the self-pair mask. Built ONCE outside the kernel and
    passed as constant-index-map inputs: the r3 ablation measured the
    in-kernel iota/compare construction, repeated every grid program, at a
    large fraction of the kernel's runtime (RESULTS.md r3). Kept in BOTH
    precisions — f32 for exact narrow geometry replication, compute-dtype
    (bf16) for the hidden-wide contractions (0/1 is exact in bf16; f32 MXU
    is ~8x slower on v5e)."""
    E = T * N * N
    e = jnp.arange(E)
    c = jnp.arange(R8)
    Ri = (c[None, :] == (e // N)[:, None]).astype(jnp.float32)
    Rj = (c[None, :]
          == ((e // (N * N)) * N + e % N)[:, None]).astype(jnp.float32)
    not_self = (((e // N) % N) != (e % N)).astype(jnp.float32)[:, None]
    return Ri, Rj, Ri.astype(cdt), Rj.astype(cdt), not_self


def _edge_geometry(nf, node_cat_ref, box_ref, Rif_ref, Rjf_ref,
                   notself_ref):
    """Replicate node state to the i-major edge-row block and compute the
    shared geometry. Returns (h_i, h_j, cd, r2, valid, Ri, Rj) with
    h_* in f32, cd/r2 f32, valid [E,1] f32.

    Blocks arrive as [1, R8, C] tiles where R8 = T*N rounded up to a
    sublane multiple (Mosaic requires block sublanes % 8 == 0); the
    replication matrices are [E, R8] whose column targets are always
    < T*N, so the padded rows are simply never selected."""
    f32 = jnp.float32
    Ri = Rif_ref[:]                                             # [E, R8]
    Rj = Rjf_ref[:]

    node_cat = node_cat_ref[0]                                  # [R8, .] f32
    cat_i = _dot(Ri, node_cat, f32)                             # [E, nf+4]
    cat_j = _dot(Rj, node_cat, f32)
    box_e = _dot(Ri, box_ref[0], f32)                           # [E, 3]

    pos_i = cat_i[:, nf:nf + 3]
    pos_j = cat_j[:, nf:nf + 3]
    cd = pos_i - pos_j
    cd = cd - jnp.round(cd / box_e) * box_e
    r2 = (cd * cd).sum(axis=1, keepdims=True)                   # [E, 1] f32

    valid = (cat_i[:, nf + 3:nf + 4] * cat_j[:, nf + 3:nf + 4]
             * notself_ref[:])

    return cat_i[:, :nf], cat_j[:, :nf], cd, r2, valid, Ri, Rj


def _fwd_block(nf, cdt, node_cat_ref, box_ref, Rif_ref, Rjf_ref,
               notself_ref, W1a_ref, W1b_ref,
               w1r_ref, b1_ref, W2_ref, b2_ref, W3_ref, b3_ref, w4_ref):
    """Shared forward evaluation (used by both kernels). Returns the full
    activation set for the backward recompute."""
    f32 = jnp.float32
    h_i_f, h_j_f, cd, r2, valid, Ri, Rj = _edge_geometry(
        nf, node_cat_ref, box_ref, Rif_ref, Rjf_ref, notself_ref)
    h_i = h_i_f.astype(cdt)
    h_j = h_j_f.astype(cdt)
    validc = valid.astype(cdt)

    z1 = (_dot(h_i, W1a_ref[:], cdt) + _dot(h_j, W1b_ref[:], cdt)
          + b1_ref[:] + r2.astype(cdt) * w1r_ref[:])            # [E, H]
    m1 = _silu(z1)
    z2 = _dot(m1, W2_ref[:], cdt) + b2_ref[:]
    m2 = _silu(z2) * validc
    z3 = _dot(m2, W3_ref[:], cdt) + b3_ref[:]
    g1 = _silu(z3)
    gate = _dot(g1, w4_ref[:], f32)                             # [E, 1]
    trans = jnp.clip(cd * gate, -100.0, 100.0) * valid          # f32 cmp
    return (h_i, h_j, cd, r2, valid, validc, Ri, Rj,
            z1, m1, z2, m2, z3, g1, gate, trans)


def _fwd_kernel(T, N, nf, H, node_cat_ref, box_ref, Rif_ref, Rjf_ref,
                Ric_ref, Rjc_ref, notself_ref, W1a_ref, W1b_ref,
                w1r_ref, b1_ref, W2_ref, b2_ref, W3_ref, b3_ref, w4_ref,
                agg_ref, fsum_ref):
    cdt = agg_ref.dtype
    (_, _, _, _, _, _, Ri, _,
     _, _, _, m2, _, _, _, trans) = _fwd_block(
        nf, cdt, node_cat_ref, box_ref, Rif_ref, Rjf_ref, notself_ref,
        W1a_ref, W1b_ref, w1r_ref, b1_ref, W2_ref, b2_ref, W3_ref, b3_ref,
        w4_ref)
    agg_ref[:] = _dot_t(Ric_ref[:], m2, cdt)[None]  # sum over j -> [R8, H]
    # trans aggregation in the compute dtype: the XLA path also sums the
    # (clipped, bf16) trans over K in bf16; an f32 contraction here costs
    # ~4x the MXU passes for no extra parity
    fsum_ref[:] = _dot_t(Ric_ref[:], trans.astype(cdt), cdt)[None]


def _bwd_kernel(T, N, nf, H, node_cat_ref, box_ref, Rif_ref, Rjf_ref,
                Ric_ref, Rjc_ref, notself_ref, W1a_ref, W1b_ref,
                w1r_ref, b1_ref, W2_ref, b2_ref, W3_ref, b3_ref, w4_ref,
                W1aT_ref, W1bT_ref, W2T_ref, W3T_ref, w4T_ref,
                dagg_ref, dfsum_ref,
                dh_ref, dpos_ref, dW1a_ref, dW1b_ref, dw1r_ref, db1_ref,
                dW2_ref, db2_ref, dW3_ref, db3_ref, dw4_ref):
    f32 = jnp.float32
    cdt = dh_ref.dtype
    (h_i, h_j, cd, r2, valid, validc, Ri, Rj,
     z1, m1, z2, m2, z3, g1, gate, _trans) = _fwd_block(
        nf, cdt, node_cat_ref, box_ref, Rif_ref, Rjf_ref, notself_ref,
        W1a_ref, W1b_ref, w1r_ref, b1_ref, W2_ref, b2_ref, W3_ref, b3_ref,
        w4_ref)

    # edge-level cotangents: agg = Ri^T m2, fsum = Ri^T trans
    Ri_c, Rj_c = Ric_ref[:], Rjc_ref[:]
    d_m2_agg = _dot(Ri_c, dagg_ref[0].astype(cdt), cdt)         # [E, H]
    d_trans = _dot(Ri_c, dfsum_ref[0].astype(cdt), f32)         # [E, 3]

    trans_raw = cd * gate
    inside = ((trans_raw >= -100.0) & (trans_raw <= 100.0)).astype(f32)
    d_trans = d_trans * inside * valid
    d_gate = (cd * d_trans).sum(axis=1, keepdims=True)          # [E, 1] f32
    d_cd = gate * d_trans

    d_g1 = _dot(d_gate.astype(cdt), w4T_ref[:], cdt)            # [E, H]
    dz3 = d_g1 * _dsilu(z3)
    d_m2 = (_dot(dz3, W3T_ref[:], cdt) + d_m2_agg) * validc
    dz2 = d_m2 * _dsilu(z2)
    d_m1 = _dot(dz2, W2T_ref[:], cdt)
    dz1 = d_m1 * _dsilu(z1)

    d_r2 = (dz1.astype(f32) * w1r_ref[:].astype(f32)).sum(
        axis=1, keepdims=True)
    d_cd = d_cd + 2.0 * cd * d_r2

    # node grads: i- and j-side aggregations over the E axis
    dz1_i = _dot_t(Ri_c, dz1)                                   # [R8, H]
    dz1_j = _dot_t(Rj_c, dz1)
    dh_ref[:] = (_dot(dz1_i.astype(cdt), W1aT_ref[:], f32)
                 + _dot(dz1_j.astype(cdt), W1bT_ref[:],
                        f32)).astype(cdt)[None]
    d_cd_c = d_cd.astype(cdt)
    dpos_ref[:] = (_dot_t(Ri_c, d_cd_c)
                   - _dot_t(Rj_c, d_cd_c))[None]    # f32 accum of cdt terms

    # parameter grads, accumulated across the sequential grid
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _init():
        for ref in (dW1a_ref, dW1b_ref, dw1r_ref, db1_ref, dW2_ref,
                    db2_ref, dW3_ref, db3_ref, dw4_ref):
            ref[:] = jnp.zeros_like(ref)

    dW1a_ref[:] += _dot_t(h_i, dz1)
    dW1b_ref[:] += _dot_t(h_j, dz1)
    dw1r_ref[:] += (r2 * dz1.astype(f32)).sum(axis=0, keepdims=True)
    db1_ref[:] += dz1.astype(f32).sum(axis=0, keepdims=True)
    dW2_ref[:] += _dot_t(m1, dz2)
    db2_ref[:] += dz2.astype(f32).sum(axis=0, keepdims=True)
    dW3_ref[:] += _dot_t(m2, dz3)
    db3_ref[:] += dz3.astype(f32).sum(axis=0, keepdims=True)
    dw4_ref[:] += _dot_t(g1, d_gate)


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------

def _r8(rows: int) -> int:
    """Round a tile's row count up to the Mosaic sublane multiple."""
    return -(-rows // 8) * 8


def _tile3(x, G, rows, R8):
    """[G*rows, C] -> [G, R8, C] with zero row padding per tile."""
    x = x.reshape(G, rows, x.shape[-1])
    if R8 != rows:
        x = jnp.pad(x, [(0, 0), (0, R8 - rows), (0, 0)])
    return x


def _prep(h, pos, box, mask_f, T):
    """Pad B to a multiple of T; tiled node concat [G, R8, nf+4] f32 +
    box rows [G, R8, 3] (R8 = T*N rounded up to a sublane multiple — the
    padded rows carry mask 0 and are never selected by the in-kernel
    replication matrices)."""
    B, N, nf = h.shape
    f32 = jnp.float32
    Bp = -(-B // T) * T
    if Bp != B:
        h = jnp.pad(h, [(0, Bp - B), (0, 0), (0, 0)])
        pos = jnp.pad(pos, [(0, Bp - B), (0, 0), (0, 0)])
        box = jnp.pad(box, [(0, Bp - B), (0, 0)], constant_values=1.0)
        mask_f = jnp.pad(mask_f, [(0, Bp - B), (0, 0)])
    G, rows, R8 = Bp // T, T * N, _r8(T * N)
    node_cat = _tile3(jnp.concatenate(
        [h.astype(f32), pos.astype(f32), mask_f[..., None].astype(f32)],
        axis=-1).reshape(Bp * N, nf + 4), G, rows, R8)
    box_rows = _tile3(jnp.broadcast_to(
        box.astype(f32)[:, None, :], (Bp, N, 3)).reshape(Bp * N, 3),
        G, rows, R8)
    return node_cat, box_rows, Bp, R8


def _common_specs(T, N, nf, H):
    R8 = _r8(T * N)
    E = T * N * N
    const2 = lambda p: (0, 0)
    in_specs = [
        pl.BlockSpec((1, R8, nf + 4), lambda p: (p, 0, 0)),  # node_cat
        pl.BlockSpec((1, R8, 3), lambda p: (p, 0, 0)),       # box_rows
        pl.BlockSpec((E, R8), const2),                       # Ri f32
        pl.BlockSpec((E, R8), const2),                       # Rj f32
        pl.BlockSpec((E, R8), const2),                       # Ri cdt
        pl.BlockSpec((E, R8), const2),                       # Rj cdt
        pl.BlockSpec((E, 1), const2),                        # not_self
        pl.BlockSpec((nf, H), lambda p: (0, 0)),             # W1a
        pl.BlockSpec((nf, H), lambda p: (0, 0)),             # W1b
        pl.BlockSpec((1, H), lambda p: (0, 0)),              # w1r
        pl.BlockSpec((1, H), lambda p: (0, 0)),              # b1
        pl.BlockSpec((H, H), lambda p: (0, 0)),              # W2
        pl.BlockSpec((1, H), lambda p: (0, 0)),              # b2
        pl.BlockSpec((H, H), lambda p: (0, 0)),              # W3
        pl.BlockSpec((1, H), lambda p: (0, 0)),              # b3
        pl.BlockSpec((H, 1), lambda p: (0, 0)),              # w4
    ]
    return R8, in_specs


def _split_params(W1, b1, nf):
    """Slice the concat-form first layer [2nf+1, H] into h_i / h_j / r^2
    actions (identical values to the concat dot)."""
    return (W1[:nf], W1[nf:2 * nf], W1[2 * nf:2 * nf + 1], b1[None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(shapes, h, pos, box, mask_f, W1a, W1b, w1r, b1, W2, b2, W3, b3,
           w4):
    out, _ = _fused_fwd(shapes, h, pos, box, mask_f, W1a, W1b, w1r,
                        b1, W2, b2, W3, b3, w4)
    return out


def _fused_fwd(shapes, h, pos, box, mask_f, W1a, W1b, w1r, b1, W2, b2, W3,
               b3, w4):
    N, nf, H, T = shapes
    cdt = h.dtype
    B = h.shape[0]
    node_cat, box_rows, Bp, R8 = _prep(h, pos, box, mask_f, T)
    Rif, Rjf, Ric, Rjc, notself = _repl_mats(T, N, R8, cdt)
    _, in_specs = _common_specs(T, N, nf, H)
    G = Bp // T
    grid = (G,)
    agg, fsum = pl.pallas_call(
        functools.partial(_fwd_kernel, T, N, nf, H),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, R8, H), lambda p: (p, 0, 0)),
            pl.BlockSpec((1, R8, 3), lambda p: (p, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, R8, H), cdt),
            jax.ShapeDtypeStruct((G, R8, 3), cdt),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(node_cat, box_rows, Rif, Rjf, Ric, Rjc, notself,
      W1a, W1b, w1r, b1, W2, b2, W3, b3, w4)
    agg = agg[:, :T * N].reshape(Bp, N, H)[:B]
    fsum = fsum[:, :T * N].reshape(Bp, N, 3)[:B]
    res = (h, pos, box, mask_f, W1a, W1b, w1r, b1, W2, b2, W3, b3, w4)
    return (agg, fsum), res


def _fused_bwd(shapes, res, cts):
    N, nf, H, T = shapes
    h, pos, box, mask_f, W1a, W1b, w1r, b1, W2, b2, W3, b3, w4 = res
    dagg, dfsum = cts
    cdt = h.dtype
    B = h.shape[0]
    node_cat, box_rows, Bp, R8 = _prep(h, pos, box, mask_f, T)
    Rif, Rjf, Ric, Rjc, notself = _repl_mats(T, N, R8, cdt)
    if Bp != B:
        dagg = jnp.pad(dagg, [(0, Bp - B), (0, 0), (0, 0)])
        dfsum = jnp.pad(dfsum, [(0, Bp - B), (0, 0), (0, 0)])
    G, rows = Bp // T, T * N
    dagg = _tile3(dagg.astype(cdt).reshape(Bp * N, H), G, rows, R8)
    dfsum = _tile3(dfsum.astype(cdt).reshape(Bp * N, 3), G, rows, R8)

    _, in_specs = _common_specs(T, N, nf, H)
    in_specs = in_specs + [
        pl.BlockSpec((H, nf), lambda p: (0, 0)),             # W1aT
        pl.BlockSpec((H, nf), lambda p: (0, 0)),             # W1bT
        pl.BlockSpec((H, H), lambda p: (0, 0)),              # W2T
        pl.BlockSpec((H, H), lambda p: (0, 0)),              # W3T
        pl.BlockSpec((1, H), lambda p: (0, 0)),              # w4T
        pl.BlockSpec((1, R8, H), lambda p: (p, 0, 0)),       # dagg
        pl.BlockSpec((1, R8, 3), lambda p: (p, 0, 0)),       # dfsum
    ]
    grid = (G,)
    const = lambda p: (0, 0)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, T, N, nf, H),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, R8, nf), lambda p: (p, 0, 0)),      # dh
            pl.BlockSpec((1, R8, 3), lambda p: (p, 0, 0)),       # dpos
            pl.BlockSpec((nf, H), const),
            pl.BlockSpec((nf, H), const),
            pl.BlockSpec((1, H), const),
            pl.BlockSpec((1, H), const),
            pl.BlockSpec((H, H), const),
            pl.BlockSpec((1, H), const),
            pl.BlockSpec((H, H), const),
            pl.BlockSpec((1, H), const),
            pl.BlockSpec((H, 1), const),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, R8, nf), cdt),
            jax.ShapeDtypeStruct((G, R8, 3), jnp.float32),
            jax.ShapeDtypeStruct((nf, H), jnp.float32),
            jax.ShapeDtypeStruct((nf, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, 1), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(node_cat, box_rows, Rif, Rjf, Ric, Rjc, notself,
      W1a, W1b, w1r, b1, W2, b2, W3, b3, w4,
      W1a.T, W1b.T, W2.T, W3.T, w4.T, dagg, dfsum)
    (dh_rows, dpos_rows, dW1a, dW1b, dw1r, db1, dW2, db2, dW3, db3,
     dw4) = outs

    dh = dh_rows[:, :rows].reshape(Bp, N, nf)[:B]
    dpos = dpos_rows[:, :rows].reshape(Bp, N, 3)[:B]
    z = jnp.zeros_like
    return (dh, dpos, z(box), z(mask_f),
            dW1a.astype(W1a.dtype), dW1b.astype(W1b.dtype),
            dw1r.astype(w1r.dtype), db1.astype(b1.dtype),
            dW2.astype(W2.dtype), db2.astype(b2.dtype),
            dW3.astype(W3.dtype), db3.astype(b3.dtype),
            dw4.astype(w4.dtype))


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_allpairs_edges_v3(params, h, pos, box, atom_mask, mol_tile=None):
    """v3 fused all-pairs edge pipeline: aggregated messages + force sums.

    Same contract as ``ops.egcl_fused.fused_allpairs_edges`` (v2): EGCL
    param pytree, ``h [B,N,nf]``, ``pos [B,N,3]``, ``box [B,3]``,
    ``atom_mask [B,N]`` -> ``(agg [B,N,H], f_sum [B,N,3], count [B,N,1])``
    matching ``edge_messages`` + masked K-sums in ``all_pairs`` mode.
    """
    B, N, nf = h.shape
    W1, b1 = params["edge_nn"][0]["w"], params["edge_nn"][0]["b"]
    W2, b2 = params["edge_nn"][1]["w"], params["edge_nn"][1]["b"]
    W3, b3 = params["coord_nn"][0]["w"], params["coord_nn"][0]["b"]
    w4 = params["coord_nn"][1]["w"]
    H = W2.shape[1]
    cdt = h.dtype
    T = mol_tile or _mol_tile(N, B)
    W1a, W1b, w1r, b1r = _split_params(W1, b1, nf)
    mask_f = atom_mask.astype(cdt)
    agg, fsum = _fused(
        (N, nf, H, T), h, pos.astype(jnp.float32), box.astype(jnp.float32),
        mask_f, W1a, W1b, w1r, b1r, W2, b2[None, :], W3, b3[None, :], w4)
    n_real = atom_mask.sum(axis=1, keepdims=True)
    count = jnp.where(atom_mask, n_real - 1, 0)[..., None]
    return agg, fsum, count
