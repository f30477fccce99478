"""Fused all-pairs EGCL edge pipeline, v2 (Pallas TPU).

Motivation (measured on v5e at the LJ13 flow-SMC bench workload): the XLA
edge pipeline costs ~1.1 ms per EGCL forward while its matmul content is
~0.1 ms — XLA never fuses across dot boundaries, so every [B,N,K,hidden]
intermediate (edge messages after each MLP layer, the gate branch) makes an
HBM round trip, and the small N=K=13 middle dims pad 13->16 sublanes on top.
The first-generation kernel (``edge_kernel.py``) fused the pipeline but (a)
required XLA to pre-materialize the [A*K, 2nf+1] edge inputs and [A*K, 3]
displacements, and (b) spent as many MXU passes on its [atoms, atoms*K]
summation matmuls as on the real compute.

This kernel starts from raw per-atom state instead. Grid over molecule
tiles; per program everything lives in VMEM:

  for j in 0..N-1 (static unroll over neighbor slots; all-pairs => K == N):
      (h_j, pos_j, mask_j) = R @ mol_cat[j]     R: 0/1 row-replication matrix
                                                [T*N, T], one MXU pass -
                                                replaces gathers Mosaic can't
                                                tile and the v1 summation
                                                matmul it replaces costs
                                                ~nf/H of a hidden-wide pass
      cd  = min_image(pos_rows - pos_j)
      z1  = (h_rows @ W1a + b1) + h_j @ W1b + |cd|^2 * w1r   # split concat dot
      m   = silu(silu(z1) @ W2 + b2) * valid
      gate= silu(m @ W3 + b3) @ w4
      agg += m ;  fsum += clip(cd * gate, +-100) * valid

The split first layer is exact: W1 rows [0:nf) act on h_i, [nf:2nf) on h_j,
[2nf] on r^2 — same values as the concat form, no [.., 2nf+1] tensor. The
backward kernel recomputes per-j activations in VMEM (inputs are the only
residuals) and emits input grads plus parameter grads accumulated across the
sequential grid (constant out index_map + first-program init).

Semantics match ``nn.egcl.edge_messages`` + K-sums in ``all_pairs`` mode
(reference enflow/nn/egcl.py:57-75 semantics) with attention/norm_diff/tanh
off; the flow integrators dispatch here for that regime when
``EGCLConfig.use_pallas`` is set. Falls back to interpret mode off-TPU so
tests exercise the same kernel code path on CPU.

Measured regime study (v5e, bf16 compute, f32 params; standalone EGCL, 30
reps after warmup)::

    B=1024 N=13 H=128   xla fwd 1.32ms  fwd+bwd  2.12ms | fused 1.50  3.12
    B=1024 N=13 H=512   xla fwd 2.50ms  fwd+bwd  6.66ms | fused 3.05  8.22
    B=256  N=55 H=256   xla fwd 3.53ms  fwd+bwd 12.95ms | fused fwd 5.35
                        (Mosaic compile 861 s; the fwd+bwd pair exceeded a
                        29-min compile budget — the static per-neighbor
                        unroll is 55 iterations in both kernels)
    mol_tile sweep (N=13, H=128 fwd): T=32 1.50ms, 64 1.55, 128 1.61, 256
    1.56 — small tiles pipeline grid programs best; default targets ~512
    rows

Conclusion: XLA wins every tested regime, including wide-hidden — its
fusion already keeps HBM traffic low enough that the kernel's remaining
edge is erased by two structural costs Mosaic imposes here: (a) activations
and geometry run f32 in-kernel (no bf16 logistic/round/cmp on this target)
so every elementwise op pays 2x VPU vs XLA's bf16, and (b) the per-j narrow
[rows,3]/[rows,1] geometry ops occupy full vector registers N times per
layer where XLA batches them across all edges once. At large N the static
unroll also makes compile time prohibitive. The kernel is kept as validated,
opt-in infrastructure (``use_pallas: "v2"``) and as the measured record of
why hand-fusion does not pay on this workload; large-N pairwise work uses
``ops/pairwise_kernel.py`` + the cell list instead.
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
    # activation in f32: Mosaic's bf16 `logistic` lowering is broken (f32
    # scalar broadcast into a bf16 vector), and f32 keeps parity tight
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)


def _dsilu(x):
    xf = x.astype(jnp.float32)
    s = jax.nn.sigmoid(xf)
    return (s * (1.0 + xf * (1.0 - s))).astype(x.dtype)


def _mol_tile(N: int, B: int) -> int:
    """Molecules per grid program: keep the row tile T*N around ~512 rows
    (measured best on v5e at N=13/H=128: T=32 1.50 ms vs T=64 1.55 / T=128
    1.61 — smaller tiles pipeline grid programs better), T a multiple of 16
    (sublane alignment for bf16 row tiles)."""
    t = max(16, min(64, (512 // N) // 16 * 16))
    return min(t, max(16, (B + 15) // 16 * 16))


def _replication_matrix(rows: int, T: int, N: int, dtype):
    """R [rows, T] with R[r, t] = (r // N == t); R @ x replicates each
    molecule row of x across that molecule's N atom-rows."""
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, T), 0) // N
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, T), 1)
    return (r_ids == t_ids).astype(dtype)


def _dot(a, b, cdt):
    return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(cdt)


def _dot_t(a, b):
    """a^T @ b contracting the (row) axis 0 of both, f32 accumulate."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(N, nf, H, mol_cat_ref, h_rows_ref, pos_rows_ref,
                mask_rows_ref, box_ref, W1a_ref, W1b_ref, w1r_ref, b1_ref,
                W2_ref, b2_ref, W3_ref, b3_ref, w4_ref,
                agg_ref, fsum_ref):
    cdt = h_rows_ref.dtype
    f32 = jnp.float32
    rows = h_rows_ref.shape[0]
    T = rows // N
    # geometry (positions, min-image wrap) stays f32 in-kernel: Mosaic can't
    # legalize round/logistic on bf16 vectors, and f32 matches the XLA path,
    # which computes displacements in f32 before casting
    R = _replication_matrix(rows, T, N, f32)

    pos_rows = pos_rows_ref[:]                      # f32
    maskr = mask_rows_ref[:]                        # cdt
    i_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % N

    box_rows = _dot(R, box_ref[:], f32)
    inv_box = 1.0 / box_rows
    hi_c = (_dot(h_rows_ref[:], W1a_ref[:], cdt) + b1_ref[:])

    agg = jnp.zeros((rows, H), f32)
    fsum = jnp.zeros((rows, 3), f32)
    for j in range(N):
        rj = _dot(R, mol_cat_ref[j], f32)
        hj = rj[:, :nf].astype(cdt)
        pj = rj[:, nf:nf + 3]
        mj = rj[:, nf + 3:nf + 4].astype(cdt)
        cd = pos_rows - pj
        cd = cd - jnp.round(cd * inv_box) * box_rows
        r2 = (cd * cd).sum(axis=1, keepdims=True).astype(cdt)
        z1 = hi_c + _dot(hj, W1b_ref[:], cdt) + r2 * w1r_ref[:]
        m1 = _silu(z1)
        m2 = _silu(_dot(m1, W2_ref[:], cdt) + b2_ref[:])
        valid = maskr * mj * (i_ids != j).astype(cdt)
        m2 = m2 * valid
        g1 = _silu(_dot(m2, W3_ref[:], cdt) + b3_ref[:])
        gate = _dot(g1, w4_ref[:], f32)
        # clip/compare in f32: Mosaic lacks bf16 cmp on this target
        trans = jnp.clip(cd * gate, -100.0, 100.0) * valid.astype(f32)
        agg = agg + m2.astype(f32)
        fsum = fsum + trans

    agg_ref[:] = agg.astype(cdt)
    fsum_ref[:] = fsum.astype(cdt)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(N, nf, H, mol_cat_ref, h_rows_ref, pos_rows_ref,
                mask_rows_ref, box_ref, W1a_ref, W1b_ref, w1r_ref, b1_ref,
                W2_ref, b2_ref, W3_ref, b3_ref, w4_ref,
                W1aT_ref, W1bT_ref, W2T_ref, W3T_ref, w4T_ref,
                dagg_ref, dfsum_ref,
                dh_rows_ref, dpos_rows_ref, dmol_ref, dW1a_ref, dW1b_ref,
                dw1r_ref, db1_ref, dW2_ref, db2_ref, dW3_ref, db3_ref,
                dw4_ref):
    cdt = h_rows_ref.dtype
    f32 = jnp.float32
    rows = h_rows_ref.shape[0]
    T = rows // N
    R = _replication_matrix(rows, T, N, f32)

    pos_rows = pos_rows_ref[:]                      # f32
    maskr = mask_rows_ref[:]                        # cdt
    i_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % N

    box_rows = _dot(R, box_ref[:], f32)
    inv_box = 1.0 / box_rows
    hi_c = (_dot(h_rows_ref[:], W1a_ref[:], cdt) + b1_ref[:])

    dagg = dagg_ref[:]
    dfsum = dfsum_ref[:]

    s_dz1 = jnp.zeros((rows, H), jnp.float32)
    dpos = jnp.zeros((rows, 3), jnp.float32)
    dW1b = jnp.zeros((nf, H), jnp.float32)
    dw1r = jnp.zeros((1, H), jnp.float32)
    dW2 = jnp.zeros((H, H), jnp.float32)
    db2 = jnp.zeros((1, H), jnp.float32)
    dW3 = jnp.zeros((H, H), jnp.float32)
    db3 = jnp.zeros((1, H), jnp.float32)
    dw4 = jnp.zeros((H, 1), jnp.float32)

    for j in range(N):
        # --- recompute forward for this neighbor slot -----------------
        rj = _dot(R, mol_cat_ref[j], f32)
        hj = rj[:, :nf].astype(cdt)
        pj = rj[:, nf:nf + 3]
        mj = rj[:, nf + 3:nf + 4].astype(cdt)
        cd = pos_rows - pj
        cd = cd - jnp.round(cd * inv_box) * box_rows
        r2 = (cd * cd).sum(axis=1, keepdims=True).astype(cdt)
        z1 = hi_c + _dot(hj, W1b_ref[:], cdt) + r2 * w1r_ref[:]
        m1 = _silu(z1)
        z2 = _dot(m1, W2_ref[:], cdt) + b2_ref[:]
        m2 = _silu(z2)
        valid = maskr * mj * (i_ids != j).astype(cdt)
        m2m = m2 * valid
        z3 = _dot(m2m, W3_ref[:], cdt) + b3_ref[:]
        g1 = _silu(z3)
        gate = _dot(g1, w4_ref[:], f32)
        trans_raw = cd * gate
        inside = ((trans_raw >= -100.0)
                  & (trans_raw <= 100.0)).astype(f32)     # f32 cmp (Mosaic)

        # --- reverse sweep ---------------------------------------------
        validf = valid.astype(f32)
        d_trans = dfsum.astype(f32) * inside * validf         # [rows, 3]
        d_gate = (cd * d_trans).sum(axis=1, keepdims=True)    # [rows, 1]
        d_cd = gate * d_trans
        d_g1 = _dot(d_gate.astype(cdt), w4T_ref[:], cdt)
        dz3 = d_g1 * _dsilu(z3)
        d_m2 = (_dot(dz3, W3T_ref[:], cdt) + dagg) * valid
        dz2 = d_m2 * _dsilu(z2)
        d_m1 = _dot(dz2, W2T_ref[:], cdt)
        dz1 = d_m1 * _dsilu(z1)
        d_r2 = (dz1 * w1r_ref[:]).sum(axis=1, keepdims=True)
        d_cd = d_cd + 2.0 * cd * d_r2.astype(f32)

        d_hj = _dot(dz1, W1bT_ref[:], cdt)
        s_dz1 = s_dz1 + dz1.astype(f32)
        dpos = dpos + d_cd
        dmol_ref[j] = jnp.concatenate(
            [_dot_t(R, d_hj.astype(f32)), _dot_t(R, -d_cd)], axis=1)
        dW1b = dW1b + _dot_t(hj, dz1)
        dw1r = dw1r + (r2.astype(f32)
                       * dz1.astype(f32)).sum(axis=0, keepdims=True)
        dW2 = dW2 + _dot_t(m1, dz2)
        db2 = db2 + dz2.astype(f32).sum(axis=0, keepdims=True)
        dW3 = dW3 + _dot_t(m2m, dz3)
        db3 = db3 + dz3.astype(f32).sum(axis=0, keepdims=True)
        dw4 = dw4 + _dot_t(g1, d_gate)

    dh_rows_ref[:] = _dot(s_dz1.astype(cdt), W1aT_ref[:], cdt)
    dpos_rows_ref[:] = dpos

    dW1a_j = _dot_t(h_rows_ref[:], s_dz1.astype(cdt))
    db1_j = s_dz1.sum(axis=0, keepdims=True)

    p = pl.program_id(0)

    @pl.when(p == 0)
    def _init():
        dW1a_ref[:] = jnp.zeros_like(dW1a_ref)
        dW1b_ref[:] = jnp.zeros_like(dW1b_ref)
        dw1r_ref[:] = jnp.zeros_like(dw1r_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dW2_ref[:] = jnp.zeros_like(dW2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dW3_ref[:] = jnp.zeros_like(dW3_ref)
        db3_ref[:] = jnp.zeros_like(db3_ref)
        dw4_ref[:] = jnp.zeros_like(dw4_ref)

    dW1a_ref[:] += dW1a_j
    dW1b_ref[:] += dW1b
    dw1r_ref[:] += dw1r
    db1_ref[:] += db1_j
    dW2_ref[:] += dW2
    db2_ref[:] += db2
    dW3_ref[:] += dW3
    db3_ref[:] += db3
    dw4_ref[:] += dw4


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------

def _prep(h, pos, box, mask_f, T):
    """Pad B to a multiple of T and build the kernel input layouts.

    ``pos``/``box`` and the j-major ``mol_cat`` stay f32 (in-kernel geometry
    is f32); ``h_rows``/``mask_rows`` carry the compute dtype.
    """
    B, N, nf = h.shape
    f32 = jnp.float32
    Bp = -(-B // T) * T
    if Bp != B:
        pad = [(0, Bp - B)] + [(0, 0)] * (h.ndim - 1)
        h = jnp.pad(h, pad)
        pos = jnp.pad(pos, [(0, Bp - B), (0, 0), (0, 0)])
        box = jnp.pad(box, [(0, Bp - B), (0, 0)], constant_values=1.0)
        mask_f = jnp.pad(mask_f, [(0, Bp - B), (0, 0)])
    mol_cat = jnp.concatenate(
        [h.astype(f32), pos, mask_f[..., None].astype(f32)], axis=-1)
    mol_cat = mol_cat.transpose(1, 0, 2)          # [N, Bp, nf+4] f32
    h_rows = h.reshape(Bp * N, nf)
    pos_rows = pos.reshape(Bp * N, 3)
    mask_rows = mask_f.reshape(Bp * N, 1)
    return mol_cat, h_rows, pos_rows, mask_rows, box, Bp


def _common_specs(T, N, nf, H, cdt):
    rows_blk = T * N
    in_specs = [
        pl.BlockSpec((N, T, nf + 4), lambda p: (0, p, 0)),   # mol_cat
        pl.BlockSpec((rows_blk, nf), lambda p: (p, 0)),      # h_rows
        pl.BlockSpec((rows_blk, 3), lambda p: (p, 0)),       # pos_rows
        pl.BlockSpec((rows_blk, 1), lambda p: (p, 0)),       # mask_rows
        pl.BlockSpec((T, 3), lambda p: (p, 0)),              # box
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
    return rows_blk, in_specs


def _split_params(W1, b1, nf):
    """Slice the concat-form first layer [2nf+1, H] into its h_i / h_j / r^2
    actions (values are identical to the concat dot)."""
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
    mol_cat, h_rows, pos_rows, mask_rows, box_p, Bp = _prep(
        h, pos, box, mask_f, T)
    rows_blk, in_specs = _common_specs(T, N, nf, H, cdt)
    grid = (Bp // T,)
    agg, fsum = pl.pallas_call(
        functools.partial(_fwd_kernel, N, nf, H),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((rows_blk, H), lambda p: (p, 0)),
            pl.BlockSpec((rows_blk, 3), lambda p: (p, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp * N, H), cdt),
            jax.ShapeDtypeStruct((Bp * N, 3), cdt),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(mol_cat, h_rows, pos_rows, mask_rows, box_p,
      W1a, W1b, w1r, b1, W2, b2, W3, b3, w4)
    agg = agg.reshape(Bp, N, H)[:B]
    fsum = fsum.reshape(Bp, N, 3)[:B]
    res = (h, pos, box, mask_f, W1a, W1b, w1r, b1, W2, b2, W3, b3, w4)
    return (agg, fsum), res


def _fused_bwd(shapes, res, cts):
    N, nf, H, T = shapes
    h, pos, box, mask_f, W1a, W1b, w1r, b1, W2, b2, W3, b3, w4 = res
    dagg, dfsum = cts
    cdt = h.dtype
    B = h.shape[0]
    mol_cat, h_rows, pos_rows, mask_rows, box_p, Bp = _prep(
        h, pos, box, mask_f, T)
    if Bp != B:
        dagg = jnp.pad(dagg, [(0, Bp - B), (0, 0), (0, 0)])
        dfsum = jnp.pad(dfsum, [(0, Bp - B), (0, 0), (0, 0)])
    dagg = dagg.astype(cdt).reshape(Bp * N, H)
    dfsum = dfsum.astype(cdt).reshape(Bp * N, 3)

    rows_blk, in_specs = _common_specs(T, N, nf, H, cdt)
    in_specs = in_specs + [
        pl.BlockSpec((H, nf), lambda p: (0, 0)),             # W1aT
        pl.BlockSpec((H, nf), lambda p: (0, 0)),             # W1bT
        pl.BlockSpec((H, H), lambda p: (0, 0)),              # W2T
        pl.BlockSpec((H, H), lambda p: (0, 0)),              # W3T
        pl.BlockSpec((1, H), lambda p: (0, 0)),              # w4T
        pl.BlockSpec((rows_blk, H), lambda p: (p, 0)),       # dagg
        pl.BlockSpec((rows_blk, 3), lambda p: (p, 0)),       # dfsum
    ]
    grid = (Bp // T,)
    const = lambda p: (0, 0)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, N, nf, H),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((rows_blk, nf), lambda p: (p, 0)),      # dh_rows
            pl.BlockSpec((rows_blk, 3), lambda p: (p, 0)),       # dpos_rows
            pl.BlockSpec((N, T, nf + 3), lambda p: (0, p, 0)),   # dmol
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
            jax.ShapeDtypeStruct((Bp * N, nf), cdt),
            jax.ShapeDtypeStruct((Bp * N, 3), jnp.float32),
            jax.ShapeDtypeStruct((N, Bp, nf + 3), jnp.float32),
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
    )(mol_cat, h_rows, pos_rows, mask_rows, box_p,
      W1a, W1b, w1r, b1, W2, b2, W3, b3, w4,
      W1a.T, W1b.T, W2.T, W3.T, w4.T, dagg, dfsum)
    (dh_rows, dpos_rows, dmol, dW1a, dW1b, dw1r, db1, dW2, db2, dW3, db3,
     dw4) = outs

    dmol = dmol.transpose(1, 0, 2)                 # [Bp, N, nf+3] f32
    dh = (dh_rows.reshape(Bp, N, nf).astype(jnp.float32)
          + dmol[..., :nf])[:B].astype(cdt)
    dpos = (dpos_rows.reshape(Bp, N, 3) + dmol[..., nf:nf + 3])[:B]
    z = jnp.zeros_like
    return (dh, dpos, z(box), z(mask_f),
            dW1a.astype(W1a.dtype), dW1b.astype(W1b.dtype),
            dw1r.astype(w1r.dtype), db1.astype(b1.dtype),
            dW2.astype(W2.dtype), db2.astype(b2.dtype),
            dW3.astype(W3.dtype), db3.astype(b3.dtype),
            dw4.astype(w4.dtype))


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_allpairs_edges(params, h, pos, box, atom_mask, mol_tile=None):
    """Fused all-pairs edge pipeline: aggregated messages and force sums.

    Args:
      params: EGCL param pytree (``nn.egcl.init_egcl``) — uses ``edge_nn``
        (concat-form first layer, split internally) and ``coord_nn``.
      h:    ``[B, N, nf]`` node features (compute dtype).
      pos:  ``[B, N, 3]`` positions (compute dtype).
      box:  ``[B, 3]`` periodic box (min-image applied in-kernel).
      atom_mask: ``[B, N]`` bool.

    Returns ``(agg [B,N,H], f_sum [B,N,3], count [B,N,1])`` matching the XLA
    path (``edge_messages`` + masked K-sums) in ``all_pairs`` mode.
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
