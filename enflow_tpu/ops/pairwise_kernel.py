"""Pallas blockwise pairwise LJ energy + analytic forces (TPU).

The dense pairwise energies materialize ``[N, N]`` intermediates in HBM —
the NLL's softened LJ (``flow/loss.py:lj_potential``, reference
``enflow/flow/loss.py:14``) and the MD/sampler potential
(``sim/potentials.py``) both hit O(N^2) *memory*, which caps single-chip
system size around N ~ 3*10^4 in f32 (several N^2 temporaries) long before
compute does. This kernel tiles the pair sum: each grid program owns a row
tile of T atoms, loops over column tiles of the full position array held in
VMEM, and accumulates

    energy_partial [per row tile]   (ordered pairs, halved at the end)
    dE/dx_i        [T, 3]           (full analytic row gradient)

so HBM traffic is O(N) per tile — O(N^2/T) total instead of O(N^2) — and
peak memory is O(N). The gradient comes out of the same pass; a custom VJP
turns it into the backward rule, so ``jax.grad`` (forces, NLL training)
never builds an O(N^2) residual either.

Two pair forms, matching the two dense reference formulas exactly:
  - 'r2' (alchemical/NLL): ``4*((d2+s)^-6 - (d2+s)^-3)``, no PBC, no
    cutoff, zero-distance pairs excluded (loss.py:15 semantics).
  - 'r' (MD/simulated): ``4*((1/(s+r))^12 - (1/(s+r))^6)`` with min-image
    PBC and radial cutoff (reference ``enflow/data/lj.py:65-76`` formula).

Like ``ops/edge_kernel.py``, runs in interpret mode off-TPU so the CPU test
suite pins numerics against the dense implementations.

Measured (v5e, f32, grad incl. fwd): N=16384 7.6 ms (dense XLA 8.6 ms);
N=65536 94.5 ms = 45 GPair/s, where the dense path cannot run at all (a
single [N, N] f32 is 17 GB > HBM). Opt-in via ``training.loss
.pallas_pairwise`` in the driver or the drop-in functions below.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512   # atoms per row/column tile (v5e sweep: 512 beats 256 ~25%;
             # 1024 exceeds VMEM)


def _pair_terms(d2, softening, form):
    """Pair energy e(d2) and its derivative de/dd2 for valid pairs."""
    if form == "r2":
        a = 1.0 / (d2 + softening)
        a3 = a * a * a
        a6 = a3 * a3
        e = 4.0 * (a6 - a3)
        de_dd2 = 4.0 * (-6.0 * a6 * a + 3.0 * a3 * a)
    elif form == "r":
        r = jnp.sqrt(d2)
        inv = 1.0 / (softening + r)
        inv6 = (inv * inv * inv) ** 2
        inv12 = inv6 * inv6
        e = 4.0 * (inv12 - inv6)
        de_dr = 4.0 * (-12.0 * inv12 * inv + 6.0 * inv6 * inv)
        de_dd2 = de_dr / (2.0 * r)
    else:  # pragma: no cover
        raise ValueError(form)
    return e, de_dd2


def _kernel(pos_row, mask_row, pos_all, mask_all, box_ref, e_ref, g_ref, *,
            form, softening, cutoff, use_pbc, n_tiles):
    rows = pos_row[0]                                   # [T, 3]
    mrow = mask_row[0, :, 0]                            # [T]
    T = rows.shape[0]
    b_id = pl.program_id(0)

    def col(t, carry):
        acc_e, acc_g = carry
        cols = pos_all[0, pl.ds(t * T, T), :]           # [T, 3]
        mcol = mask_all[0, pl.ds(t * T, T), 0]          # [T]
        d = []
        for k in range(3):
            dk = rows[:, k:k + 1] - cols[:, k:k + 1].T  # [T, T]
            if use_pbc:
                bk = box_ref[b_id, k]
                dk = dk - jnp.round(dk / bk) * bk
            d.append(dk)
        d2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        valid = mrow[:, None] * mcol[None, :]
        valid = valid * (d2 > 0.0)                      # self/coincident out
        if cutoff is not None:
            valid = valid * (d2 < cutoff * cutoff)
        d2s = jnp.where(valid > 0.0, d2, 1.0)           # guarded eval
        e, de_dd2 = _pair_terms(d2s, softening, form)
        e = jnp.where(valid > 0.0, e, 0.0)
        de_dd2 = jnp.where(valid > 0.0, de_dd2, 0.0)
        acc_e = acc_e + e.sum(axis=1, keepdims=True)    # per-row [T, 1]
        # dE_total/dx_i = sum_j de/dd2 * 2 * (x_i - x_j)  (per component)
        gcols = [(de_dd2 * 2.0 * d[k]).sum(axis=1, keepdims=True)
                 for k in range(3)]
        acc_g = acc_g + jnp.concatenate(gcols, axis=1)
        return acc_e, acc_g

    zero_e = jnp.zeros((T, 1), rows.dtype)
    zero_g = jnp.zeros((T, 3), rows.dtype)
    acc_e, acc_g = jax.lax.fori_loop(0, n_tiles, col, (zero_e, zero_g))
    e_ref[0] = 0.5 * acc_e                              # ordered -> i<j
    g_ref[0] = acc_g


def _run_kernel(pos, mask_f, box, *, form, softening, cutoff, use_pbc):
    """pos [B, Np, 3] (Np multiple of TILE), mask_f [B, Np] float,
    box [B, 3]. Returns (energy [B], dE/dpos [B, Np, 3])."""
    B, Np, _ = pos.shape
    G = Np // TILE
    mask3 = mask_f[..., None]          # Mosaic tiling: trailing unit lane dim
    kern = functools.partial(_kernel, form=form, softening=softening,
                             cutoff=cutoff, use_pbc=use_pbc, n_tiles=G)
    e_tiles, grads = pl.pallas_call(
        kern,
        grid=(B, G),
        in_specs=[
            pl.BlockSpec((1, TILE, 3), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, TILE, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Np, 3), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Np, 1), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((B, 3), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, TILE, 3), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, 1), pos.dtype),
            jax.ShapeDtypeStruct((B, Np, 3), pos.dtype),
        ],
        interpret=jax.default_backend() != "tpu",
    )(pos, mask3, pos, mask3, box)
    return e_tiles[..., 0].sum(axis=1), grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _pair_energy(pos, mask_f, box, form, softening, cutoff, use_pbc):
    e, _ = _run_kernel(pos, mask_f, box, form=form, softening=softening,
                       cutoff=cutoff, use_pbc=use_pbc)
    return e


def _pe_fwd(pos, mask_f, box, form, softening, cutoff, use_pbc):
    e, g = _run_kernel(pos, mask_f, box, form=form, softening=softening,
                       cutoff=cutoff, use_pbc=use_pbc)
    return e, g


def _pe_bwd(form, softening, cutoff, use_pbc, g, ct):
    return ct[:, None, None] * g, None, None


_pair_energy.defvjp(_pe_fwd, _pe_bwd)


def _pad(pos, mask, box):
    B, N = mask.shape
    Np = -(-N // TILE) * TILE
    mask_f = mask.astype(pos.dtype)
    if Np != N:
        pos = jnp.pad(pos, ((0, 0), (0, Np - N), (0, 0)))
        mask_f = jnp.pad(mask_f, ((0, 0), (0, Np - N)))
    if box is None:
        box = jnp.ones((B, 3), pos.dtype)
    return pos, mask_f, box


def pallas_lj_potential(pos, mask, softening):
    """Blockwise NLL pairwise term: drop-in for ``flow.loss.lj_potential``
    (``[B, N, 3]`` -> ``[B]``), O(N) memory, analytic custom-VJP gradient."""
    pos_p, mask_f, box = _pad(pos, mask, None)
    return _pair_energy(pos_p, mask_f, box, "r2", float(softening), None,
                        False)


def pallas_softened_lj_energy(pos, box, softening, cutoff, mask=None):
    """Blockwise MD potential: drop-in for ``sim.potentials
    .softened_lj_energy`` (single molecule ``[N, 3]`` -> scalar)."""
    if mask is None:
        mask = jnp.ones(pos.shape[:1], bool)
    pos_p, mask_f, box_b = _pad(pos[None], mask[None],
                                jnp.asarray(box)[None].astype(pos.dtype))
    return _pair_energy(pos_p, mask_f, box_b, "r", float(softening),
                        float(cutoff), True)[0]
