import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enflow_tpu.data.neighbors import neighbor_list, coord_diffs
from enflow_tpu.nn import argmax as argmax_deq
from enflow_tpu.nn import floor as floor_deq
from enflow_tpu.nn.egcl import EGCLConfig, init_egcl, apply_egcl
from enflow_tpu.nn.mlp import apply_mlp, apply_linear, silu
from enflow_tpu.utils.helpers import (
    unsorted_segment_mean,
    unsorted_segment_sum,
)

DTYPE = jnp.float64


def setup_inputs(rng, B=2, N=6, nf=4, pad=None, box_len=1e6, r_cut=1e5):
    """Huge box => min-image is identity => clean equivariance checks."""
    pos = rng.normal(size=(B, N, 3)) * 2.0
    h = rng.normal(size=(B, N, nf))
    mask = np.ones((B, N), dtype=bool)
    if pad:
        for b, p in enumerate(pad):
            mask[b, N - p:] = False
    pos[~mask] = 0.0
    h[~mask] = 0.0
    return (
        jnp.asarray(h, DTYPE),
        jnp.asarray(pos, DTYPE),
        jnp.asarray(mask),
        jnp.full((B, 3), box_len, DTYPE),
        jnp.full((B,), r_cut, DTYPE),
    )


def run_egcl(params, cfg, h, pos, mask, box, r_cut, capacity=None):
    nbrs = neighbor_list(pos, box, mask, r_cut, capacity)
    cd = coord_diffs(pos, box, nbrs)
    return apply_egcl(params, cfg, h, cd, nbrs.idx, nbrs.mask, mask)


def test_egcl_equivariance():
    rng = np.random.default_rng(0)
    h, pos, mask, box, r_cut = setup_inputs(rng)
    cfg = EGCLConfig(node_nf=4, hidden_nf=8)
    params = init_egcl(jax.random.PRNGKey(0), cfg, DTYPE)

    Q, F, G = run_egcl(params, cfg, h, pos, mask, box, r_cut)

    # random rotation
    A = np.random.default_rng(1).normal(size=(3, 3))
    R, _ = np.linalg.qr(A)
    R = jnp.asarray(R, DTYPE)
    t = jnp.asarray([1.3, -0.7, 2.1], DTYPE)

    Q2, F2, G2 = run_egcl(params, cfg, h, pos @ R.T + t, mask, box, r_cut)

    np.testing.assert_allclose(np.asarray(Q2), np.asarray(Q), atol=1e-10)
    np.testing.assert_allclose(np.asarray(G2), np.asarray(G), atol=1e-10)
    np.testing.assert_allclose(np.asarray(F2), np.asarray(F @ R.T), atol=1e-10)


def test_egcl_padding_invariance():
    rng = np.random.default_rng(2)
    h, pos, mask, box, r_cut = setup_inputs(rng, B=1, N=5)
    cfg = EGCLConfig(node_nf=4, hidden_nf=8)
    params = init_egcl(jax.random.PRNGKey(1), cfg, DTYPE)
    Q, F, G = run_egcl(params, cfg, h, pos, mask, box, r_cut)

    # same molecule padded with 3 fake atoms
    def pad(x, n):
        w = [(0, 0)] * x.ndim
        w[1] = (0, n)
        return jnp.pad(x, w)

    Qp, Fp, Gp = run_egcl(params, cfg, pad(h, 3), pad(pos, 3), pad(mask, 3),
                          box, r_cut)
    np.testing.assert_allclose(np.asarray(Qp[:, :5]), np.asarray(Q), atol=1e-12)
    np.testing.assert_allclose(np.asarray(Fp[:, :5]), np.asarray(F), atol=1e-12)
    np.testing.assert_allclose(np.asarray(Gp[:, :5]), np.asarray(G), atol=1e-12)
    assert np.allclose(np.asarray(Qp[:, 5:]), 0.0)
    assert np.allclose(np.asarray(Fp[:, 5:]), 0.0)
    assert np.allclose(np.asarray(Gp[:, 5:]), 0.0)


def test_egcl_dense_vs_topk():
    rng = np.random.default_rng(3)
    h, pos, mask, box, r_cut = setup_inputs(rng, B=2, N=7, pad=[0, 2])
    cfg = EGCLConfig(node_nf=4, hidden_nf=8)
    params = init_egcl(jax.random.PRNGKey(2), cfg, DTYPE)
    dense = run_egcl(params, cfg, h, pos, mask, box, r_cut)
    topk = run_egcl(params, cfg, h, pos, mask, box, r_cut, capacity=6)
    for a, b in zip(dense, topk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_egcl_matches_edge_list_reference():
    """Cross-check dense masked EGCL against an independent edge-list
    implementation using segment ops (the reference's computational pattern,
    egcl.py:57-93)."""
    rng = np.random.default_rng(4)
    h, pos, mask, box, r_cut = setup_inputs(rng, B=1, N=6, box_len=6.0, r_cut=2.8)
    cfg = EGCLConfig(node_nf=4, hidden_nf=8)
    params = init_egcl(jax.random.PRNGKey(3), cfg, DTYPE)
    Q, F, G = run_egcl(params, cfg, h, pos, mask, box, r_cut)

    # build edge list by brute force (min-image)
    p = np.asarray(pos[0])
    bx = np.asarray(box[0])
    rows, cols, diffs = [], [], []
    for i in range(6):
        for j in range(6):
            if i == j:
                continue
            d = p[i] - p[j]
            d = d - np.round(d / bx) * bx
            if (d**2).sum() < float(r_cut[0]) ** 2:
                rows.append(i)
                cols.append(j)
                diffs.append(d)
    rows = jnp.asarray(rows)
    cols = jnp.asarray(cols)
    cd = jnp.asarray(np.stack(diffs), DTYPE)
    radial = (cd**2).sum(-1, keepdims=True)

    h0 = h[0]
    edge_in = jnp.concatenate([h0[rows], h0[cols], radial], axis=-1)
    m = apply_mlp(params["edge_nn"], edge_in, final_act=silu)
    agg = unsorted_segment_sum(m, rows, 6)
    G_ref = apply_mlp(params["node_nn"], jnp.concatenate([h0, agg], axis=-1))
    gate = apply_linear(params["coord_nn"][1],
                        silu(apply_linear(params["coord_nn"][0], m)))
    F_ref = unsorted_segment_mean(jnp.clip(cd * gate, -100, 100), rows, 6)
    Q_ref = apply_mlp(params["vel_scaling_nn"], h0)

    np.testing.assert_allclose(np.asarray(Q[0]), np.asarray(Q_ref), atol=1e-12)
    np.testing.assert_allclose(np.asarray(G[0]), np.asarray(G_ref), atol=1e-12)
    np.testing.assert_allclose(np.asarray(F[0]), np.asarray(F_ref), atol=1e-12)


def test_argmax_roundtrip_and_logq():
    rng = np.random.default_rng(5)
    B, N, nf = 3, 5, 4
    idx = rng.integers(0, nf, size=(B, N))
    h = np.eye(nf)[idx]
    mask = np.ones((B, N), dtype=bool)
    mask[1, 3:] = False
    h[~mask] = 0.0
    h = jnp.asarray(h, DTYPE)
    maskj = jnp.asarray(mask)

    params = argmax_deq.init_argmax(jax.random.PRNGKey(4), nf, 8, DTYPE)
    z, log_q = argmax_deq.forward(params, h, maskj, jax.random.PRNGKey(5))

    assert log_q.shape == (B,)
    assert np.isfinite(np.asarray(log_q)).all()
    # padded rows must be exactly zero
    assert np.allclose(np.asarray(z)[~mask], 0.0)
    # re-quantization recovers the one-hot exactly
    h_rec = argmax_deq.reverse(z, maskj)
    np.testing.assert_allclose(np.asarray(h_rec), np.asarray(h), atol=0)


def test_argmax_logq_manual():
    """log_q formula parity vs a direct numpy transcription of the reference
    math (argmax.py:14-26) on a single unpadded molecule."""
    nf = 3
    h = jnp.asarray(np.eye(nf)[[0, 2]], DTYPE)[None]  # [1,2,3]
    mask = jnp.ones((1, 2), bool)
    params = argmax_deq.init_argmax(jax.random.PRNGKey(6), nf, 4, DTYPE)
    key = jax.random.PRNGKey(7)
    z, log_q = argmax_deq.forward(params, h, mask, key)

    # replay with the same noise
    net_out = np.asarray(apply_mlp(params["network"], h))
    log_scale, translate = np.split(net_out, 2, axis=-1)
    eps = np.asarray(jax.random.normal(key, h.shape, DTYPE))
    u = translate + eps * np.exp(log_scale)
    lg = -0.5 * ((u**2).sum() + math.log(2 * math.pi))
    expect = lg - log_scale.sum()
    T = (np.asarray(h) * u).sum(-1, keepdims=True)
    softplus = np.log1p(np.exp(-np.abs(T - u))) + np.maximum(T - u, 0)
    z_ref = np.asarray(h) * u + (1 - np.asarray(h)) * (T - softplus)
    logsig = -(np.log1p(np.exp(-np.abs(T - u))) + np.maximum(-(T - u), 0))
    expect -= ((1 - np.asarray(h)) * logsig).sum()

    np.testing.assert_allclose(np.asarray(z), z_ref, atol=1e-12)
    assert float(log_q[0]) == pytest.approx(float(expect), abs=1e-10)


def test_floor_roundtrip():
    rng = np.random.default_rng(8)
    h = jnp.asarray(rng.integers(0, 5, size=(2, 4, 3)), DTYPE)
    mask = jnp.ones((2, 4), bool)
    z, ldj = floor_deq.forward(1.0, h, mask, jax.random.PRNGKey(9))
    assert ldj.shape == (2,) and (np.asarray(ldj) == 0).all()
    np.testing.assert_allclose(np.asarray(floor_deq.reverse(z, mask)),
                               np.asarray(h))
    # the scale is static config, NOT a trainable parameter: log_q = 0 is
    # only correct for a fixed scale, and a trained scale > 1 would break
    # the floor inverse
    assert floor_deq.init_floor() == {}


def test_pallas_v1_rejects_variant_flags():
    """use_pallas='v1' must fail loudly with attention/norm_diff/tanh, not
    silently benchmark the XLA fallback (same contract as the v2 kernel)."""
    cfg = EGCLConfig(node_nf=3, hidden_nf=8, attention=True, use_pallas=True)
    params = init_egcl(jax.random.PRNGKey(0), cfg, DTYPE)
    h = jnp.zeros((1, 4, 3), DTYPE)
    cd = jnp.zeros((1, 4, 4, 3), DTYPE)
    idx = jnp.zeros((1, 4, 4), jnp.int32)
    m = jnp.ones((1, 4, 4), bool)
    with pytest.raises(ValueError, match="use_pallas"):
        apply_egcl(params, cfg, h, cd, idx, m, jnp.ones((1, 4), bool))
