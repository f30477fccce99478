"""End-to-end numerical parity against an independent torch implementation.

These tests re-implement the reference's mathematics (EGCL message passing,
ArgMax dequantization, leapfrog flow step, Alchemical NLL — reference
``enflow/nn/egcl.py``, ``nn/argmax.py``, ``flow/dynamics.py``,
``flow/loss.py``) in torch *from the equations*, load the SAME parameters as
the JAX model, and compare outputs. This is the strongest available parity
oracle: two frameworks, one spec.

Conventions matched: edges (row=i, col=j) with messages aggregated to row;
coord_diff = pos_i - pos_j (min-image); scatter-sum for G, count-clamped
scatter-mean for F; ldj += Q.sum() per step (reference parity mode);
log_gaussian adds one global log(2*pi) per call.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from enflow_tpu.data.system import System
from enflow_tpu.data.neighbors import neighbors_with_diffs
from enflow_tpu.flow import FlowConfig, init_flow, forward
from enflow_tpu.flow.integrators import _lf_forward
from enflow_tpu.flow.loss import alchemical_nll
from enflow_tpu.nn.egcl import EGCLConfig, apply_egcl, init_egcl

torch.set_default_dtype(torch.float64)
DTYPE = jnp.float64


def t(x):
    return torch.from_numpy(np.asarray(x))


def torch_mlp(layers, x, final_act=False):
    """Apply our param pytree as a torch MLP with SiLU between layers."""
    for i, layer in enumerate(layers):
        x = x @ t(layer["w"])
        if "b" in layer:
            x = x + t(layer["b"])
        if i < len(layers) - 1 or final_act:
            x = torch.nn.functional.silu(x)
    return x


def torch_egcl(params, h, pos, box, r_cut):
    """Reference EGCL forward (egcl.py:57-93) on one molecule, edge-list
    formulation with torch scatter ops."""
    n = h.shape[0]
    rows, cols, diffs = [], [], []
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d = pos[i] - pos[j]
            d = d - torch.round(d / box) * box
            if float((d**2).sum()) < r_cut**2:
                rows.append(i)
                cols.append(j)
                diffs.append(d)
    rows_t = torch.tensor(rows)
    coord_diff = torch.stack(diffs)
    radial = (coord_diff**2).sum(dim=1, keepdim=True)

    edge_in = torch.cat([h[rows], h[cols], radial], dim=1)
    m = torch_mlp(params["edge_nn"], edge_in, final_act=True)

    # node model: scatter-sum
    agg = torch.zeros(n, m.shape[1])
    agg.index_add_(0, rows_t, m)
    G = torch_mlp(params["node_nn"], torch.cat([h, agg], dim=1))

    # force model: gated diffs, clamp, scatter-mean with count clamp
    gate = torch_mlp(params["coord_nn"], m)
    trans = torch.clamp(coord_diff * gate, -100, 100)
    F = torch.zeros(n, 3)
    F.index_add_(0, rows_t, trans)
    count = torch.zeros(n)
    count.index_add_(0, rows_t, torch.ones(len(rows)))
    F = F / count.clamp(min=1).unsqueeze(1)

    Q = torch_mlp(params["vel_scaling_nn"], h)
    return Q, F, G


def make_system(rng, B=2, N=6, nf=5, box_len=7.0, r_cut=3.0):
    idx = rng.integers(0, nf, size=(B, N))
    return System(
        h=jnp.asarray(np.eye(nf)[idx], DTYPE),
        g=jnp.asarray(rng.normal(size=(B, N, nf)) * 0.4, DTYPE),
        pos=jnp.asarray(rng.uniform(-box_len / 2, box_len / 2, (B, N, 3)), DTYPE),
        vel=jnp.asarray(rng.normal(size=(B, N, 3)) * 0.4, DTYPE),
        mask=jnp.ones((B, N), bool),
        box=jnp.full((B, 3), box_len, DTYPE),
        r_cut=jnp.full((B,), r_cut, DTYPE),
    )


def test_egcl_matches_torch():
    rng = np.random.default_rng(0)
    s = make_system(rng)
    cfg = EGCLConfig(node_nf=5, hidden_nf=16)
    params = init_egcl(jax.random.PRNGKey(0), cfg, DTYPE)

    nbrs, cd = neighbors_with_diffs(s.pos, s.box, s.mask, s.r_cut)
    Q, F, G = apply_egcl(params, cfg, s.h, cd, nbrs.idx, nbrs.mask, s.mask)

    for b in range(s.num_mols):
        Qt, Ft, Gt = torch_egcl(
            params, t(s.h[b]), t(s.pos[b]), t(s.box[b]), float(s.r_cut[b]))
        np.testing.assert_allclose(np.asarray(Q[b]), Qt.numpy(), atol=1e-12)
        np.testing.assert_allclose(np.asarray(F[b]), Ft.numpy(), atol=1e-12)
        np.testing.assert_allclose(np.asarray(G[b]), Gt.numpy(), atol=1e-12)


def test_lf_flow_step_matches_torch():
    """Full LF integrator (dynamics.py:10-21 semantics, core only) vs a torch
    transcription, including the per-step neighbor rebuild and PBC wrap."""
    rng = np.random.default_rng(1)
    s = make_system(rng, B=2, N=5)
    cfg = FlowConfig(n_iter=3, dt=0.07, egcl=EGCLConfig(node_nf=5, hidden_nf=8))
    params = init_flow(jax.random.PRNGKey(1), cfg, DTYPE)

    out, ldj, _ = _lf_forward(params, cfg, s)

    for b in range(s.num_mols):
        h = t(s.h[b]).clone()
        g = t(s.g[b]).clone()
        pos = t(s.pos[b]).clone()
        vel = t(s.vel[b]).clone()
        box = t(s.box[b])
        dt_ = cfg.dt
        ldj_t = 0.0
        for k in range(cfg.n_iter):
            net = jax.tree_util.tree_map(lambda x: x[k], params["networks"])
            Q, F, G = torch_egcl(net, h, pos, box, float(s.r_cut[b]))
            vel = torch.exp(Q) * vel + F * dt_
            g = g + G * dt_
            pos = pos + vel * dt_
            pos = pos - torch.round(pos / box) * box
            h = h + g * dt_
            ldj_t += float(Q.sum())
        np.testing.assert_allclose(np.asarray(out.pos[b]), pos.numpy(), atol=1e-10)
        np.testing.assert_allclose(np.asarray(out.vel[b]), vel.numpy(), atol=1e-10)
        np.testing.assert_allclose(np.asarray(out.h[b]), h.numpy(), atol=1e-10)
        np.testing.assert_allclose(np.asarray(out.g[b]), g.numpy(), atol=1e-10)
        assert float(ldj[b]) == pytest.approx(ldj_t, abs=1e-10)


def test_nll_matches_torch():
    """Alchemical NLL (loss.py:5-25) vs a torch transcription on the batch."""
    rng = np.random.default_rng(2)
    s = make_system(rng, B=3, N=5)
    kBT, soft, zlj = 0.83, 0.1, 10.0
    ldj_vec = jnp.asarray(rng.normal(size=(3,)), DTYPE)

    got = float(alchemical_nll(s, ldj_vec, kBT, soft, zlj,
                               num_log_gaussian_calls=2))

    H = torch.zeros(())
    for b in range(3):
        pos = t(s.pos[b])
        dist_sq = torch.triu(
            ((pos.unsqueeze(1) - pos) ** 2).sum(dim=2))
        r_sq = dist_sq[dist_sq != 0] + soft
        H = H + 4 * (1 / r_sq**6 - 1 / r_sq**3).sum()
    H = H + 0.5 * (t(s.vel) ** 2).sum()
    num_atoms = 15
    logZ = -num_atoms * (math.log(zlj) - 1.5 * math.log(2 * math.pi / kBT))
    lg = lambda z: -0.5 * ((z**2).sum() + math.log(2 * math.pi))
    log_px = (-H / kBT + logZ + float(ldj_vec.sum())
              + lg(t(s.h)) + lg(t(s.g)))
    expect = float(-log_px / 3)
    assert got == pytest.approx(expect, rel=1e-12)


def test_argmax_matches_torch():
    """ArgMax dequantizer (argmax.py:14-26) vs torch with identical noise."""
    from enflow_tpu.nn import argmax as am

    rng = np.random.default_rng(3)
    nf = 4
    h = jnp.asarray(np.eye(nf)[rng.integers(0, nf, size=(2, 5))], DTYPE)
    mask = jnp.ones((2, 5), bool)
    params = am.init_argmax(jax.random.PRNGKey(3), nf, 8, DTYPE)
    key = jax.random.PRNGKey(4)
    z, log_q = am.forward(params, h, mask, key)

    eps = t(jax.random.normal(key, h.shape, DTYPE))
    ht = t(h)
    net_out = torch_mlp(params["network"], ht)
    log_scale, translate = torch.chunk(net_out, 2, dim=-1)
    u = translate + eps * log_scale.exp()
    T = (ht * u).sum(-1, keepdim=True)
    z_t = ht * u + (1 - ht) * (T - torch.nn.functional.softplus(T - u))
    np.testing.assert_allclose(np.asarray(z), z_t.numpy(), atol=1e-12)

    for b in range(2):
        lq = (-0.5 * ((u[b] ** 2).sum() + math.log(2 * math.pi))
              - log_scale[b].sum())
        ldj_b = ((1 - ht[b])
                 * torch.nn.functional.logsigmoid(T[b] - u[b])).sum()
        assert float(log_q[b]) == pytest.approx(float(lq - ldj_b), abs=1e-10)
