"""Parity tests for the fused all-pairs EGCL kernels (ops/egcl_fused.py v2,
ops/egcl_fused_v3.py v3 — parametrized over both).

Runs the actual Pallas kernel code in interpret mode on CPU, comparing
values and gradients against the XLA reference path (``apply_egcl`` on the
``all_pairs`` neighbor list).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enflow_tpu.data.neighbors import neighbors_with_diffs
from enflow_tpu.nn.egcl import (EGCLConfig, init_egcl, apply_egcl,
                                apply_egcl_fused_allpairs)

B, N, NF, H = 6, 5, 4, 16
TILE = 16


def _setup(dtype=jnp.float32, seed=0, pbc=False):
    cfg = EGCLConfig(node_nf=NF, hidden_nf=H)
    params = init_egcl(jax.random.PRNGKey(seed), cfg, jnp.float32)
    ks = jax.random.split(jax.random.PRNGKey(seed + 1), 3)
    h = jax.random.normal(ks[0], (B, N, NF), dtype)
    if pbc:
        box = jnp.full((B, 3), 2.5, dtype)
        pos = jax.random.uniform(ks[1], (B, N, 3), dtype, -3.0, 3.0)
        r_cut = jnp.full((B,), 10.0, dtype)
    else:
        box = jnp.full((B, 3), 1e3, dtype)
        pos = jax.random.normal(ks[1], (B, N, 3), dtype)
        r_cut = jnp.full((B,), 1e2, dtype)
    mask = jnp.ones((B, N), bool)
    # padded atoms on some molecules
    mask = mask.at[0, -1].set(False).at[3, -2:].set(False)
    h = jnp.where(mask[..., None], h, 0.0)
    pos = jnp.where(mask[..., None], pos, 0.0)
    return cfg, params, h, pos, box, r_cut, mask


def _xla_qfg(params, cfg, h, pos, box, r_cut, mask):
    nbrs, cd = neighbors_with_diffs(pos, box, mask, r_cut,
                                    mode="all_pairs")
    return apply_egcl(params, cfg, h, cd, nbrs.idx, nbrs.mask, mask,
                      all_pairs=True)


@pytest.mark.parametrize("kernel", ["v2", "v3"])
@pytest.mark.parametrize("pbc", [False, True])
def test_fused_matches_xla_f32(pbc, kernel):
    cfg, params, h, pos, box, r_cut, mask = _setup(pbc=pbc)
    Qx, Fx, Gx = _xla_qfg(params, cfg, h, pos, box, r_cut, mask)
    Qf, Ff, Gf = apply_egcl_fused_allpairs(params, cfg, h, pos, box, mask,
                                           mol_tile=TILE, kernel=kernel)
    np.testing.assert_allclose(Qf, Qx, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(Ff, Fx, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(Gf, Gx, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("kernel", ["v2", "v3"])
def test_fused_grads_match_xla_f32(kernel):
    cfg, params, h, pos, box, r_cut, mask = _setup()
    w = [jax.random.normal(jax.random.PRNGKey(9 + i), s)
         for i, s in enumerate([(B, N, 1), (B, N, 3), (B, N, NF)])]

    def loss_xla(params, h, pos):
        Q, F, G = _xla_qfg(params, cfg, h, pos, box, r_cut, mask)
        return (Q * w[0]).sum() + (F * w[1]).sum() + (G * w[2]).sum()

    def loss_fused(params, h, pos):
        Q, F, G = apply_egcl_fused_allpairs(params, cfg, h, pos, box, mask,
                                            mol_tile=TILE, kernel=kernel)
        return (Q * w[0]).sum() + (F * w[1]).sum() + (G * w[2]).sum()

    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(params, h, pos)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(params, h, pos)
    flat_x, _ = jax.tree_util.tree_flatten(gx)
    flat_f, tree_f = jax.tree_util.tree_flatten(gf)
    assert len(flat_x) == len(flat_f)
    for a, b in zip(flat_f, flat_x):
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-6)


@pytest.mark.parametrize("kernel", ["v2", "v3"])
def test_fused_bf16_close(kernel):
    cfg, params, h, pos, box, r_cut, mask = _setup()
    cfg = EGCLConfig(node_nf=NF, hidden_nf=H, compute_dtype="bfloat16")
    Qx, Fx, Gx = _xla_qfg(params, cfg, h, pos, box, r_cut, mask)
    Qf, Ff, Gf = apply_egcl_fused_allpairs(params, cfg, h, pos, box, mask,
                                           mol_tile=TILE, kernel=kernel)
    for a, b in [(Qf, Qx), (Ff, Fx), (Gf, Gx)]:
        assert a.dtype == b.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.15, atol=0.05)


@pytest.mark.parametrize("kernel", ["v2", "v3"])
def test_fused_bf16_grads_close(kernel):
    """Backward kernel under compute_dtype='bfloat16' (the documented
    wide-hidden production regime) tracks the XLA bf16 path."""
    cfg, params, h, pos, box, r_cut, mask = _setup()
    cfg = EGCLConfig(node_nf=NF, hidden_nf=H, compute_dtype="bfloat16")

    def loss(qfg):
        Q, F, G = qfg
        return (Q**2).sum() + (F**2).sum() + (G**2).sum()

    gx = jax.grad(lambda p_, h_, x_: loss(
        _xla_qfg(p_, cfg, h_, x_, box, r_cut, mask)),
        argnums=(0, 1, 2))(params, h, pos)
    gf = jax.grad(lambda p_, h_, x_: loss(
        apply_egcl_fused_allpairs(p_, cfg, h_, x_, box, mask,
                                  mol_tile=TILE, kernel=kernel)),
        argnums=(0, 1, 2))(params, h, pos)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gx)):
        scale = max(float(jnp.abs(b).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0.2, atol=0.05)


@pytest.mark.parametrize("kernel", ["v2", "v3"])
def test_fused_rejects_unsupported_config(kernel):
    cfg, params, h, pos, box, r_cut, mask = _setup()
    cfg_att = EGCLConfig(node_nf=NF, hidden_nf=H, attention=True)
    with pytest.raises(ValueError, match="attention"):
        apply_egcl_fused_allpairs(params, cfg_att, h, pos, box, mask,
                                  kernel=kernel)
    cfg_f64 = EGCLConfig(node_nf=NF, hidden_nf=H)
    with pytest.raises(ValueError, match="float64"):
        apply_egcl_fused_allpairs(
            jax.tree_util.tree_map(lambda x: x.astype(jnp.float64), params),
            cfg_f64, h.astype(jnp.float64), pos.astype(jnp.float64),
            box.astype(jnp.float64), mask, kernel=kernel)


@pytest.mark.parametrize("kernel", ["v2", "v3"])
def test_fused_in_flow_forward_reverse(kernel):
    """Flow-level dispatch: use_pallas='v2'/'v3' + all_pairs routes to the
    fused raw-state kernel and stays exactly invertible."""
    from enflow_tpu.flow import FlowConfig, init_flow, forward_core, \
        reverse_core
    from enflow_tpu.data.system import System

    cfg = FlowConfig(
        n_iter=2, dt=0.05,
        egcl=EGCLConfig(node_nf=NF, hidden_nf=H, use_pallas=kernel),
        nbr_mode="all_pairs")
    params = init_flow(jax.random.PRNGKey(0), cfg, jnp.float32)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    f32 = jnp.float32    # kernel computes in <= f32 (rejects f64 inputs)
    mask = jnp.ones((B, N), bool).at[1, -1].set(False)
    sys = System(
        h=jax.random.normal(ks[0], (B, N, NF), f32) * mask[..., None],
        g=jax.random.normal(ks[1], (B, N, NF), f32) * mask[..., None],
        pos=jax.random.normal(ks[2], (B, N, 3), f32) * mask[..., None],
        vel=jax.random.normal(ks[3], (B, N, 3), f32) * mask[..., None],
        mask=mask, box=jnp.full((B, 3), 1e3, f32),
        r_cut=jnp.full((B,), 1e2, f32))

    out, ldj = jax.jit(lambda s: forward_core(params, cfg, s))(sys)
    back, ldj_r = jax.jit(lambda s: reverse_core(params, cfg, s))(out)
    np.testing.assert_allclose(back.pos, sys.pos, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(back.h, sys.h, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ldj_r, -ldj, rtol=1e-4, atol=1e-5)

    # parity of the whole flow vs the XLA path
    cfg_x = FlowConfig(n_iter=2, dt=0.05,
                       egcl=EGCLConfig(node_nf=NF, hidden_nf=H),
                       nbr_mode="all_pairs")
    out_x, ldj_x = jax.jit(lambda s: forward_core(params, cfg_x, s))(sys)
    np.testing.assert_allclose(out.pos, out_x.pos, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(ldj, ldj_x, rtol=1e-4, atol=1e-6)
