"""Fused Pallas edge pipeline vs the XLA reference path (interpret mode on
CPU; the same code compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enflow_tpu.data.neighbors import neighbors_with_diffs
from enflow_tpu.nn.egcl import EGCLConfig, init_egcl, apply_egcl

DTYPE = jnp.float32  # kernel path is f32/bf16; f32 here for tight tolerances


def setup(rng, B=4, N=6, nf=4, H=16, pad=None):
    pos = rng.normal(size=(B, N, 3)).astype(np.float32) * 1.5
    h = rng.normal(size=(B, N, nf)).astype(np.float32)
    mask = np.ones((B, N), dtype=bool)
    if pad:
        for b, p in enumerate(pad):
            mask[b, N - p:] = False
    pos[~mask] = 0.0
    h[~mask] = 0.0
    return (jnp.asarray(h), jnp.asarray(pos), jnp.asarray(mask),
            jnp.full((B, 3), 1e4, DTYPE), jnp.full((B,), 1e3, DTYPE))


def run(params, cfg, h, pos, mask, box, r_cut, mode="all_pairs"):
    nbrs, cd = neighbors_with_diffs(pos, box, mask, r_cut, mode=mode)
    return apply_egcl(params, cfg, h, cd, nbrs.idx, nbrs.mask, mask)


@pytest.mark.parametrize("pad", [None, [0, 2, 1, 0]])
@pytest.mark.parametrize("mode", ["all_pairs", "dense"])
def test_fused_forward_matches_xla(pad, mode):
    rng = np.random.default_rng(0)
    h, pos, mask, box, r_cut = setup(rng, pad=pad)
    cfg_x = EGCLConfig(node_nf=4, hidden_nf=16)
    cfg_p = EGCLConfig(node_nf=4, hidden_nf=16, use_pallas=True)
    params = init_egcl(jax.random.PRNGKey(0), cfg_x, DTYPE)

    ref = run(params, cfg_x, h, pos, mask, box, r_cut, mode)
    fused = run(params, cfg_p, h, pos, mask, box, r_cut, mode)
    for a, b, name in zip(fused, ref, "QFG"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   err_msg=name)


def test_fused_grads_match_xla():
    rng = np.random.default_rng(1)
    h, pos, mask, box, r_cut = setup(rng, pad=[0, 1, 0, 2])
    cfg_x = EGCLConfig(node_nf=4, hidden_nf=16)
    cfg_p = EGCLConfig(node_nf=4, hidden_nf=16, use_pallas=True)
    params = init_egcl(jax.random.PRNGKey(1), cfg_x, DTYPE)

    def loss(params, pos, h, cfg):
        Q, F, G = run(params, cfg, h, pos, mask, box, r_cut)
        return (Q**2).sum() + (F * F).sum() + jnp.abs(G).sum()

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(params, pos, h, cfg_x)
    g_fused = jax.grad(loss, argnums=(0, 1, 2))(params, pos, h, cfg_p)

    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_fused = jax.tree_util.tree_leaves(g_fused)
    assert len(flat_ref) == len(flat_fused)
    for a, b in zip(flat_fused, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4,
                                   rtol=2e-3)


def test_fused_in_full_flow():
    """Fused kernel inside the integrator: invertibility must hold."""
    from enflow_tpu.data.system import System
    from enflow_tpu.flow import FlowConfig, init_flow, forward, reverse

    rng = np.random.default_rng(2)
    B, N, nf = 3, 5, 4
    idx = rng.integers(0, nf, size=(B, N))
    s = System(h=jnp.asarray(np.eye(nf)[idx], DTYPE),
               g=jnp.asarray(rng.normal(size=(B, N, nf)) * 0.3, DTYPE),
               pos=jnp.asarray(rng.normal(size=(B, N, 3)), DTYPE),
               vel=jnp.asarray(rng.normal(size=(B, N, 3)) * 0.3, DTYPE),
               mask=jnp.ones((B, N), bool),
               box=jnp.full((B, 3), 1e4, DTYPE),
               r_cut=jnp.full((B,), 1e3, DTYPE))
    cfg = FlowConfig(n_iter=2, dt=0.05,
                     egcl=EGCLConfig(node_nf=nf, hidden_nf=16,
                                     use_pallas=True),
                     nbr_mode="all_pairs")
    params = init_flow(jax.random.PRNGKey(2), cfg, DTYPE)
    out, ldj = forward(params, cfg, s, jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(ldj)).all()
    back = reverse(params, cfg, out)
    np.testing.assert_allclose(np.asarray(back.pos), np.asarray(s.pos),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(back.h), np.asarray(s.h), atol=0)
