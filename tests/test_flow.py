import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enflow_tpu.data.system import System
from enflow_tpu.flow import FlowConfig, init_flow, forward, reverse
from enflow_tpu.flow.integrators import _lf_forward, _vv_forward
from enflow_tpu.flow.loss import alchemical_nll, lj_potential
from enflow_tpu.nn.egcl import EGCLConfig

DTYPE = jnp.float64


def make_onehot_system(rng, B=2, N=6, nf=5, box_len=8.0, r_cut=3.0, pad=None):
    idx = rng.integers(0, nf, size=(B, N))
    h = np.eye(nf)[idx]
    pos = rng.uniform(-box_len / 2, box_len / 2, size=(B, N, 3))
    vel = rng.normal(size=(B, N, 3)) * 0.3
    g = rng.normal(size=(B, N, nf)) * 0.3
    mask = np.ones((B, N), dtype=bool)
    if pad:
        for b, p in enumerate(pad):
            mask[b, N - p:] = False
    for arr in (h, pos, vel, g):
        arr[~mask] = 0.0
    return System(
        h=jnp.asarray(h, DTYPE), g=jnp.asarray(g, DTYPE),
        pos=jnp.asarray(pos, DTYPE), vel=jnp.asarray(vel, DTYPE),
        mask=jnp.asarray(mask), box=jnp.full((B, 3), box_len, DTYPE),
        r_cut=jnp.full((B,), r_cut, DTYPE),
    )


def flow_cfg(**kw):
    base = dict(n_iter=3, dt=0.05,
                egcl=EGCLConfig(node_nf=5, hidden_nf=16), integrator="lf")
    base.update(kw)
    return FlowConfig(**base)


@pytest.mark.parametrize("integrator", ["lf", "vv"])
def test_invertibility(integrator):
    """reverse(forward(x)) == x to 1e-8 in float64 — the reference's own
    oracle direction made exact (reference main.py:275-278 checks the
    stochastic direction; see integrators.py docstring)."""
    rng = np.random.default_rng(0)
    sys0 = make_onehot_system(rng, pad=[0, 2])
    cfg = flow_cfg(integrator=integrator)
    params = init_flow(jax.random.PRNGKey(0), cfg, DTYPE)

    out, ldj = forward(params, cfg, sys0, jax.random.PRNGKey(1))
    assert ldj.shape == (sys0.num_mols,)
    assert np.isfinite(np.asarray(ldj)).all()
    back = reverse(params, cfg, out)

    np.testing.assert_allclose(np.asarray(back.pos), np.asarray(sys0.pos), atol=1e-8)
    np.testing.assert_allclose(np.asarray(back.vel), np.asarray(sys0.vel), atol=1e-8)
    np.testing.assert_allclose(np.asarray(back.g), np.asarray(sys0.g), atol=1e-8)
    # one-hot features recovered exactly by requantization
    np.testing.assert_allclose(np.asarray(back.h), np.asarray(sys0.h), atol=0)


@pytest.mark.parametrize("integrator,core",
                         [("lf", _lf_forward), ("vv", _vv_forward)])
def test_ldj_matches_autodiff(integrator, core):
    """exact_ldj mode equals the autodiff log|det| of the integrator map."""
    rng = np.random.default_rng(1)
    B, N, nf = 1, 3, 2
    cfg = flow_cfg(n_iter=2, integrator=integrator, exact_ldj=True,
                   egcl=EGCLConfig(node_nf=nf, hidden_nf=8))
    params = init_flow(jax.random.PRNGKey(2), cfg, DTYPE)

    box = jnp.full((B, 3), 1e6, DTYPE)
    r_cut = jnp.full((B,), 1e5, DTYPE)
    mask = jnp.ones((B, N), bool)

    sizes = [N * nf, N * nf, N * 3, N * 3]

    def unflatten(x):
        hs, gs, ps, vs = jnp.split(x, np.cumsum(sizes)[:-1])
        return System(h=hs.reshape(B, N, nf), g=gs.reshape(B, N, nf),
                      pos=ps.reshape(B, N, 3), vel=vs.reshape(B, N, 3),
                      mask=mask, box=box, r_cut=r_cut)

    def run(x):
        s, ldj, _ = core(params, cfg, unflatten(x))
        flat = jnp.concatenate([s.h.ravel(), s.g.ravel(),
                                s.pos.ravel(), s.vel.ravel()])
        return flat, ldj

    x0 = jnp.asarray(rng.normal(size=(sum(sizes),)), DTYPE)
    J = jax.jacfwd(lambda x: run(x)[0])(x0)
    sign, logdet = np.linalg.slogdet(np.asarray(J))
    assert sign > 0
    _, ldj = run(x0)
    assert float(ldj[0]) == pytest.approx(float(logdet), abs=1e-8)


def test_parity_vs_exact_ldj_factor():
    rng = np.random.default_rng(3)
    sys0 = make_onehot_system(rng)
    cfg_p = flow_cfg(dequantizer="floor")
    cfg_e = flow_cfg(dequantizer="floor", exact_ldj=True)
    params = init_flow(jax.random.PRNGKey(4), cfg_p, DTYPE)
    key = jax.random.PRNGKey(5)
    _, ldj_p = forward(params, cfg_p, sys0, key)
    _, ldj_e = forward(params, cfg_e, sys0, key)
    np.testing.assert_allclose(np.asarray(ldj_e), 3.0 * np.asarray(ldj_p),
                               rtol=1e-12)


def test_nll_golden_manual():
    """Dense masked NLL equals a direct numpy transcription of the reference
    formula (loss.py:11-25) molecule by molecule."""
    rng = np.random.default_rng(6)
    sys0 = make_onehot_system(rng, B=3, N=5, pad=[0, 1, 2])
    kBT, soft, zlj = 0.83, 0.1, 10.0
    ldj_vec = np.asarray([0.5, 0.4, 0.334])
    ldj = float(ldj_vec.sum())

    # the raw ldj vector carries no per-molecule 2*pi constants -> 2 calls
    got = float(alchemical_nll(sys0, jnp.asarray(ldj_vec), kBT, soft, zlj,
                               num_log_gaussian_calls=2))

    pos = np.asarray(sys0.pos)
    vel = np.asarray(sys0.vel)
    h = np.asarray(sys0.h)
    g = np.asarray(sys0.g)
    mask = np.asarray(sys0.mask)

    H = 0.0
    for b in range(3):
        n = mask[b].sum()
        p = pos[b][mask[b]]
        d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(-1)
        d2 = np.triu(d2)
        r_sq = d2[d2 != 0] + soft
        H += (4 * (1 / r_sq**6 - 1 / r_sq**3)).sum()
    H += 0.5 * (vel[mask] ** 2).sum()
    num_atoms = mask.sum()
    logZ = -num_atoms * (math.log(zlj) - 1.5 * math.log(2 * math.pi / kBT))
    lg = lambda z: -0.5 * ((z**2).sum() + math.log(2 * math.pi))
    log_px = -H / kBT + logZ + ldj + lg(h[mask]) + lg(g[mask])
    expect = -log_px / 3

    assert got == pytest.approx(expect, rel=1e-12)


def test_lj_potential_padding_invariance():
    rng = np.random.default_rng(7)
    s = make_onehot_system(rng, B=1, N=4)
    e1 = np.asarray(lj_potential(s.pos, s.mask, 0.1))
    pos_p = jnp.pad(s.pos, ((0, 0), (0, 3), (0, 0)))
    mask_p = jnp.pad(s.mask, ((0, 0), (0, 3)))
    e2 = np.asarray(lj_potential(pos_p, mask_p, 0.1))
    np.testing.assert_allclose(e1, e2, rtol=1e-12)


def test_flow_jit_topk_and_grad():
    rng = np.random.default_rng(8)
    sys0 = make_onehot_system(rng, B=2, N=6)
    cfg = flow_cfg(nbr_capacity=4)
    params = init_flow(jax.random.PRNGKey(9), cfg, DTYPE)

    @jax.jit
    def loss_fn(params, s, key):
        out, ldj = forward(params, cfg, s, key)
        return alchemical_nll(out, ldj, 0.62, 0.1)

    val, grads = jax.value_and_grad(loss_fn)(params, sys0, jax.random.PRNGKey(10))
    assert np.isfinite(float(val))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_all_pairs_mode_matches_dense():
    """With a huge box / cutoff the all_pairs neighbor mode is exactly the
    dense mode (the cluster fast path used by bench/sampling)."""
    rng = np.random.default_rng(11)
    sys0 = make_onehot_system(rng, B=2, N=6, pad=[0, 2])  # cluster at origin
    sys0 = sys0.replace(box=jnp.full((2, 3), 1e5, DTYPE),
                        r_cut=jnp.full((2,), 1e4, DTYPE))
    cfg_d = flow_cfg()
    cfg_a = flow_cfg(nbr_mode="all_pairs")
    params = init_flow(jax.random.PRNGKey(12), cfg_d, DTYPE)
    key = jax.random.PRNGKey(13)
    out_d, ldj_d = forward(params, cfg_d, sys0, key)
    out_a, ldj_a = forward(params, cfg_a, sys0, key)
    np.testing.assert_allclose(np.asarray(out_a.pos), np.asarray(out_d.pos),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(ldj_a), np.asarray(ldj_d),
                               rtol=1e-12)


def test_bf16_compute_invertibility_exact():
    """Reduced-precision EGCL internals must not break exact inversion:
    forward and reverse evaluate identical values, whatever the precision."""
    rng = np.random.default_rng(14)
    sys0 = make_onehot_system(rng, B=2, N=5)
    sys0 = sys0.astype(jnp.float32)
    cfg = flow_cfg(egcl=EGCLConfig(node_nf=5, hidden_nf=16,
                                   compute_dtype="bfloat16"),
                   nbr_mode="all_pairs")
    params = init_flow(jax.random.PRNGKey(15), cfg, jnp.float32)
    out, ldj = forward(params, cfg, sys0, jax.random.PRNGKey(16))
    back = reverse(params, cfg, out)
    np.testing.assert_allclose(np.asarray(back.pos), np.asarray(sys0.pos),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(back.h), np.asarray(sys0.h), atol=0)


def test_remat_matches_no_remat():
    """jax.checkpoint on the scan body changes memory, not values or grads."""
    rng = np.random.default_rng(20)
    sys0 = make_onehot_system(rng, B=2, N=5)
    cfg_a = flow_cfg()
    cfg_b = flow_cfg(remat=True)
    params = init_flow(jax.random.PRNGKey(21), cfg_a, DTYPE)
    key = jax.random.PRNGKey(22)

    def loss(params, cfg):
        out, ldj = forward(params, cfg, sys0, key)
        return alchemical_nll(out, ldj, 0.62, 0.1)

    va, ga = jax.value_and_grad(loss)(params, cfg_a)
    vb, gb = jax.value_and_grad(loss)(params, cfg_b)
    assert float(va) == pytest.approx(float(vb), rel=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)


def test_vv_reverse_remat_matches_no_remat():
    """The VV *reverse* scan is rematerialized too (flow-VI differentiates
    reverse_core, so a non-remat reverse path would store every per-step
    edge tensor regardless of FlowConfig.remat)."""
    from enflow_tpu.flow import reverse_core

    rng = np.random.default_rng(26)
    sys0 = make_onehot_system(rng, B=2, N=5)
    cfg_a = flow_cfg(integrator="vv", remat=False)
    cfg_b = flow_cfg(integrator="vv", remat=True)
    params = init_flow(jax.random.PRNGKey(27), cfg_a, DTYPE)

    def loss(params, cfg):
        out, ldj = reverse_core(params, cfg, sys0)
        return (out.pos ** 2).sum() + ldj.sum()

    va, ga = jax.value_and_grad(loss)(params, cfg_a)
    vb, gb = jax.value_and_grad(loss)(params, cfg_b)
    assert float(va) == pytest.approx(float(vb), rel=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)


@pytest.mark.parametrize("variant", [
    dict(scan_unroll=3),
    dict(remat=True, remat_policy="dots"),
    dict(remat=True, remat_policy="dots_no_batch"),
])
def test_scan_unroll_and_remat_policy_match_default(variant):
    """The scheduling knobs (scan unroll, checkpoint policy) change compiler
    strategy only — values and gradients are bitwise-insensitive to them.
    (All three variants were measured slower than the defaults on v5e at the
    bench workload — kept as infrastructure; see RESULTS.md.)"""
    rng = np.random.default_rng(23)
    sys0 = make_onehot_system(rng, B=2, N=5)
    cfg_a = flow_cfg()
    cfg_b = flow_cfg(**variant)
    params = init_flow(jax.random.PRNGKey(24), cfg_a, DTYPE)
    key = jax.random.PRNGKey(25)

    def loss(params, cfg):
        out, ldj = forward(params, cfg, sys0, key)
        return alchemical_nll(out, ldj, 0.62, 0.1)

    va, ga = jax.value_and_grad(loss)(params, cfg_a)
    vb, gb = jax.value_and_grad(loss)(params, cfg_b)
    assert float(va) == pytest.approx(float(vb), rel=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)
