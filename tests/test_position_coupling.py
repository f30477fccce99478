"""Tests for the learned position coupling (``position_update='coupled'``).

The L2HMC-style drift (flow/integrators.py FlowConfig docs): a second
per-step EGCL on velocity-space geometry emits (S, Fp) and the drift becomes
``pos' = exp(S)*pos + (vel + Fp)*dt`` with exact ldj ``3*sum(S)``. These
tests pin the contract: exact invertibility, ldj == autodiff log|det|,
joint-rotation equivariance, and exact reduction to the shift flow at init.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enflow_tpu.data.system import System
from enflow_tpu.flow import FlowConfig, init_flow, forward, reverse
from enflow_tpu.flow.integrators import _lf_forward, forward_core, \
    reverse_core
from enflow_tpu.nn.egcl import EGCLConfig

DTYPE = jnp.float64


def cluster_system(rng, B=2, N=6, nf=4):
    """Open-boundary (huge-box) system, the coupled mode's intended regime."""
    h = rng.normal(size=(B, N, nf)) * 0.5
    return System(
        h=jnp.asarray(h, DTYPE),
        g=jnp.asarray(rng.normal(size=(B, N, nf)) * 0.3, DTYPE),
        pos=jnp.asarray(rng.normal(size=(B, N, 3)), DTYPE),
        vel=jnp.asarray(rng.normal(size=(B, N, 3)) * 0.5, DTYPE),
        mask=jnp.ones((B, N), bool),
        box=jnp.full((B, 3), 1e6, DTYPE),
        r_cut=jnp.full((B,), 1e5, DTYPE),
    )


def coupled_cfg(**kw):
    base = dict(n_iter=3, dt=0.05,
                egcl=EGCLConfig(node_nf=4, hidden_nf=16),
                integrator="lf", nbr_mode="all_pairs",
                position_update="coupled", exact_ldj=True,
                dequantizer="floor")
    base.update(kw)
    return FlowConfig(**base)


def activate(params, key, scale=0.3):
    """Randomize the zero-initialized S/Fp heads so tests exercise the
    coupling (at init it is exactly the shift flow by design)."""
    pn = params["pos_networks"]
    leaves, tree = jax.tree_util.tree_flatten(pn)
    keys = jax.random.split(key, len(leaves))
    leaves = [l + scale * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    return {**params, "pos_networks": jax.tree_util.tree_unflatten(tree,
                                                                   leaves)}


@pytest.mark.parametrize("nbr_mode", ["all_pairs", "dense"])
def test_coupled_invertibility(nbr_mode):
    rng = np.random.default_rng(0)
    sys0 = cluster_system(rng)
    cfg = coupled_cfg(nbr_mode=nbr_mode)
    params = activate(init_flow(jax.random.PRNGKey(0), cfg, DTYPE),
                      jax.random.PRNGKey(1))
    out, ldj = forward_core(params, cfg, sys0)
    # the coupling must actually move positions beyond the shift drift's
    # ~n_iter*dt envelope for this test to mean anything
    assert not np.allclose(np.asarray(out.pos), np.asarray(sys0.pos),
                           atol=0.2)
    back, ldj_r = reverse_core(params, cfg, out)
    for f in ("pos", "vel", "g", "h"):
        np.testing.assert_allclose(np.asarray(getattr(back, f)),
                                   np.asarray(getattr(sys0, f)), atol=1e-8)
    np.testing.assert_allclose(np.asarray(ldj_r), -np.asarray(ldj),
                               atol=1e-8)


def test_coupled_ldj_matches_autodiff():
    rng = np.random.default_rng(1)
    B, N, nf = 1, 3, 2
    cfg = coupled_cfg(n_iter=2, egcl=EGCLConfig(node_nf=nf, hidden_nf=8))
    params = activate(init_flow(jax.random.PRNGKey(2), cfg, DTYPE),
                      jax.random.PRNGKey(3))
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
        s, ldj, _ = _lf_forward(params, cfg, unflatten(x))
        return jnp.concatenate([s.h.ravel(), s.g.ravel(),
                                s.pos.ravel(), s.vel.ravel()]), ldj

    x0 = jnp.asarray(rng.normal(size=(sum(sizes),)), DTYPE)
    J = jax.jacfwd(lambda x: run(x)[0])(x0)
    sign, logdet = np.linalg.slogdet(np.asarray(J))
    assert sign > 0
    _, ldj = run(x0)
    assert float(ldj[0]) == pytest.approx(float(logdet), abs=1e-8)


def test_coupled_init_is_exactly_shift():
    """Zero-initialized heads: coupled init == shift flow, bitwise, and the
    shift flow's own parameter stream is untouched by the extra key use."""
    rng = np.random.default_rng(2)
    sys0 = cluster_system(rng)
    cfg_c = coupled_cfg()
    cfg_s = dataclasses.replace(cfg_c, position_update="shift")
    params_c = init_flow(jax.random.PRNGKey(7), cfg_c, DTYPE)
    params_s = init_flow(jax.random.PRNGKey(7), cfg_s, DTYPE)
    # kick networks and dequantizer identical (key-stream compatibility)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params_s["networks"], params_c["networks"])
    out_c, ldj_c = forward_core(params_c, cfg_c, sys0)
    out_s, ldj_s = forward_core(params_s, cfg_s, sys0)
    for f in ("pos", "vel", "g", "h"):
        np.testing.assert_array_equal(np.asarray(getattr(out_c, f)),
                                      np.asarray(getattr(out_s, f)))
    np.testing.assert_array_equal(np.asarray(ldj_c), np.asarray(ldj_s))


def test_coupled_rotation_equivariance():
    """A joint rotation of (pos, vel) commutes with the coupled flow."""
    rng = np.random.default_rng(3)
    sys0 = cluster_system(rng, B=1, N=5)
    cfg = coupled_cfg()
    params = activate(init_flow(jax.random.PRNGKey(4), cfg, DTYPE),
                      jax.random.PRNGKey(5))
    # random rotation via QR
    A = rng.normal(size=(3, 3))
    Rot, _ = np.linalg.qr(A)
    if np.linalg.det(Rot) < 0:
        Rot[:, 0] = -Rot[:, 0]
    Rot = jnp.asarray(Rot, DTYPE)

    out, ldj = forward_core(params, cfg, sys0)
    sys_r = sys0.replace(pos=sys0.pos @ Rot.T, vel=sys0.vel @ Rot.T)
    out_r, ldj_r = forward_core(params, cfg, sys_r)
    np.testing.assert_allclose(np.asarray(out_r.pos),
                               np.asarray(out.pos @ Rot.T), atol=1e-8)
    np.testing.assert_allclose(np.asarray(out_r.vel),
                               np.asarray(out.vel @ Rot.T), atol=1e-8)
    np.testing.assert_allclose(np.asarray(ldj_r), np.asarray(ldj),
                               atol=1e-8)


def test_coupled_forward_reverse_with_dequant():
    """Full forward/reverse (argmax dequantizer) roundtrip, padded batch."""
    rng = np.random.default_rng(4)
    nf = 4
    idx = rng.integers(0, nf, size=(2, 6))
    sys0 = cluster_system(rng)
    mask = np.ones((2, 6), bool)
    mask[1, 4:] = False
    h = np.eye(nf)[idx]
    h[~mask] = 0.0
    sys0 = sys0.replace(h=jnp.asarray(h, DTYPE), mask=jnp.asarray(mask),
                        pos=jnp.where(jnp.asarray(mask)[..., None],
                                      sys0.pos, 0.0),
                        vel=jnp.where(jnp.asarray(mask)[..., None],
                                      sys0.vel, 0.0),
                        g=jnp.where(jnp.asarray(mask)[..., None],
                                    sys0.g, 0.0))
    cfg = coupled_cfg(dequantizer="argmax")
    params = activate(init_flow(jax.random.PRNGKey(8), cfg, DTYPE),
                      jax.random.PRNGKey(9))
    out, ldj = forward(params, cfg, sys0, jax.random.PRNGKey(10))
    assert np.isfinite(np.asarray(ldj)).all()
    back = reverse(params, cfg, out)
    np.testing.assert_allclose(np.asarray(back.pos), np.asarray(sys0.pos),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(back.vel), np.asarray(sys0.vel),
                               atol=1e-8)
    np.testing.assert_array_equal(np.asarray(back.h), np.asarray(sys0.h))


def test_coupled_vv_rejected():
    cfg = coupled_cfg(integrator="vv", n_iter=2)
    with pytest.raises(ValueError, match="leapfrog"):
        init_flow(jax.random.PRNGKey(0), cfg, DTYPE)


def test_coupled_grad_flows_to_pos_networks():
    """Despite zero-initialized heads, the VI loss gradient w.r.t. the
    drift EGCL is nonzero — the coupling is trainable from init."""
    from enflow_tpu.sample.vi import flow_vi_loss, make_system_target, \
        sample_base
    cfg = coupled_cfg(n_iter=2, dt=0.05)
    params = init_flow(jax.random.PRNGKey(0), cfg, DTYPE)
    batch = sample_base(jax.random.PRNGKey(1), 4, 6, 4, box=1e6, r_cut=1e5,
                        dtype=DTYPE)
    target = make_system_target(lambda x: -0.5 * (x ** 2).sum() * 4.0)
    g = jax.grad(lambda p: flow_vi_loss(p, cfg, batch, target)[0])(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.abs(l).sum()), g["pos_networks"], 0.0)
    assert np.isfinite(gnorm) and gnorm > 0.0


def test_torch_export_rejects_coupled():
    """Coupled flows have no reference-format representation — export must
    fail loudly, not silently drop the drift networks."""
    from enflow_tpu.utils.torch_export import params_to_state_dict
    cfg = coupled_cfg(n_iter=2, dequantizer="argmax")
    params = init_flow(jax.random.PRNGKey(0), cfg, jnp.float32)
    with pytest.raises(ValueError, match="coupled"):
        params_to_state_dict(params)


def test_coupled_drift_ldj_factor_exact_in_parity_mode():
    """ADVICE r4: the drift's S log-det term uses the exact factor 3 even
    under the NLL parity default (exact_ldj=False) — the factor-1 quirk
    reproduces the reference's Q accounting, but the reference has no
    drift network, so scaling S by 1 would train against a wrong Jacobian.

    With the kick networks zeroed (Q=F=G=0) the whole ldj is the drift
    term, so parity mode and exact mode must agree exactly (and match
    autodiff via the ldj test above)."""
    rng = np.random.default_rng(7)
    sys0 = cluster_system(rng)
    cfg_exact = coupled_cfg()
    cfg_parity = coupled_cfg(exact_ldj=False)
    params = init_flow(jax.random.PRNGKey(4), cfg_exact, DTYPE)
    params["networks"] = jax.tree_util.tree_map(jnp.zeros_like,
                                                params["networks"])
    params = activate(params, jax.random.PRNGKey(5))
    _, ldj_exact, _ = _lf_forward(params, cfg_exact, sys0)
    _, ldj_parity, _ = _lf_forward(params, cfg_parity, sys0)
    assert not np.allclose(np.asarray(ldj_exact), 0.0)  # drift is active
    np.testing.assert_allclose(np.asarray(ldj_parity),
                               np.asarray(ldj_exact), rtol=1e-12)


def test_coupled_rejects_periodic_nbr_modes():
    """exp(S) does not commute with PBC wrapping: the unambiguously
    periodic formats are rejected at init, min-image formats warn
    (ADVICE r4)."""
    for mode, kw in (("images", dict(nbr_capacity=8)),
                     ("cell", dict(nbr_capacity=8, cells_per_dim=2,
                                   cell_capacity=4))):
        with pytest.raises(ValueError, match="periodic"):
            init_flow(jax.random.PRNGKey(0),
                      coupled_cfg(nbr_mode=mode, **kw), DTYPE)
    with pytest.warns(UserWarning, match="open"):
        init_flow(jax.random.PRNGKey(0), coupled_cfg(nbr_mode="dense"),
                  DTYPE)


def drift_cfg(**kw):
    base = dict(n_iter=3, dt=0.05,
                egcl=EGCLConfig(node_nf=4, hidden_nf=16),
                integrator="lf", nbr_mode="all_pairs",
                position_update="drift", exact_ldj=True,
                dequantizer="floor")
    base.update(kw)
    return FlowConfig(**base)


def test_drift_invertible_under_periodic_box():
    """position_update='drift' (translation-only learned drift) is exactly
    invertible under a REAL periodic box — translations commute with
    min-image wrapping, unlike the coupled scale. Positions compare modulo
    the box; (vel, g, h) compare exactly."""
    from enflow_tpu.utils.helpers import min_image

    rng = np.random.default_rng(11)
    B, N, nf, box = 2, 6, 4, 3.0
    sys0 = System(
        h=jnp.asarray(rng.normal(size=(B, N, nf)) * 0.5, DTYPE),
        g=jnp.asarray(rng.normal(size=(B, N, nf)) * 0.3, DTYPE),
        pos=jnp.asarray(rng.uniform(0, box, size=(B, N, 3)), DTYPE),
        vel=jnp.asarray(rng.normal(size=(B, N, 3)) * 0.5, DTYPE),
        mask=jnp.ones((B, N), bool),
        box=jnp.full((B, 3), box, DTYPE),
        r_cut=jnp.full((B,), 1.2, DTYPE),
    )
    cfg = drift_cfg(nbr_mode="dense")
    params = activate(init_flow(jax.random.PRNGKey(5), cfg, DTYPE),
                      jax.random.PRNGKey(6), scale=1.0)
    out, ldj = forward_core(params, cfg, sys0)
    # the learned translation must move positions beyond the shift drift
    shift_params = {k: v for k, v in params.items() if k != "pos_networks"}
    cfg_s = dataclasses.replace(cfg, position_update="shift")
    out_s, _ = forward_core(shift_params, cfg_s, sys0)
    assert not np.allclose(np.asarray(out.pos), np.asarray(out_s.pos),
                           atol=1e-3)
    back, ldj_r = reverse_core(params, cfg, out)
    dpos = np.asarray(min_image(back.pos - sys0.pos, sys0.box[:, None]))
    np.testing.assert_allclose(dpos, 0.0, atol=1e-8)
    for f in ("vel", "g", "h"):
        np.testing.assert_allclose(np.asarray(getattr(back, f)),
                                   np.asarray(getattr(sys0, f)), atol=1e-8)
    np.testing.assert_allclose(np.asarray(ldj_r), -np.asarray(ldj),
                               atol=1e-8)


def test_drift_is_volume_preserving():
    """The drift variant adds NO log-det: zero the kick networks (Q=0) and
    the total ldj is exactly 0 while positions still transport."""
    rng = np.random.default_rng(12)
    sys0 = cluster_system(rng)
    cfg = drift_cfg()
    params = init_flow(jax.random.PRNGKey(7), cfg, DTYPE)
    params["networks"] = jax.tree_util.tree_map(jnp.zeros_like,
                                                params["networks"])
    params = activate(params, jax.random.PRNGKey(8), scale=1.0)
    out, ldj, _ = _lf_forward(params, cfg, sys0)
    np.testing.assert_array_equal(np.asarray(ldj), 0.0)
    # Fp must actually act (otherwise the test is vacuous): with zeroed
    # kicks the shift drift would move pos by exactly vel*dt*n_iter-ish —
    # check deviation from the pure-shift trajectory
    cfg_s = dataclasses.replace(cfg, position_update="shift")
    out_s, _, _ = _lf_forward(
        {k: v for k, v in params.items() if k != "pos_networks"},
        cfg_s, sys0)
    assert not np.allclose(np.asarray(out.pos), np.asarray(out_s.pos),
                           atol=1e-3)


def test_drift_allows_periodic_nbr_modes():
    """Unlike 'coupled', 'drift' initializes under the periodic formats
    without raising (it exists for the periodic fluid targets)."""
    init_flow(jax.random.PRNGKey(0),
              drift_cfg(nbr_mode="images", nbr_capacity=8), DTYPE)
    init_flow(jax.random.PRNGKey(0),
              drift_cfg(nbr_mode="cell", nbr_capacity=8, cells_per_dim=2,
                        cell_capacity=4), DTYPE)


def test_drift_ldj_matches_autodiff():
    """Full Jacobian check (open boundary): the drift flow's ldj — kicks
    only — equals autodiff log|det J|."""
    rng = np.random.default_rng(13)
    B, N, nf = 1, 3, 2
    cfg = drift_cfg(n_iter=2, egcl=EGCLConfig(node_nf=nf, hidden_nf=8))
    params = activate(init_flow(jax.random.PRNGKey(9), cfg, DTYPE),
                      jax.random.PRNGKey(10))
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
        s, ldj, _ = _lf_forward(params, cfg, unflatten(x))
        return jnp.concatenate([s.h.ravel(), s.g.ravel(),
                                s.pos.ravel(), s.vel.ravel()]), ldj

    x0 = jnp.asarray(rng.normal(size=(sum(sizes),)), DTYPE)
    J = jax.jacfwd(lambda x: run(x)[0])(x0)
    sign, logdet = np.linalg.slogdet(np.asarray(J))
    assert sign > 0
    _, ldj = run(x0)
    assert float(ldj[0]) == pytest.approx(float(logdet), abs=1e-8)
