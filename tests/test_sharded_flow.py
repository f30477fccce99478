"""Atom-axis-sharded flow (ring EGCL + ring NLL) vs the dense single-device
path, on the 8-virtual-device CPU mesh.

The sharded implementations reuse the dense per-block math
(``nn.egcl.edge_messages``/``node_outputs``, the loss formula), so agreement
is to float64 round-off, including gradients through shard_map/ppermute.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enflow_tpu.data.system import System
from enflow_tpu.flow.integrators import FlowConfig, init_flow, forward, \
    forward_core, reverse_core, reverse
from enflow_tpu.flow.loss import alchemical_nll
from enflow_tpu.flow import sharded as sh
from enflow_tpu.nn.egcl import EGCLConfig
from enflow_tpu.parallel.mesh import get_mesh

DTYPE = jnp.float64
B, N, NF = 3, 16, 4


def make_system(seed=0, pad_last=False):
    rng = np.random.default_rng(seed)
    mask = np.ones((B, N), bool)
    if pad_last:
        mask[-1, N // 2:] = False   # padded atoms in the last molecule
    pos = rng.uniform(-2.0, 2.0, (B, N, 3)) * mask[..., None]
    return System(
        h=jnp.asarray(rng.normal(size=(B, N, NF)) * mask[..., None], DTYPE),
        g=jnp.asarray(rng.normal(size=(B, N, NF)) * mask[..., None], DTYPE),
        pos=jnp.asarray(pos, DTYPE),
        vel=jnp.asarray(rng.normal(size=(B, N, 3)) * mask[..., None] * 0.3,
                        DTYPE),
        mask=jnp.asarray(mask),
        box=jnp.asarray(np.full((B, 3), 20.0), DTYPE),
        r_cut=jnp.asarray(np.full((B,), 3.0), DTYPE),
    )


def make_cfg(nbr_mode="dense", **kw):
    return FlowConfig(
        n_iter=3, dt=0.05,
        egcl=EGCLConfig(node_nf=NF, hidden_nf=16),
        nbr_mode=nbr_mode, **kw)


@pytest.fixture(scope="module")
def mesh():
    return get_mesh(("atom",))


@pytest.mark.parametrize("nbr_mode", ["dense", "all_pairs"])
@pytest.mark.parametrize("pad_last", [False, True])
def test_forward_core_parity(mesh, nbr_mode, pad_last):
    cfg = make_cfg(nbr_mode)
    params = init_flow(jax.random.PRNGKey(0), cfg, DTYPE)
    sys = make_system(pad_last=pad_last)

    out_d, ldj_d = forward_core(params, cfg, sys)
    out_s, ldj_s = sh.sharded_forward_core(mesh, params, cfg, sys)

    np.testing.assert_allclose(np.asarray(out_s.pos), np.asarray(out_d.pos),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(out_s.h), np.asarray(out_d.h),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(out_s.vel), np.asarray(out_d.vel),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(ldj_s), np.asarray(ldj_d),
                               atol=1e-10)


def test_vv_and_exact_ldj_parity(mesh):
    cfg = make_cfg("dense", integrator="vv", exact_ldj=True)
    params = init_flow(jax.random.PRNGKey(3), cfg, DTYPE)
    sys = make_system(seed=5)
    out_d, ldj_d = forward_core(params, cfg, sys)
    out_s, ldj_s = sh.sharded_forward_core(mesh, params, cfg, sys)
    np.testing.assert_allclose(np.asarray(out_s.pos), np.asarray(out_d.pos),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(ldj_s), np.asarray(ldj_d),
                               atol=1e-10)


def test_sharded_roundtrip_and_reverse_parity(mesh):
    cfg = make_cfg("dense")
    params = init_flow(jax.random.PRNGKey(1), cfg, DTYPE)
    sys = make_system(seed=2)

    out_s, ldj_f = sh.sharded_forward_core(mesh, params, cfg, sys)
    back, ldj_r = sh.sharded_reverse_core(mesh, params, cfg, out_s)

    np.testing.assert_allclose(np.asarray(back.pos), np.asarray(sys.pos),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(back.h), np.asarray(sys.h),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(ldj_f), -np.asarray(ldj_r),
                               atol=1e-8)


def test_sharded_full_forward_and_nll(mesh):
    """Full forward (dequantized one-hot input) + NLL: the sharded loss must
    equal the dense loss evaluated on the sharded forward's own output
    (dequant noise differs per shard layout, so compare through the output).
    """
    cfg = make_cfg("dense")
    params = init_flow(jax.random.PRNGKey(2), cfg, DTYPE)
    sys = make_system(seed=3)
    onehot = jax.nn.one_hot(jnp.arange(N) % NF, NF, dtype=DTYPE)
    sys = sys.replace(h=jnp.broadcast_to(onehot, (B, N, NF)))

    key = jax.random.PRNGKey(7)
    out_s, ldj_s = sh.sharded_forward(mesh, params, cfg, sys, key)
    # dense NLL of the sharded output == sharded NLL of the same run
    # (same key => same per-shard dequant noise inside make_sharded_nll)
    loss_dense = alchemical_nll(out_s, ldj_s, kBT=1.2, softening=0.1)
    loss_fn = sh.make_sharded_nll(mesh, cfg, kBT=1.2, softening=0.1)
    loss_sharded = loss_fn(params, sys, key)
    assert float(loss_sharded) == pytest.approx(float(loss_dense), rel=1e-10)

    # reverse re-quantizes back to the one-hot input
    back = sh.sharded_reverse(mesh, params, cfg, out_s)
    np.testing.assert_allclose(np.asarray(back.h), np.asarray(sys.h),
                               atol=1e-8)


def test_sharded_nll_grad_matches_dense(mesh):
    """Gradient parity: d(NLL)/d(params) through the ring — shard the forward
    deterministically (floor dequantizer noise differs; use forward_core via
    identical continuous input) by comparing sharded grads against dense
    grads of the same stochastic program (same fold_in key layout is
    impossible dense-side, so use a continuous-state NLL)."""
    cfg = make_cfg("dense")
    params = init_flow(jax.random.PRNGKey(4), cfg, DTYPE)
    sys = make_system(seed=8)
    kBT, soft = 1.0, 0.1

    def dense_loss(p):
        out, ldj = forward_core(p, cfg, sys)
        return alchemical_nll(out, ldj, kBT, soft)

    from jax.sharding import PartitionSpec as P

    def sharded_loss(p):
        specs = sh.system_specs("atom")
        import dataclasses
        # remat=False mirrors _sharded_cfg: jax.checkpoint can't evaluate
        # eagerly inside shard_map (and would re-run ring ppermutes backward)
        cfg_s = dataclasses.replace(cfg, axis_name="atom", remat=False)

        def body(pp, s):
            out, ldj = forward_core(pp, cfg_s, s)
            return alchemical_nll(out, ldj, kBT, soft, axis_name="atom")

        f = jax.shard_map(body, mesh=mesh, in_specs=(P(), specs),
                          out_specs=P())
        return f(p, sys)

    from jax.flatten_util import ravel_pytree
    g_d = jax.grad(dense_loss)(params)
    g_s = jax.grad(sharded_loss)(params)
    flat_d, _ = ravel_pytree(g_d)
    flat_s, _ = ravel_pytree(g_s)
    np.testing.assert_allclose(np.asarray(flat_s), np.asarray(flat_d),
                               atol=1e-8, rtol=1e-8)


def test_shard_system_placement(mesh):
    sys = make_system()
    ssys = sh.shard_system(sys, mesh)
    assert ssys.pos.sharding.spec == sh.system_specs("atom").pos
    np.testing.assert_allclose(np.asarray(ssys.pos), np.asarray(sys.pos))


# ---------------------------------------------------------------------------
# driver e2e with parallel.atom_axis (2-D mesh ("data", "atom"))
# ---------------------------------------------------------------------------

def test_driver_atom_axis_train_and_generate(tmp_path, capsys):
    import os
    from test_driver import write_xyz_dataset, base_config, run_main

    xyz = str(tmp_path / "mols.xyz")
    write_xyz_dataset(xyz)
    cfg = base_config(tmp_path, xyz)
    cfg["parallel"] = {"atom_axis": 4}   # 8 devices -> (data=2, atom=4)
    cfg["training"]["num_epochs"] = 2
    cfg["training"]["batch_size"] = 4

    m = run_main(tmp_path, cfg)
    assert m.mesh.shape == {"data": 2, "atom": 4}
    # 4 atoms padded to the atom-axis multiple
    assert m.train_loader.n_max == 4
    out = capsys.readouterr().out
    rows = [l for l in out.split("\n") if l.strip() and l[0].isdigit()]
    losses = [float(l.split()[1]) for l in rows]
    assert len(losses) == 2 and all(np.isfinite(losses))

    gen_cfg = {
        "mode": "generate",
        "units": {"time": "pico", "dist": "ang"},
        "precision": "float64",
        "parallel": {"atom_axis": 8},
        "dataset": {
            "type": "lj",
            "n_atoms": 6,
            "box": [14.0, 14.0, 14.0],
            "discard": -1,
            "n_iter": 40,
            "interval": 20,
            "friction": 1,
            "dt": 0.004,
            "minimize_steps": 30,
        },
        "dynamics": {"checkpoint_path": cfg["dynamics"]["checkpoint_path"]},
    }
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        run_main(tmp_path, gen_cfg, "gen.yaml")
    finally:
        os.chdir(cwd)
    out3 = capsys.readouterr().out
    flags = [l for l in out3.split("\n") if l.strip() in ("True", "False")]
    assert flags == ["True", "True"]
    h = np.loadtxt(tmp_path / "h.out")
    assert h.shape == (6, 5)


@pytest.mark.parametrize("pos_update", ["coupled", "drift"])
def test_coupled_position_update_sharded_parity(mesh, pos_update):
    """The learned position updates (coupled scale+shift / translation-only
    drift) compose with the atom-axis ring path: sharded forward/reverse
    match dense, including the drift EGCL evaluated on velocity-space
    geometry and (coupled) its psummed 3*sum(S) ldj."""
    from tests.test_position_coupling import activate
    cfg = make_cfg("all_pairs", position_update=pos_update, exact_ldj=True)
    params = activate(init_flow(jax.random.PRNGKey(3), cfg, DTYPE),
                      jax.random.PRNGKey(4))
    # open-boundary system: the coupled scale does not commute with PBC
    # wrapping (FlowConfig docs) — at box=20 the scaled positions cross
    # box/2 and the roundtrip genuinely breaks (verified while writing
    # this test), so the coupled mode's contract is box >> |pos|
    sys = make_system(seed=5)
    sys = sys.replace(box=jnp.full_like(sys.box, 1e6),
                      r_cut=jnp.full_like(sys.r_cut, 1e5))

    out_d, ldj_d = forward_core(params, cfg, sys)
    out_s, ldj_s = sh.sharded_forward_core(mesh, params, cfg, sys)
    np.testing.assert_allclose(np.asarray(out_s.pos), np.asarray(out_d.pos),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(out_s.vel), np.asarray(out_d.vel),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(ldj_s), np.asarray(ldj_d),
                               atol=1e-10)
    back, ldj_r = sh.sharded_reverse_core(mesh, params, cfg, out_s)
    np.testing.assert_allclose(np.asarray(back.pos), np.asarray(sys.pos),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(ldj_r), -np.asarray(ldj_s),
                               atol=1e-8)
