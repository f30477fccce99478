"""Device-side cell-list neighbor build vs the brute-force dense builder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enflow_tpu.data.celllist import (cell_neighbor_list, cell_overflow,
                                      suggest_cells_per_dim)
from enflow_tpu.data.neighbors import neighbor_list

DTYPE = jnp.float64


def edge_set(nbrs, b=0):
    idx = np.asarray(nbrs.idx[b])
    msk = np.asarray(nbrs.mask[b])
    return {(i, int(idx[i, k])) for i in range(idx.shape[0])
            for k in range(idx.shape[1]) if msk[i, k]}


def make_batch(seed, B=2, N=64, box_len=8.0, n_real=None):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-box_len / 2, box_len / 2, (B, N, 3))
    mask = np.ones((B, N), bool)
    if n_real is not None:
        mask[:, n_real:] = False
        pos[~mask] = 0.0
    return (jnp.asarray(pos, DTYPE),
            jnp.asarray(np.full((B, 3), box_len), DTYPE),
            jnp.asarray(mask),
            jnp.asarray(np.full((B,), 2.0), DTYPE))


@pytest.mark.parametrize("m", [1, 2, 3, 4])
def test_cell_list_matches_dense(m):
    """The cell list yields exactly the dense builder's edge set for every
    grid size (incl. the degenerate m=1/m=2 wrap-collision cases)."""
    pos, box, mask, r_cut = make_batch(seed=m)
    dense = neighbor_list(pos, box, mask, r_cut)              # ground truth
    cell = cell_neighbor_list(pos, box, mask, r_cut, capacity=64,
                              cells_per_dim=m, cell_capacity=64)
    for b in range(pos.shape[0]):
        assert edge_set(cell, b) == edge_set(dense, b)


def test_cell_list_with_padding():
    pos, box, mask, r_cut = make_batch(seed=9, n_real=40)
    dense = neighbor_list(pos, box, mask, r_cut)
    cell = cell_neighbor_list(pos, box, mask, r_cut, capacity=64,
                              cells_per_dim=4, cell_capacity=64)
    for b in range(pos.shape[0]):
        assert edge_set(cell, b) == edge_set(dense, b)


def test_cell_overflow_diagnostic():
    pos, box, mask, r_cut = make_batch(seed=3, B=1, N=32)
    assert not bool(cell_overflow(pos, box, mask, r_cut, 2, 32))
    # capacity 1 with 32 atoms in 8 cells must overflow
    assert bool(cell_overflow(pos, box, mask, r_cut, 2, 1))


def test_suggest_cells_per_dim():
    assert suggest_cells_per_dim([8.0, 8.0, 8.0], 2.0) == 4
    assert suggest_cells_per_dim([8.0, 6.0, 8.0], 2.0) == 3
    assert suggest_cells_per_dim([1.0, 1.0, 1.0], 2.0) == 1


def test_cell_mode_in_flow():
    """The flow runs (and inverts) with nbr_mode='cell'; trajectories match
    the dense top-k path when capacities are generous."""
    import dataclasses
    from enflow_tpu.flow.integrators import FlowConfig, init_flow, \
        forward_core, reverse_core
    from enflow_tpu.nn.egcl import EGCLConfig
    from enflow_tpu.data.system import System

    B, N, NF = 2, 32, 3
    rng = np.random.default_rng(0)
    sys = System(
        h=jnp.asarray(rng.normal(size=(B, N, NF)), DTYPE),
        g=jnp.asarray(rng.normal(size=(B, N, NF)), DTYPE),
        pos=jnp.asarray(rng.uniform(-4, 4, (B, N, 3)), DTYPE),
        vel=jnp.asarray(rng.normal(size=(B, N, 3)) * 0.1, DTYPE),
        mask=jnp.ones((B, N), bool),
        box=jnp.full((B, 3), 8.0, DTYPE),
        r_cut=jnp.full((B,), 2.0, DTYPE),
    )
    cfg_cell = FlowConfig(
        n_iter=2, dt=0.02, egcl=EGCLConfig(node_nf=NF, hidden_nf=8),
        nbr_mode="cell", nbr_capacity=N, cells_per_dim=4, cell_capacity=32)
    cfg_dense = dataclasses.replace(cfg_cell, nbr_mode="dense",
                                    cells_per_dim=None, cell_capacity=None)
    params = init_flow(jax.random.PRNGKey(0), cfg_cell, DTYPE)

    out_c, ldj_c = forward_core(params, cfg_cell, sys)
    out_d, ldj_d = forward_core(params, cfg_dense, sys)
    np.testing.assert_allclose(np.asarray(out_c.pos), np.asarray(out_d.pos),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(ldj_c), np.asarray(ldj_d),
                               atol=1e-10)
    back, _ = reverse_core(params, cfg_cell, out_c)
    np.testing.assert_allclose(np.asarray(back.pos), np.asarray(sys.pos),
                               atol=1e-8)


def test_driver_cell_mode_auto(tmp_path, capsys):
    """Driver e2e with nbr_mode: cell and auto-sized grid parameters."""
    from test_driver import write_xyz_dataset, base_config, run_main

    xyz = str(tmp_path / "mols.xyz")
    write_xyz_dataset(xyz, n_frames=8, n_atoms=6)
    cfg = base_config(tmp_path, xyz)
    cfg["dynamics"]["nbr_mode"] = "cell"
    cfg["dynamics"]["nbr_capacity"] = 6
    cfg["training"]["num_epochs"] = 2
    m = run_main(tmp_path, cfg)
    assert m.flow_cfg.nbr_mode == "cell"
    assert m.flow_cfg.cells_per_dim >= 1
    assert m.flow_cfg.cell_capacity >= 4
    out = capsys.readouterr()
    rows = [l for l in out.out.split("\n") if l.strip() and l[0].isdigit()]
    assert len(rows) == 2
    assert all(np.isfinite(float(r.split()[1])) for r in rows)
    assert "cell list:" in out.err
