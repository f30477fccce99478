"""Multi-image neighbor mode (``nbr_mode: images``) vs a brute-force
27-image oracle — the reference's divergent regime ``box < 2*r_cut``
(reference ``data/base.py:122-144``: one edge per in-cutoff periodic image,
self-image pairs excluded)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from enflow_tpu.data.neighbors import (
    image_neighbor_list, max_image_neighbor_count, neighbor_list,
    neighbors_with_diffs)

# exactly the example/train.yaml geometry (VERDICT item 2): box 17 A = 5
# sigma, r_cut 10.2 A = 3 sigma -- inside the divergent regime 5s < 6s
BOX = 17.0
R_CUT = 10.2


def brute_force_image_edges(pos, box, r_cut):
    """Oracle: enumerate all 27 periodic images of every atom; one edge per
    (i, j, offset) with |pos_i + off*box - pos_j| < r_cut and i != j.
    Returns a sorted list of (j_atom=i, i_atom=j... ) tuples
    (i, j, d2 rounded) and the per-(i) counts."""
    n = pos.shape[0]
    edges = []
    for a in (-1, 0, 1):
        for b in (-1, 0, 1):
            for c in (-1, 0, 1):
                off = np.array([a, b, c], float) * box
                for i in range(n):
                    for j in range(n):
                        if i == j:
                            continue
                        d = pos[i] + off - pos[j]
                        d2 = float((d * d).sum())
                        if d2 < r_cut * r_cut:
                            # edge FROM j's perspective? our Neighbors rows
                            # are i with displacement pos_i - pos_j; the
                            # oracle's (i image, j) pair gives row=i,
                            # col=j, diff = pos_i + off - pos_j
                            edges.append((i, j, round(d2, 8)))
    return sorted(edges)


def wrapped_positions(n, box, seed):
    rng = np.random.default_rng(seed)
    return rng.uniform(-box / 2, box / 2, (n, 3))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_brute_force_oracle_in_divergent_geometry(seed):
    n = 9
    pos = wrapped_positions(n, BOX, seed)
    oracle = brute_force_image_edges(pos, BOX, R_CUT)
    assert len(oracle) > n * (n - 1) / 2, "geometry should be divergent"

    cap = 27 * n  # no truncation
    nbrs, diff = image_neighbor_list(
        jnp.asarray(pos)[None], jnp.full((1, 3), BOX), jnp.ones((1, n), bool),
        jnp.full((1,), R_CUT), cap)
    got = []
    for i in range(n):
        for k in range(cap):
            if bool(nbrs.mask[0, i, k]):
                d = np.asarray(diff[0, i, k])
                got.append((i, int(nbrs.idx[0, i, k]),
                            round(float((d * d).sum()), 8)))
    assert sorted(got) == oracle

    # multiplicity really is > 1 somewhere (the regime's signature)
    from collections import Counter
    mult = Counter((i, j) for i, j, _ in oracle)
    assert max(mult.values()) > 1


def test_max_image_neighbor_count_matches_oracle():
    n = 8
    pos = wrapped_positions(n, BOX, 3)
    oracle = brute_force_image_edges(pos, BOX, R_CUT)
    per_atom = np.zeros(n, int)
    for i, _, _ in oracle:
        per_atom[i] += 1
    got = int(max_image_neighbor_count(
        jnp.asarray(pos)[None], jnp.full((1, 3), BOX),
        jnp.ones((1, n), bool), jnp.full((1,), R_CUT)))
    assert got == per_atom.max()


def test_reduces_to_min_image_when_box_large():
    """For box >= 2*r_cut only the minimum image can be within cutoff:
    images mode == dense min-image edge set, identical displacements."""
    n, box, r_cut = 12, 25.0, 10.2
    pos = wrapped_positions(n, box, 4)
    posb = jnp.asarray(pos)[None]
    boxb = jnp.full((1, 3), box)
    maskb = jnp.ones((1, n), bool)
    rcb = jnp.full((1,), r_cut)

    nbrs_i, diff_i = image_neighbor_list(posb, boxb, maskb, rcb, n)
    nbrs_d, diff_d = neighbors_with_diffs(posb, boxb, maskb, rcb,
                                          mode="dense")

    def edge_set(nbrs, diff):
        out = {}
        for i in range(n):
            for k in range(nbrs.idx.shape[-1]):
                if bool(nbrs.mask[0, i, k]):
                    out[(i, int(nbrs.idx[0, i, k]))] = np.asarray(
                        diff[0, i, k])
        return out

    ei, ed = edge_set(nbrs_i, diff_i), edge_set(nbrs_d, diff_d)
    assert set(ei) == set(ed)
    for key in ei:
        np.testing.assert_allclose(ei[key], ed[key], atol=1e-12)


def test_truncation_and_padding_semantics():
    n = 6
    pos = wrapped_positions(n, BOX, 5)
    mask = np.ones(n, bool)
    mask[-2:] = False
    nbrs, diff = image_neighbor_list(
        jnp.asarray(pos)[None], jnp.full((1, 3), BOX), jnp.asarray(mask)[None],
        jnp.full((1,), R_CUT), 27 * n)
    # padded atoms have no slots in either direction
    assert not bool(nbrs.mask[0, -2:].any())
    assert not bool(np.isin(np.asarray(nbrs.idx[0])[np.asarray(nbrs.mask[0])],
                            [n - 2, n - 1]).any())
    # invalid slots carry zero displacement
    assert float(jnp.abs(jnp.where(nbrs.mask[0][..., None], 0.0,
                                   diff[0])).max()) == 0.0

    # capacity truncation keeps the closest slots
    nbrs_t, diff_t = image_neighbor_list(
        jnp.asarray(pos)[None], jnp.full((1, 3), BOX), jnp.asarray(mask)[None],
        jnp.full((1,), R_CUT), 2)
    d2_t = np.asarray((diff_t ** 2).sum(-1)[0])
    d2_full = np.asarray((diff ** 2).sum(-1)[0])
    for i in range(n - 2):
        kept = sorted(d2_t[i][np.asarray(nbrs_t.mask[0, i])])
        best = sorted(d2_full[i][np.asarray(nbrs.mask[0, i])])[:2]
        np.testing.assert_allclose(kept, best, rtol=1e-12)


def test_flow_invertibility_with_images_mode():
    """forward_core/reverse_core stay exact inverses when the EGCL consumes
    the multi-image neighbor list (displacements flow through gathers)."""
    from enflow_tpu.flow import FlowConfig, init_flow, forward_core, \
        reverse_core
    from enflow_tpu.nn.egcl import EGCLConfig
    from enflow_tpu.data.system import System

    n, nf = 7, 4
    cfg = FlowConfig(n_iter=2, dt=0.05,
                     egcl=EGCLConfig(node_nf=nf, hidden_nf=16),
                     nbr_mode="images", nbr_capacity=27 * n)
    params = init_flow(jax.random.PRNGKey(0), cfg, jnp.float64)
    k = jax.random.split(jax.random.PRNGKey(1), 4)
    sys = System(
        h=jax.random.normal(k[0], (2, n, nf), jnp.float64),
        g=jax.random.normal(k[1], (2, n, nf), jnp.float64),
        pos=jax.random.uniform(k[2], (2, n, 3), jnp.float64,
                               -BOX / 2, BOX / 2),
        vel=jax.random.normal(k[3], (2, n, 3), jnp.float64) * 0.1,
        mask=jnp.ones((2, n), bool),
        box=jnp.full((2, 3), BOX, jnp.float64),
        r_cut=jnp.full((2,), R_CUT, jnp.float64))

    out, ldj = forward_core(params, cfg, sys)
    back, ldj_r = reverse_core(params, cfg, out)
    for a, b in [(back.pos, sys.pos), (back.vel, sys.vel), (back.g, sys.g),
                 (back.h, sys.h)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-8)
    np.testing.assert_allclose(np.asarray(ldj), -np.asarray(ldj_r),
                               atol=1e-8)
    assert bool(jnp.isfinite(ldj).all())


def test_min_image_mode_warns_in_divergent_geometry(tmp_path):
    """Driver-level guard: dense/topk/cell with box < 2*r_cut warns loudly
    and recommends nbr_mode: images (VERDICT item 2)."""
    from test_driver import write_xyz_dataset, base_config, run_main

    xyz = str(tmp_path / "mols.xyz")
    write_xyz_dataset(xyz)
    cfg = base_config(tmp_path, xyz)
    cfg["dataset"]["box"] = [17.0, 17.0, 17.0]
    cfg["dataset"]["r_cut"] = 10.2
    cfg["training"]["num_epochs"] = 1
    with pytest.warns(UserWarning, match="min-image.*images"):
        run_main(tmp_path, cfg)


def test_driver_trains_with_images_mode(tmp_path):
    """e2e: the flagship train.yaml geometry trains under nbr_mode: images
    with auto capacity, and no divergent-regime warning fires."""
    import warnings
    from test_driver import write_xyz_dataset, base_config, run_main

    xyz = str(tmp_path / "mols.xyz")
    write_xyz_dataset(xyz)
    cfg = base_config(tmp_path, xyz)
    cfg["dataset"]["box"] = [17.0, 17.0, 17.0]
    cfg["dataset"]["r_cut"] = 10.2
    cfg["dynamics"]["nbr_mode"] = "images"
    cfg["dynamics"]["nbr_capacity"] = "auto"
    cfg["training"]["num_epochs"] = 2
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        m = run_main(tmp_path, cfg)
    assert m.flow_cfg.nbr_mode == "images"
