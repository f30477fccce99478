import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enflow_tpu.data.system import System, concatenate
from enflow_tpu.data.neighbors import (
    neighbor_list,
    neighbor_overflow,
    coord_diffs,
)


def make_system(rng, B=3, N=8, nf=5, box_len=6.0, r_cut=2.5, n_real=None):
    pos = rng.uniform(-box_len / 2, box_len / 2, size=(B, N, 3))
    mask = np.zeros((B, N), dtype=bool)
    counts = n_real if n_real is not None else [N, N - 2, N - 3]
    for b, c in enumerate(counts[:B]):
        mask[b, :c] = True
    pos[~mask] = 0.0
    return System(
        h=jnp.asarray(rng.normal(size=(B, N, nf)) * mask[..., None]),
        g=jnp.asarray(rng.normal(size=(B, N, nf)) * mask[..., None]),
        pos=jnp.asarray(pos),
        vel=jnp.asarray(rng.normal(size=(B, N, 3)) * mask[..., None]),
        mask=jnp.asarray(mask),
        box=jnp.full((B, 3), box_len),
        r_cut=jnp.full((B,), r_cut),
    )


def brute_force_neighbors(pos, box, mask, r_cut):
    """Set of (i, j) pairs within min-image cutoff, i != j, both real."""
    N = pos.shape[0]
    out = set()
    for i in range(N):
        for j in range(N):
            if i == j or not (mask[i] and mask[j]):
                continue
            d = pos[i] - pos[j]
            d = d - np.round(d / box) * box
            if (d**2).sum() < r_cut**2:
                out.add((i, j))
    return out


def test_system_shapes_and_counts():
    rng = np.random.default_rng(0)
    s = make_system(rng)
    assert s.num_mols == 3
    assert s.n_max == 8
    assert s.node_nf == 5
    assert int(s.num_atoms) == 8 + 6 + 5
    assert np.asarray(s.atoms_per_mol).tolist() == [8, 6, 5]


def test_pbc_wraps_real_atoms_only():
    rng = np.random.default_rng(1)
    s = make_system(rng)
    shifted = s.replace(pos=s.pos + 7.0)  # push everything out of the box
    wrapped = shifted.pbc()
    p = np.asarray(wrapped.pos)
    m = np.asarray(s.mask)
    assert (np.abs(p[m]) <= 3.0 + 1e-9).all()
    # padded entries untouched
    assert np.allclose(p[~m], np.asarray(shifted.pos)[~m])


def test_center_zero_mean():
    rng = np.random.default_rng(2)
    s = make_system(rng).center()
    p = np.asarray(s.pos)
    m = np.asarray(s.mask)
    for b in range(s.num_mols):
        assert np.allclose(p[b][m[b]].mean(axis=0), 0.0, atol=1e-12)


def test_neighbor_list_dense_matches_brute_force():
    rng = np.random.default_rng(3)
    s = make_system(rng)
    nbrs = neighbor_list(s.pos, s.box, s.mask, s.r_cut)
    idx, nm = np.asarray(nbrs.idx), np.asarray(nbrs.mask)
    for b in range(s.num_mols):
        expect = brute_force_neighbors(
            np.asarray(s.pos)[b], np.asarray(s.box)[b], np.asarray(s.mask)[b],
            float(s.r_cut[b]),
        )
        got = {(i, int(idx[b, i, k])) for i in range(s.n_max)
               for k in range(nbrs.capacity) if nm[b, i, k]}
        assert got == expect


def test_neighbor_list_topk_matches_dense():
    rng = np.random.default_rng(4)
    s = make_system(rng)
    dense = neighbor_list(s.pos, s.box, s.mask, s.r_cut)
    K = int(np.asarray(dense.mask).sum(axis=-1).max())  # tightest safe capacity
    topk = neighbor_list(s.pos, s.box, s.mask, s.r_cut, capacity=K)
    assert topk.capacity == K
    for b in range(s.num_mols):
        for i in range(s.n_max):
            got = {int(j) for j, v in zip(np.asarray(topk.idx)[b, i],
                                          np.asarray(topk.mask)[b, i]) if v}
            expect = {int(j) for j, v in zip(np.asarray(dense.idx)[b, i],
                                            np.asarray(dense.mask)[b, i]) if v}
            assert got == expect
    assert not bool(neighbor_overflow(s.pos, s.box, s.mask, s.r_cut, K))
    if K > 1:
        assert bool(neighbor_overflow(s.pos, s.box, s.mask, s.r_cut, K - 1))


def test_coord_diffs_min_image():
    rng = np.random.default_rng(5)
    s = make_system(rng)
    nbrs = neighbor_list(s.pos, s.box, s.mask, s.r_cut)
    diffs = np.asarray(coord_diffs(s.pos, s.box, nbrs))
    idx, nm = np.asarray(nbrs.idx), np.asarray(nbrs.mask)
    pos, box = np.asarray(s.pos), np.asarray(s.box)
    for b in range(s.num_mols):
        for i in range(s.n_max):
            for k in range(nbrs.capacity):
                if not nm[b, i, k]:
                    assert np.allclose(diffs[b, i, k], 0.0)
                    continue
                d = pos[b, i] - pos[b, idx[b, i, k]]
                d = d - np.round(d / box[b]) * box[b]
                assert np.allclose(diffs[b, i, k], d)
                assert (d**2).sum() < float(s.r_cut[b]) ** 2


def test_neighbor_list_jit_and_grad_safe():
    rng = np.random.default_rng(6)
    s = make_system(rng)

    @jax.jit
    def f(pos):
        nbrs = neighbor_list(pos, s.box, s.mask, s.r_cut, capacity=4)
        d = coord_diffs(pos, s.box, nbrs)
        return (d**2).sum()

    v = f(s.pos)
    assert np.isfinite(float(v))
    g = jax.grad(f)(s.pos)
    assert np.isfinite(np.asarray(g)).all()


def test_concatenate():
    rng = np.random.default_rng(7)
    a, b = make_system(rng, B=2, n_real=[8, 7]), make_system(rng, B=3)
    c = concatenate([a, b])
    assert c.num_mols == 5
    assert np.allclose(np.asarray(c.pos[:2]), np.asarray(a.pos))


def test_system_is_pytree():
    rng = np.random.default_rng(8)
    s = make_system(rng)
    leaves = jax.tree_util.tree_leaves(s)
    assert len(leaves) == 7
    s2 = jax.tree_util.tree_map(lambda x: x, s)
    assert isinstance(s2, System)


def test_get_mol():
    rng = np.random.default_rng(9)
    s = make_system(rng)
    m1 = s.get_mol(1)
    assert m1.num_mols == 1
    np.testing.assert_array_equal(np.asarray(m1.pos[0]), np.asarray(s.pos[1]))
    assert int(m1.num_atoms) == int(s.atoms_per_mol[1])

    # works under jit/vmap (traced index)
    import jax

    def f(i):
        return s.get_mol(i).pos.sum()

    vals = jax.vmap(f)(jnp.arange(s.num_mols))
    np.testing.assert_allclose(np.asarray(vals),
                               np.asarray(s.pos.sum(axis=(1, 2))), rtol=1e-12)
