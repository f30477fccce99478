"""Pallas blockwise pairwise energy vs the dense reference implementations
(interpret mode on CPU), values and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enflow_tpu.flow.loss import lj_potential
from enflow_tpu.ops.pairwise_kernel import (pallas_lj_potential,
                                            pallas_softened_lj_energy)
from enflow_tpu.sim.potentials import softened_lj_energy

DTYPE = jnp.float64


def batch(seed=0, B=2, N=40, n_real=None, spread=3.0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-spread, spread, (B, N, 3))
    mask = np.ones((B, N), bool)
    if n_real is not None:
        mask[:, n_real:] = False
        pos[~mask] = 0.0
    return jnp.asarray(pos, DTYPE), jnp.asarray(mask)


@pytest.mark.parametrize("n_real", [None, 29])
def test_nll_pairwise_matches_dense(n_real):
    pos, mask = batch(seed=1, n_real=n_real)
    dense = lj_potential(pos, mask, 0.3)
    blocked = pallas_lj_potential(pos, mask, 0.3)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(dense),
                               rtol=1e-12)


def test_nll_pairwise_gradient_matches_dense():
    pos, mask = batch(seed=2)
    g_dense = jax.grad(lambda p: lj_potential(p, mask, 0.3).sum())(pos)
    g_block = jax.grad(lambda p: pallas_lj_potential(p, mask, 0.3).sum())(pos)
    np.testing.assert_allclose(np.asarray(g_block), np.asarray(g_dense),
                               rtol=1e-9, atol=1e-12)


def test_md_potential_matches_dense():
    rng = np.random.default_rng(3)
    n = 64
    box = jnp.asarray([6.0, 6.0, 6.0], DTYPE)
    pos = jnp.asarray(rng.uniform(-3, 3, (n, 3)), DTYPE)
    dense = float(softened_lj_energy(pos, box, 0.1, 2.5))
    blocked = float(pallas_softened_lj_energy(pos, box, 0.1, 2.5))
    assert blocked == pytest.approx(dense, rel=1e-12)

    f_dense = jax.grad(lambda p: softened_lj_energy(p, box, 0.1, 2.5))(pos)
    f_block = jax.grad(
        lambda p: pallas_softened_lj_energy(p, box, 0.1, 2.5))(pos)
    np.testing.assert_allclose(np.asarray(f_block), np.asarray(f_dense),
                               rtol=1e-9, atol=1e-12)


def test_multi_tile_padding_path():
    """N > TILE exercises the column loop; padded atoms contribute nothing."""
    from enflow_tpu.ops import pairwise_kernel as pk
    old = pk.TILE
    pk.TILE = 16          # force multiple tiles at test size
    try:
        pos, mask = batch(seed=4, B=1, N=50, n_real=45, spread=4.0)
        dense = lj_potential(pos, mask, 0.2)
        blocked = pallas_lj_potential(pos, mask, 0.2)
        np.testing.assert_allclose(np.asarray(blocked), np.asarray(dense),
                                   rtol=1e-12)
        g_d = jax.grad(lambda p: lj_potential(p, mask, 0.2).sum())(pos)
        g_b = jax.grad(
            lambda p: pallas_lj_potential(p, mask, 0.2).sum())(pos)
        np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_d),
                                   rtol=1e-9, atol=1e-12)
    finally:
        pk.TILE = old


def test_nll_pair_impl_pallas_matches_dense():
    """alchemical_nll(pair_impl='pallas') equals the dense NLL, grads incl."""
    from enflow_tpu.data.system import System
    from enflow_tpu.flow.loss import alchemical_nll

    rng = np.random.default_rng(5)
    B, N, NF = 2, 20, 3
    sys = System(
        h=jnp.asarray(rng.normal(size=(B, N, NF)), DTYPE),
        g=jnp.asarray(rng.normal(size=(B, N, NF)), DTYPE),
        pos=jnp.asarray(rng.uniform(-2, 2, (B, N, 3)), DTYPE),
        vel=jnp.asarray(rng.normal(size=(B, N, 3)), DTYPE),
        mask=jnp.ones((B, N), bool),
        box=jnp.full((B, 3), 10.0, DTYPE),
        r_cut=jnp.full((B,), 3.0, DTYPE),
    )
    ldj = jnp.asarray(rng.normal(size=(B,)), DTYPE)
    d = alchemical_nll(sys, ldj, 1.2, 0.1)
    p = alchemical_nll(sys, ldj, 1.2, 0.1, pair_impl="pallas")
    assert float(p) == pytest.approx(float(d), rel=1e-12)

    g_d = jax.grad(lambda x: alchemical_nll(sys.replace(pos=x), ldj, 1.2,
                                            0.1))(sys.pos)
    g_p = jax.grad(lambda x: alchemical_nll(sys.replace(pos=x), ldj, 1.2,
                                            0.1, pair_impl="pallas"))(sys.pos)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_d), rtol=1e-9,
                               atol=1e-12)
