"""Atom-axis-sharded pairwise energy vs the dense single-device version,
on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enflow_tpu.parallel.mesh import get_mesh
from enflow_tpu.parallel.pairwise import make_sharded_lj_energy
from enflow_tpu.sim.potentials import softened_lj_energy

DTYPE = jnp.float64


@pytest.mark.parametrize("n_atoms,n_real", [(64, 64), (64, 50)])
def test_sharded_matches_dense(n_atoms, n_real):
    rng = np.random.default_rng(0)
    box = jnp.asarray([6.0, 6.0, 6.0], DTYPE)
    pos = jnp.asarray(rng.uniform(-3, 3, (n_atoms, 3)), DTYPE)
    mask = jnp.asarray(np.arange(n_atoms) < n_real)
    pos = jnp.where(mask[:, None], pos, 0.0)

    dense = float(softened_lj_energy(pos, box, 0.1, 3.0, mask))

    mesh = get_mesh(("atom",))
    assert mesh.devices.size == 8
    sharded_fn = make_sharded_lj_energy(mesh, "atom")
    sharded = float(sharded_fn(pos, mask, box, 0.1, 3.0))

    assert sharded == pytest.approx(dense, rel=1e-12)


def test_sharded_gradient_matches_dense():
    rng = np.random.default_rng(1)
    box = jnp.asarray([6.0, 6.0, 6.0], DTYPE)
    pos = jnp.asarray(rng.uniform(-3, 3, (32, 3)), DTYPE)
    mask = jnp.ones((32,), bool)

    g_dense = jax.grad(lambda p: softened_lj_energy(p, box, 0.1, 3.0, mask))(pos)

    mesh = get_mesh(("atom",))
    fn = make_sharded_lj_energy(mesh, "atom")
    g_sharded = jax.grad(lambda p: fn(p, mask, box, 0.1, 3.0))(pos)

    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_dense),
                               atol=1e-10)
