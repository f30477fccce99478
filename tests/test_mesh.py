"""Mesh placement utilities (parallel/mesh.py): sharding + replication.

The multi-host branch (``jax.make_array_from_process_local_data``) cannot be
exercised across real processes here, but it also works single-process —
these tests pin that both placement paths produce identical global arrays
with the intended shardings on the 8-virtual-device mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from enflow_tpu.parallel.mesh import get_mesh, replicate, shard_batch


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return get_mesh(("data",), devices=jax.devices()[:8])


def test_shard_batch_paths_agree(mesh):
    x = {"a": np.arange(8 * 3, dtype=np.float64).reshape(8, 3),
         "b": np.ones((8,), np.float64)}
    put = shard_batch(x, mesh, from_process_local=False)
    loc = shard_batch(x, mesh, from_process_local=True)
    for k in x:
        np.testing.assert_array_equal(np.asarray(put[k]), x[k])
        np.testing.assert_array_equal(np.asarray(loc[k]), x[k])
        # actually sharded over all 8 devices on the leading axis
        assert len(put[k].sharding.device_set) == 8
        assert put[k].sharding == loc[k].sharding


def test_replicate_paths_agree(mesh):
    p = {"w": np.full((4, 4), 2.5), "b": np.zeros((4,))}
    rep = replicate(p, mesh, from_process_local=False)
    loc = replicate(p, mesh, from_process_local=True)
    for k in p:
        assert rep[k].sharding.is_fully_replicated
        assert loc[k].sharding.is_fully_replicated
        np.testing.assert_array_equal(np.asarray(rep[k]), p[k])
        np.testing.assert_array_equal(np.asarray(loc[k]), p[k])


def test_sharded_compute_matches_host(mesh):
    x = np.arange(16 * 2, dtype=np.float64).reshape(16, 2)
    xs = shard_batch(x, mesh, from_process_local=True)
    got = jax.jit(lambda a: (a * a).sum())(xs)
    assert float(got) == pytest.approx(float((x * x).sum()))
