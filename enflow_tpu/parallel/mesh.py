"""Device-mesh utilities: the TPU-native replacement for torch DDP/NCCL.

The reference scales by wrapping the model in ``DistributedDataParallel`` over
an NCCL process group initialized from SLURM env vars (reference
``enflow/main.py:42-60,159``) with explicit epoch-loss ``all_reduce``
(main.py:232) and barriers (main.py:261).

Here there is no process-group plumbing at all (SURVEY §5): a
``jax.sharding.Mesh`` over the slice, batches placed with a ``NamedSharding``
over the ``data`` axis, parameters replicated. Under ``jit``, XLA's SPMD
partitioner inserts the gradient/loss collectives automatically over ICI —
the train-step *body* is identical single-chip and multi-chip.

Multi-host: call ``maybe_initialize_distributed()`` first (the
``jax.distributed`` equivalent of the reference's ``init_process_group``);
per-host data sharding is the loader's ``shard=(num_shards, index)``.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed():
    """Initialize multi-host JAX from standard env vars when present
    (no-op single-host). SLURM-compatible like the reference's launcher
    (reference __main__.py:6): an explicit ``COORDINATOR_ADDRESS`` wins,
    else a multi-task SLURM allocation triggers JAX's cluster
    auto-detection."""
    if os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("SLURM_NTASKS",
                                             os.environ.get("NUM_PROCESSES", 1))),
            process_id=int(os.environ.get("SLURM_PROCID",
                                          os.environ.get("PROCESS_ID", 0))),
        )
    elif int(os.environ.get("SLURM_NTASKS", "1")) > 1:
        jax.distributed.initialize()    # SLURM env auto-detection


def get_mesh(axes=("data",), shape=None, devices=None) -> Mesh:
    """Build a mesh over the given devices (default: all).

    ``shape`` partitions the device list across ``axes``; default puts every
    device on the first axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axes)


def _place(tree, sharding, from_process_local):
    """Place host data onto a (possibly multi-host) sharding.

    ``jax.device_put`` cannot target devices of other processes; on
    multi-host meshes each process contributes its *local* block (its
    loader shard for batches, its identical full copy for replicated
    parameters) via ``jax.make_array_from_process_local_data`` — the
    JAX-native counterpart of the reference's per-rank DistributedSampler
    feed (reference main.py:142-143).
    """
    if from_process_local is None:
        from_process_local = jax.process_count() > 1
    if from_process_local:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh, axis="data", from_process_local=None):
    """Place a batched pytree with its leading axis sharded over ``axis``.

    Multi-host: ``batch`` is this process's loader shard (global batch =
    concatenation over processes); single-host: the full batch.
    """
    return _place(batch, NamedSharding(mesh, P(axis)), from_process_local)


def replicate(tree, mesh: Mesh, from_process_local=None):
    """Replicate a pytree (parameters/optimizer state) across the mesh.

    Multi-host: every process must hold an identical copy (true for the
    seeded parameter init and for checkpoint loads)."""
    return _place(tree, NamedSharding(mesh, P()), from_process_local)
