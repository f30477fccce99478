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
    (reference __main__.py:6)."""
    if os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("SLURM_NTASKS",
                                             os.environ.get("NUM_PROCESSES", 1))),
            process_id=int(os.environ.get("SLURM_PROCID",
                                          os.environ.get("PROCESS_ID", 0))),
        )


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


def shard_batch(batch, mesh: Mesh, axis="data"):
    """Place a batched pytree with its leading axis sharded over ``axis``."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(batch, sharding)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (parameters/optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
