"""Test configuration: run on CPU with 8 virtual devices so that sharded
(pjit/shard_map) code paths are exercised without TPU hardware, and enable
float64 so invertibility oracles can be checked at tight tolerance.

Must run before any ``jax`` import in test modules.
"""

import os

# Force CPU: the ambient environment sets JAX_PLATFORMS=axon (TPU tunnel),
# which would funnel every tiny test compile through remote compilation.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
