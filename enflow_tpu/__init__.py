"""enflow_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for E(n)-equivariant
normalizing flows over molecular coordinates ("alchemical" flows).

Capability parity target: bharath-raghavan/enflow (see /root/reference), re-designed
TPU-first:

- Immutable pytree state (`enflow_tpu.data.system.System`) with fixed, padded shapes
  instead of the reference's mutable flat-batched `Data` (reference
  ``enflow/data/base.py:21-144``).
- Dense / fixed-capacity neighbor lists built with static shapes under ``jit``
  instead of the 27-periodic-image dynamic edge list (reference
  ``enflow/data/base.py:122-144``).
- Flow integrators as ``lax.scan`` over stacked per-step parameters (reference:
  Python loop over ``nn.ModuleList``, ``enflow/flow/dynamics.py:12-21``).
- JAX-native Lennard-Jones MD engine (Langevin + FIRE minimization) replacing the
  OpenMM dependency for latent sampling (reference ``enflow/data/simulated.py``,
  ``enflow/data/lj.py``).
- Data parallelism via ``jax.sharding.Mesh`` + collectives instead of torch
  DDP/NCCL (reference ``enflow/main.py:42-60``).
- Flow-proposal SMC / AIS and HMC/NUTS refinement samplers (north-star extensions).
"""

__version__ = "0.1.0"
