"""Scaling-efficiency benchmark: chain-sharded LJ13 flow-SMC over all chips.

The BASELINE.md scaling target is >= 80% samples/s efficiency from 1 chip to
N >= 2 hosts. This script measures it whenever more than one device is
visible: it runs the same flow-SMC program as ``bench.py`` with particles
sharded over a ``chain`` mesh axis (resampling gathers and weight
normalizations become XLA collectives), at fixed per-chip work (weak
scaling: P = 1024 * n_chips), for every power-of-two prefix of the device
list. On a single chip it reports efficiency 1.0 with a note — round 1 had
one v5e chip, so this is the harness for multi-chip rounds, kept separate
from ``bench.py`` so the headline metric stays comparable across rounds.

Prints ONE JSON line:
  {"metric": "lj13_flow_smc_scaling_efficiency", "value": eff_at_max,
   "unit": "fraction", "vs_baseline": eff/0.8, "per_n": {...}}
"""

import json
import time

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import bench
from enflow_tpu.parallel.mesh import get_mesh

P_PER_CHIP = 1024
REPEATS = 3


def sharded_rate(n_dev):
    """samples/s for the bench SMC with particles sharded over n_dev chips."""
    devices = jax.devices()[:n_dev]
    mesh = get_mesh(("chain",), devices=devices)
    run = bench.build()
    Pn = P_PER_CHIP * n_dev

    fn = jax.jit(lambda k: run(k, Pn),
                 in_shardings=NamedSharding(mesh, P()),
                 out_shardings=None)

    key = jax.device_put(jax.random.PRNGKey(1), NamedSharding(mesh, P()))
    res = fn(key)
    jax.block_until_ready(res.particles)
    t0 = time.perf_counter()
    for i in range(REPEATS):
        res = fn(jax.device_put(jax.random.PRNGKey(2 + i),
                                NamedSharding(mesh, P())))
    jax.block_until_ready(res.particles)
    dt = (time.perf_counter() - t0) / REPEATS
    assert float(res.beta_history[-1]) > 1.0 - 1e-5, "anneal incomplete"
    return Pn / dt


def main():
    n = len(jax.devices())
    sizes = [1]
    while sizes[-1] * 2 <= n:
        sizes.append(sizes[-1] * 2)

    rates = {k: sharded_rate(k) for k in sizes}
    base = rates[1]
    per_n = {str(k): {"samples_per_s": round(v, 1),
                      "efficiency": round(v / (k * base), 4)}
             for k, v in rates.items()}
    n_max = sizes[-1]
    eff = rates[n_max] / (n_max * base)

    print(json.dumps({
        "metric": "lj13_flow_smc_scaling_efficiency",
        "value": round(eff, 4),
        "unit": "fraction",
        "vs_baseline": round(eff / 0.8, 3),   # target: >= 0.8 (BASELINE.md)
        "n_chips": n_max,
        "per_n": per_n,
        "note": ("single-chip round: efficiency trivially 1.0; rerun on a "
                 "multi-chip slice" if n_max == 1 else
                 "weak scaling at 1024 particles/chip"),
    }))


if __name__ == "__main__":
    main()
