"""Scaling-efficiency benchmark: chain-sharded LJ13 flow-SMC over all chips.

The BASELINE.md scaling target is >= 80% samples/s efficiency from 1 chip to
N >= 2 hosts. This script measures it whenever more than one device is
visible: it runs the same flow-SMC program as ``bench.py`` with the particle
axis pinned to a ``chain`` mesh axis via a sharding constraint on the latent
draws (GSPMD propagates it through the flow, the resampling gathers, and the
weight normalizations, which become collectives), at fixed per-chip work
(weak scaling: P = 1024 * n_chips), for every power-of-two prefix of the
device list. On a single chip it reports efficiency 1.0 with a note —
round 1 had one v5e chip, so this is the harness for multi-chip rounds,
kept separate from ``bench.py`` so the headline metric stays comparable
across rounds. Timing methodology is ``bench.timed_rate`` itself (shared,
not copied). A sanity assert verifies the final particles actually live on
all n chips rather than being silently replicated.
"""

import json

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

import bench
from enflow_tpu.parallel.mesh import get_mesh

P_PER_CHIP = 1024


def sharded_rate(n_dev):
    """samples/s for the bench SMC with particles sharded over n_dev chips."""
    devices = jax.devices()[:n_dev]
    mesh = get_mesh(("chain",), devices=devices)
    spec = NamedSharding(mesh, P("chain"))
    run = bench.build(
        constrain=lambda a: jax.lax.with_sharding_constraint(a, spec))
    Pn = P_PER_CHIP * n_dev

    def check_sharded(res):
        n_holding = len(res.particles["pos"].sharding.device_set)
        assert n_holding == n_dev, (
            f"particles not sharded: on {n_holding}/{n_dev} devices")

    return bench.timed_rate(run, Pn, check=check_sharded).rate


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
                 f"weak scaling at {P_PER_CHIP} particles/chip"),
    }))


if __name__ == "__main__":
    main()
