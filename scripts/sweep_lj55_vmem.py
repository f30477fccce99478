"""Scoped-VMEM compiler-option sweep at LJ55 shapes (VERDICT r3 item 3).

The 32 MiB scoped-VMEM budget in ``bench.TPU_COMPILER_OPTIONS`` was tuned
at LJ13 shapes only (r2). This sweeps the same knob on the REAL bench_lj55
program (P=1024, N=55, 5-layer H=128 flow, HMC rejuvenation) at n_temps=4
— the compiled graph is identical to n_temps=16 (scan body), ~2 s/run.

Prints one JSON line mapping budget (KiB) -> pipelined s/SMC.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_lj55_vmem.py
(each distinct option set is a fresh ~400 s remote compile; ~25 min total.)
"""

import json
import sys
import time

import numpy as np

import jax

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

N_ATOMS, N_TEMPS, P = 55, 4, 1024
BUDGETS_KIB = [None, 16384, 32768, 49152, 65536]   # None = compiler default
REPS = 3


def main():
    bench.enable_compilation_cache()
    run = bench.build(n_atoms=N_ATOMS, n_temps=N_TEMPS, remat=True)
    fn = jax.jit(lambda k: run(k, P))
    lowered = fn.lower(jax.random.PRNGKey(1))

    out = {}
    for kib in BUDGETS_KIB:
        opts = ({} if kib is None
                else {"xla_tpu_scoped_vmem_limit_kib": str(kib)})
        t0 = time.time()
        compiled = lowered.compile(compiler_options=opts)
        t_compile = time.time() - t0
        res = compiled(jax.random.PRNGKey(1))
        jax.block_until_ready(res.particles)
        t0 = time.time()
        for i in range(REPS):
            res = compiled(jax.random.PRNGKey(2 + i))
        jax.block_until_ready(res.particles)
        dt = (time.time() - t0) / REPS
        label = "default" if kib is None else str(kib)
        out[label] = {"s_per_smc": round(dt, 4),
                      "compile_s": round(t_compile, 1)}
        print(f"# vmem {label}: {dt:.3f} s/SMC (compile {t_compile:.0f} s)",
              file=sys.stderr, flush=True)

    print(json.dumps({"metric": "lj55_vmem_sweep", "P": P,
                      "n_atoms": N_ATOMS, "n_temps": N_TEMPS, **out,
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
