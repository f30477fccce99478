"""Benchmark: LJ55 flow-proposal SMC throughput on one chip (large-N line).

Frozen large-cluster companion to ``bench.py`` (VERDICT r2 item 5): the
LJ13 headline cannot see large-N progress — cell lists, rematerialization
and fused-kernel work only differentiate where the [P, N, N, H] edge
tensors dominate. Workload: 1024 particles x 55 atoms x 16 temperatures,
same 5-layer hidden-128 EGCL flow, HMC rejuvenation with gradients through
the full flow (``example/sample_lj55.yaml`` scale; needs ``remat=True`` —
without flow-step rematerialization the saved edge activations need ~36 GB
HBM, RESULTS.md r1).

Prints ONE JSON line like bench.py. Not the driver's headline metric —
record the numbers in RESULTS.md each round alongside the LJ13 line.

NOTE the quality fields (ess_per_s, log_Z) are degenerate by design here:
the untrained proposal collapses the N=55 anneal to one ancestor
(ESS trivially = P). This is a pure THROUGHPUT line — for meaningful LJ55
sampling quality run example/vi_lj55.yaml then sample_lj55.yaml from the
checkpoint (measured r3: per-stage ESS 58-742/1024, RESULTS.md).
"""

import json

import jax

import bench

N_ATOMS = 55
N_TEMPS = 16
P_TPU = 1024
P_CPU = 32

# N=55-tuned scoped-VMEM budget (r4 sweep, scripts/sweep_lj55_vmem.py):
# 48 MiB gives 1.932 s/SMC vs 2.291 default and 2.123 at the LJ13-tuned
# 32 MiB (-15.7%/-9%); 64 MiB ties 48 (1.931). The larger N=55 edge
# tensors keep paying for VMEM past the LJ13 optimum.
TPU_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "49152"}


def main():
    # persistent compilation cache (VERDICT r3 item 6): the ~400 s LJ55
    # compile is paid once per code change; later invocations reach
    # measurement in seconds (compile_s in the JSON records which happened)
    bench.enable_compilation_cache()
    run = bench.build(n_atoms=N_ATOMS, n_temps=N_TEMPS, remat=True)
    dev = jax.devices()[0]
    r = bench.timed_rate(run, P_TPU, tpu_opts=TPU_COMPILER_OPTIONS)

    print(json.dumps({
        "metric": "lj55_flow_smc_samples_per_s_per_chip",
        "value": round(r.rate, 2),
        "unit": "samples/s",
        "ess_per_s": round(r.ess_rate, 2),
        "log_Z": round(r.log_Z, 3),
        "wall_s_per_smc": round(r.dt, 3),
        "wall_spread_s": [round(min(r.times), 3), round(max(r.times), 3)],
        "particles": P_TPU,
        "n_atoms": N_ATOMS,
        "n_temps": N_TEMPS,
        "compile_s": round(r.compile_s, 1),
        "device": str(dev),
        **bench.flops_fields(
            r, dev, bench.analytic_smc_flops(P_TPU, N_ATOMS, N_TEMPS)),
    }))


if __name__ == "__main__":
    main()
