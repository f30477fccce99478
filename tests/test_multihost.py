"""Real multi-process (2-host) training e2e on CPU.

The mesh/dryrun tests exercise multi-*device* sharding inside one process;
this spawns two actual processes joined through ``jax.distributed`` (the
reference's NCCL/SLURM analogue, reference main.py:42-60) and runs the YAML
train driver end-to-end: per-process loader shards combine into one global
batch over the 2-device mesh, gradient reductions ride XLA collectives, and
rank 0 alone writes the checkpoint and metrics CSV.

Each worker pins ``jax_platforms`` to cpu *in code* — the environment may
force a different default platform at interpreter start, so an env var set
here would be too late.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

YAML = """\
mode: train
units: {time: pico, dist: ang}
precision: float32
seed: 3
dataset:
  type: lj
  n_atoms: 13
  box: [17.0, 17.0, 17.0]
  temp: 120
  n_iter: 400
  interval: 40
  discard: -1
  dt: 0.004
  friction: 1
  softening: 0.1
  gap: 2
  r_cut: 10.2
dynamics:
  integrator: lf
  n_iter: 2
  dt: 1
  checkpoint_path: model_mh.cpt
  network: {hidden_nf: 32}
training:
  num_epochs: 3
  batch_size: 5
  lr: 1e-3
  scheduler: No
  loss: {temp: 120, softening: 0.1}
  log_interval: 1
  metrics_csv: metrics_mh.csv
"""

WORKER = """\
import sys, jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
from enflow_tpu.__main__ import main
sys.exit(main(sys.argv[1:]))
"""


SAMPLE_YAML = """\
mode: sample
units: {time: pico, dist: ang}
precision: float32
seed: 4
dynamics:
  checkpoint_path: model_mh.cpt
  nbr_mode: all_pairs
sampling:
  algo: smc
  n_particles: 64
  n_temps: 4
  mcmc_steps: 1
  step_size: 0.05
  n_leapfrog: 2
  output: samples_mh.npz
  target: {type: lj_cluster, n_atoms: 13, kBT: 2.0, c_osc: 0.5}
"""


VI_YAML = """\
mode: train
units: {time: pico, dist: ang}
precision: float32
seed: 5
dynamics:
  integrator: lf
  n_iter: 2
  dt: 1
  checkpoint_path: model_vi.cpt
  nbr_mode: all_pairs
  network: {hidden_nf: 16, node_nf: 3}
training:
  objective: flow_vi
  num_epochs: 2
  steps_per_epoch: 4
  n_particles: 32
  lr: 1e-3
  scheduler: No
  log_interval: 1
  metrics_csv: metrics_vi.csv
  target: {type: lj_cluster, n_atoms: 6, kBT: 2.0, c_osc: 0.5}
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn_pair(tmp_path, env, cfg_name):
    procs = []
    for pid in (0, 1):
        e = dict(env, PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "worker.py", cfg_name],
            cwd=tmp_path, env=e, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    return outs


def test_two_process_train_e2e(tmp_path):
    (tmp_path / "train_mh.yaml").write_text(YAML)
    (tmp_path / "worker.py").write_text(textwrap.dedent(WORKER))

    env = dict(os.environ)
    env["COORDINATOR_ADDRESS"] = f"localhost:{_free_port()}"
    env["NUM_PROCESSES"] = "2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # one device per process (conftest's 8-virtual-device XLA_FLAGS would
    # otherwise leak in and give a 16-device global mesh)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

    procs = []
    for pid in (0, 1):
        e = dict(env, PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "worker.py", "train_mh.yaml"],
            cwd=tmp_path, env=e, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    # rank 0 alone writes the checkpoint + CSV (reference main.py:235-250)
    assert outs[0].count("State saved") == 3
    assert outs[1].count("State saved") == 0
    rows = (tmp_path / "metrics_mh.csv").read_text().strip().splitlines()
    assert len(rows) == 4, rows                      # header + 3 epochs
    header = rows[0].split(",")
    i_bat = header.index("batches")
    losses = [float(r.split(",")[2]) for r in rows[1:]]
    assert all(np.isfinite(losses))
    # per-process shards (5 each) combined into ONE global batch of 10
    assert all(int(r.split(",")[i_bat]) == 1 for r in rows[1:])
    # exact neighbor format (dense) -> runtime overflow counter reads 0
    i_ovf = header.index("nbr_overflow")
    assert all(int(r.split(",")[i_ovf]) == 0 for r in rows[1:])
    assert (tmp_path / "model_mh.cpt").exists()

    # --- 2-process flow-SMC from the checkpoint: particles sharded over
    # the 2-device mesh, shards allgathered, rank 0 alone writes the npz
    (tmp_path / "sample_mh.yaml").write_text(SAMPLE_YAML)
    env["COORDINATOR_ADDRESS"] = f"localhost:{_free_port()}"
    procs = []
    for pid in (0, 1):
        e = dict(env, PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "worker.py", "sample_mh.yaml"],
            cwd=tmp_path, env=e, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert "sampled 64 particles" in outs[0]
    assert "sampled" not in outs[1]
    with np.load(tmp_path / "samples_mh.npz") as z:
        assert z["pos"].shape == (64, 13, 3)
        assert np.isfinite(z["log_weights"]).all()
        assert np.isfinite(float(z["log_Z"]))


def test_two_process_flow_vi(tmp_path):
    """Data-free flow-VI with the particle axis sharded across two
    processes: replicated params, GSPMD gradient reductions, rank-0
    checkpoint/CSV."""
    (tmp_path / "vi.yaml").write_text(VI_YAML)
    (tmp_path / "worker.py").write_text(textwrap.dedent(WORKER))
    env = dict(os.environ)
    env["COORDINATOR_ADDRESS"] = f"localhost:{_free_port()}"
    env["NUM_PROCESSES"] = "2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

    outs = _spawn_pair(tmp_path, env, "vi.yaml")
    # rank 0 alone prints the epoch table and writes the CSV (2 epochs ->
    # exactly 3 rows; a second writer would interleave more)
    assert outs[0].count("1.00e-03") == 2
    assert outs[1].count("1.00e-03") == 0
    rows = (tmp_path / "metrics_vi.csv").read_text().strip().splitlines()
    assert len(rows) == 3
    assert all(np.isfinite(float(r.split(",")[2])) for r in rows[1:])
    assert (tmp_path / "model_vi.cpt").exists()


SCALING_WORKER = """\
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.distributed.initialize(
    coordinator_address=os.environ["COORDINATOR_ADDRESS"],
    num_processes=2, process_id=int(os.environ["PROCESS_ID"]))
assert jax.device_count() == 8, jax.devices()
assert len(jax.local_devices()) == 4
sys.path.insert(0, {repo!r})
from jax.sharding import NamedSharding, PartitionSpec as P
import bench
from enflow_tpu.parallel.mesh import get_mesh

mesh = get_mesh(("chain",))
spec = NamedSharding(mesh, P("chain"))
run = bench.build(
    compute_dtype=None,    # bf16 is emulated (slow) on CPU
    constrain=lambda a: jax.lax.with_sharding_constraint(a, spec))


def check(res):
    pos = res.particles["pos"]
    assert len(pos.sharding.device_set) == 8, pos.sharding
    shards = pos.addressable_shards
    assert len(shards) == 4                      # this process's 4 devices
    assert all(s.data.shape[0] == 4 for s in shards)   # 32 particles / 8


r = bench.timed_rate(run, 32, repeats=1, tpu_opts=False, check=check)
import numpy as np
assert np.isfinite(r.log_Z), r.log_Z
print(f"SCALING SMOKE OK rate={{r.rate:.1f}} log_Z={{r.log_Z:.3f}}",
      flush=True)
"""


def test_two_process_bench_scaling_smoke(tmp_path):
    """2-process x 4-virtual-device weak-scaling smoke (VERDICT r2 item 2):
    drives ``bench.build()`` — the exact program ``bench_scaling.py`` runs —
    through the multi-process sample path, so the first real multi-chip
    scaling run has no untested seams: cross-process mesh construction,
    sharding constraint propagation through the SMC collectives, and
    result access via addressable shards."""
    (tmp_path / "worker.py").write_text(SCALING_WORKER.format(repo=REPO))
    env = dict(os.environ)
    env["COORDINATOR_ADDRESS"] = f"localhost:{_free_port()}"
    env["NUM_PROCESSES"] = "2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    procs = []
    for pid in (0, 1):
        e = dict(env, PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "worker.py"],
            cwd=tmp_path, env=e, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    for out in outs:
        assert "SCALING SMOKE OK" in out


REMC_YAML = """\
mode: sample
units: {time: pico, dist: ang}
precision: float32
seed: 6
dynamics:
  checkpoint_path: model_vi.cpt
  nbr_mode: all_pairs
sampling:
  algo: remc
  n_particles: 8
  n_temps: 3
  n_rounds: 6
  discard_rounds: 2
  mcmc_steps: 1
  step_size: 0.05
  n_leapfrog: 2
  mbar: true
  mbar_pool_rounds: 2
  mbar_blocks: 2
  output: samples_remc.npz
  target: {type: lj_cluster, n_atoms: 6, kBT: 2.0, c_osc: 0.5}
"""


def test_two_process_remc_e2e(tmp_path):
    """2-process flow-bridged REMC + MBAR (VERDICT r2 item 3): the chain
    axis is sharded over the 2-device mesh; the gathered result must keep
    its global axes intact — samples [R-discard, M_global, ...], x_final
    per-state bookkeeping feeding a finite multi-process mbar_log_Z."""
    (tmp_path / "vi.yaml").write_text(VI_YAML.replace("num_epochs: 2",
                                                      "num_epochs: 1"))
    (tmp_path / "remc.yaml").write_text(REMC_YAML)
    (tmp_path / "worker.py").write_text(textwrap.dedent(WORKER))
    env = dict(os.environ)
    env["NUM_PROCESSES"] = "2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

    # single-process prep run to produce the checkpoint REMC resumes from
    prep_env = {k: v for k, v in env.items()
                if k not in ("COORDINATOR_ADDRESS", "NUM_PROCESSES")}
    out = subprocess.run([sys.executable, "worker.py", "vi.yaml"],
                         cwd=tmp_path, env=prep_env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True, timeout=420)
    assert out.returncode == 0, out.stdout[-2000:]

    env["COORDINATOR_ADDRESS"] = f"localhost:{_free_port()}"
    outs = _spawn_pair(tmp_path, env, "remc.yaml")
    assert "remc: 6 rounds x 8 chains x 3 temps" in outs[0]
    assert "remc:" not in outs[1]
    with np.load(tmp_path / "samples_remc.npz") as z:
        # global axes intact: [R - discard, M_global, N, 3] — a rounds-axis
        # concat (the pre-fix failure mode) would give 8 kept rounds of 4
        # chains instead
        assert z["pos"].shape == (4, 8, 6, 3)
        assert z["betas"].shape == (3,)
        assert z["swap_accept"].shape == (2,)
        assert np.isfinite(float(z["mbar_log_Z"]))
        assert np.isfinite(z["mbar_log_Z_blocks"]).all()


ATOM_SAMPLE_YAML = """\
mode: sample
units: {time: pico, dist: ang}
precision: float32
seed: 7
parallel: {atom_axis: 2}
dynamics:
  integrator: lf
  n_iter: 2
  dt: 0.05
  checkpoint_path: ""
  nbr_mode: all_pairs
  network: {hidden_nf: 8, node_nf: 3}
sampling:
  algo: smc
  n_particles: 16
  n_temps: 3
  mcmc_steps: 1
  step_size: 0.05
  n_leapfrog: 2
  output: samples_atom.npz
  target:
    type: lj_cluster
    n_atoms: 5
    kBT: 2.0
    softening: 0.1
    e_cap: 1000.0
"""


def test_two_process_atom_sharded_sample(tmp_path):
    """2-process (chain x atom) sample mode (VERDICT r3 item 1c): 4 global
    devices form a ("data"=2, "atom"=2) mesh spanning both processes —
    chains shard across processes, each molecule's atoms shard within one,
    and the ring-EGCL shard_map densities run under GSPMD global arrays.
    n_atoms=5 pads to 6 on the atom axis; rank 0 writes the npz trimmed
    back to 5 atoms."""
    (tmp_path / "atom_sample.yaml").write_text(ATOM_SAMPLE_YAML)
    (tmp_path / "worker.py").write_text(textwrap.dedent(WORKER))
    env = dict(os.environ)
    env["COORDINATOR_ADDRESS"] = f"localhost:{_free_port()}"
    env["NUM_PROCESSES"] = "2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    outs = _spawn_pair(tmp_path, env, "atom_sample.yaml")
    assert "sampled 16 particles" in outs[0]
    assert "sampled" not in outs[1]
    with np.load(tmp_path / "samples_atom.npz") as z:
        assert z["pos"].shape == (16, 5, 3)
        assert z["h"].shape == (16, 5, 3)
        assert np.isfinite(z["log_weights"]).all()
        assert np.isfinite(float(z["log_Z"]))


def test_import_is_backend_free():
    """Importing the package must not instantiate an XLA backend:
    jax.distributed.initialize() (driver startup, multi-host workers)
    requires a pristine backend state, so any module-level jnp constant is
    a multi-host-breaking bug (regression: data/neighbors._IMAGE_OFFSETS
    as jnp.array broke every multi-process run)."""
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from jax._src import xla_bridge\n"
        "import enflow_tpu.train.driver\n"
        "import enflow_tpu.data.readers\n"
        "import enflow_tpu.sample\n"
        "assert not xla_bridge._backends, "
        "f'backend initialized at import: {list(xla_bridge._backends)}'\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]


ATOM_REMC_YAML = """\
mode: sample
units: {time: pico, dist: ang}
precision: float32
seed: 9
parallel: {atom_axis: 2}
dynamics:
  integrator: lf
  n_iter: 2
  dt: 0.05
  checkpoint_path: ""
  nbr_mode: all_pairs
  network: {hidden_nf: 8, node_nf: 3}
sampling:
  algo: remc
  n_particles: 8
  n_temps: 3
  n_rounds: 6
  discard_rounds: 2
  mcmc_steps: 1
  step_size: 0.05
  n_leapfrog: 2
  mbar: true
  mbar_pool_rounds: 2
  mbar_blocks: 2
  output: samples_atom_remc.npz
  target:
    type: lj_cluster
    n_atoms: 5
    kBT: 2.0
    softening: 0.1
    e_cap: 1000.0
"""


def test_two_process_atom_sharded_remc_mbar(tmp_path):
    """2-process atom-sharded REMC + MBAR (VERDICT r4 item 5): the MBAR
    component energies u_k(x_n) are evaluated SPMD on the GLOBAL arrays
    (shard_map densities cannot run on gathered host copies — the old
    NotImplementedError), only the small energy matrix is gathered, and
    the replicated solve matches a single-process run of the identical
    mesh/config."""
    (tmp_path / "atom_remc.yaml").write_text(ATOM_REMC_YAML)
    (tmp_path / "worker.py").write_text(textwrap.dedent(WORKER))
    env = dict(os.environ)
    env["NUM_PROCESSES"] = "2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

    # single-process reference on the same ("data"=1, "atom"=2) mesh
    ref_env = {k: v for k, v in env.items()
               if k not in ("COORDINATOR_ADDRESS", "NUM_PROCESSES")}
    ref_env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    out = subprocess.run([sys.executable, "worker.py", "atom_remc.yaml"],
                         cwd=tmp_path, env=ref_env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True, timeout=420)
    assert out.returncode == 0, out.stdout[-2000:]
    with np.load(tmp_path / "samples_atom_remc.npz") as z:
        ref_log_Z = float(z["mbar_log_Z"])
        ref_pos = np.array(z["pos"])
    (tmp_path / "samples_atom_remc.npz").unlink()

    env["COORDINATOR_ADDRESS"] = f"localhost:{_free_port()}"
    outs = _spawn_pair(tmp_path, env, "atom_remc.yaml")
    assert "remc: 6 rounds x 8 chains x 3 temps" in outs[0]
    with np.load(tmp_path / "samples_atom_remc.npz") as z:
        assert z["pos"].shape == (4, 8, 5, 3)      # trimmed to 5 atoms
        assert np.isfinite(float(z["mbar_log_Z"]))
        assert np.isfinite(z["mbar_log_Z_blocks"]).all()
        # same mesh shape + same seed: the 2-process run is the same SPMD
        # program — samples and the MBAR solve agree with single-process
        np.testing.assert_allclose(np.array(z["pos"]), ref_pos, atol=1e-5)
        assert abs(float(z["mbar_log_Z"]) - ref_log_Z) < 1e-3


TI_SAMPLE_YAML = """\
mode: sample
units: {time: pico, dist: ang}
precision: float32
seed: 8
dynamics:
  integrator: lf
  n_iter: 2
  dt: 0.05
  checkpoint_path: ""
  nbr_mode: all_pairs
  network: {hidden_nf: 8, node_nf: 3}
sampling:
  algo: ti
  n_particles: 16
  ti_nodes: 4
  n_samples: 10
  n_warmup: 4
  step_size: 0.05
  n_leapfrog: 2
  chunk_steps: 6
  output: samples_ti.npz
  metrics_csv: ti_nodes.csv
  target: {type: lj_cluster, n_atoms: 13, kBT: 2.0, c_osc: 0.5}
"""


def test_two_process_ti_e2e(tmp_path):
    """2-process thermodynamic integration: chains shard over the 2-device
    mesh, per-node integrand stats reduce ON DEVICE to replicated scalars
    (np.asarray on the sharded [C] chain axis would raise non-addressable —
    the bug this test pins), and rank 0 writes the gathered beta=1 chains
    + node table."""
    (tmp_path / "ti.yaml").write_text(TI_SAMPLE_YAML)
    (tmp_path / "worker.py").write_text(textwrap.dedent(WORKER))
    env = dict(os.environ)
    env["NUM_PROCESSES"] = "2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["COORDINATOR_ADDRESS"] = f"localhost:{_free_port()}"
    outs = _spawn_pair(tmp_path, env, "ti.yaml")
    assert "TI over 4 nodes x 16 chains" in outs[0]
    assert "TI over" not in outs[1]
    with np.load(tmp_path / "samples_ti.npz") as z:
        assert z["pos"].shape == (16, 13, 3)
        assert np.isfinite(float(z["log_Z"]))
        assert z["betas"].shape == (4,)
        assert np.isfinite(z["node_mean"]).all()
