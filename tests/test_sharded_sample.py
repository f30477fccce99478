"""Atom-sharded sampling ((chain x atom) 2-D mesh) vs the dense batched path.

VERDICT r3 item 1: ``sample/sharded.py`` composes the ring EGCL flow and the
ring pair-term targets into batched SMC/AIS densities. The dense oracle is
the SAME builder with ``mesh=None`` — identical draw order and formulas, so
same-seed runs agree to reduction-order round-off (f64 on the CPU mesh).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from enflow_tpu.flow.integrators import FlowConfig, init_flow
from enflow_tpu.nn.egcl import EGCLConfig
from enflow_tpu.parallel.mesh import get_mesh
from enflow_tpu.sample import smc, targets
from enflow_tpu.sample.sharded import make_sample_fns

DTYPE = jnp.float64
NF = 3


def make_flow(n_atoms, seed=0):
    cfg = FlowConfig(n_iter=2, dt=0.05,
                     egcl=EGCLConfig(node_nf=NF, hidden_nf=8),
                     nbr_mode="all_pairs")
    params = init_flow(jax.random.PRNGKey(seed), cfg, DTYPE)
    return cfg, params


@pytest.fixture(scope="module")
def mesh2d():
    # 8 CPU devices -> chains over 4, atoms over 2
    return get_mesh(("data", "atom"), shape=(4, 2))


def _fns(target, n_atoms, mesh=None, n_pad=None):
    cfg, params = make_flow(n_atoms)
    return make_sample_fns(params, cfg, target, n_atoms, NF, DTYPE,
                           box=1e3, r_cut=1e2, mesh=mesh, n_pad=n_pad)


@pytest.mark.parametrize("ttype", ["lj_cluster", "gaussian", "double_well",
                                   "lj_fluid"])
def test_densities_and_propose_match_dense(mesh2d, ttype):
    n_atoms = 4
    if ttype == "lj_cluster":
        t = targets.lj_cluster(n_atoms, kBT=2.0, softening=0.1, e_cap=500.0)
    elif ttype == "gaussian":
        t = targets.gaussian((n_atoms, 3), std=1.3)
    elif ttype == "lj_fluid":
        # box small enough that min-image wrapping is exercised by N(0,1)
        # latent pushforward positions; cutoff below box/2
        t = targets.lj_fluid(n_atoms, box=2.5, kBT=2.0, softening=0.1,
                             cutoff=1.2, e_cap=500.0)
    else:
        t = targets.double_well(n_atoms, dim=3)
    prop_d, q0_d, p_d, pad_d = _fns(t, n_atoms)
    prop_s, q0_s, p_s, pad_s = _fns(t, n_atoms, mesh=mesh2d)
    assert pad_d == pad_s == n_atoms

    key = jax.random.PRNGKey(42)
    x_d = jax.jit(lambda k: prop_d(k, 8))(key)
    x_s = jax.jit(lambda k: prop_s(k, 8))(key)
    for k in x_d:
        np.testing.assert_allclose(np.asarray(x_s[k]), np.asarray(x_d[k]),
                                   atol=1e-10)

    np.testing.assert_allclose(np.asarray(jax.jit(q0_s)(x_d)),
                               np.asarray(jax.jit(q0_d)(x_d)), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(jax.jit(p_s)(x_d)),
                               np.asarray(jax.jit(p_d)(x_d)), rtol=1e-10)


def test_density_gradients_match_dense(mesh2d):
    """HMC rejuvenation differentiates the densities wrt particles — the
    shard_map/ppermute VJP must match the dense batched VJP."""
    from enflow_tpu.sample.mcmc import batched_value_and_grad

    n_atoms = 4
    t = targets.lj_cluster(n_atoms, kBT=2.0, softening=0.1)
    prop_d, q0_d, p_d, _ = _fns(t, n_atoms)
    _, q0_s, p_s, _ = _fns(t, n_atoms, mesh=mesh2d)
    x = jax.jit(lambda k: prop_d(k, 8))(jax.random.PRNGKey(1))

    for f_d, f_s in ((q0_d, q0_s), (p_d, p_s)):
        v_d, g_d = jax.jit(batched_value_and_grad(f_d))(x)
        v_s, g_s = jax.jit(batched_value_and_grad(f_s))(x)
        np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_d),
                                   rtol=1e-10)
        for k in g_d:
            np.testing.assert_allclose(np.asarray(g_s[k]),
                                       np.asarray(g_d[k]), atol=1e-8)


def test_sharded_smc_matches_dense(mesh2d):
    """Full batched SMC anneal, same seed: sharded == dense to round-off."""
    n_atoms = 4
    t = targets.lj_cluster(n_atoms, kBT=2.0, softening=0.05, e_cap=1e3)
    prop_d, q0_d, p_d, _ = _fns(t, n_atoms)
    prop_s, q0_s, p_s, _ = _fns(t, n_atoms, mesh=mesh2d)

    def run(prop, q0, p):
        @jax.jit
        def go(key):
            kp, ks = jax.random.split(key)
            x0 = prop(kp, 16)
            return smc(ks, x0, log_q0=q0, log_p=p, n_temps=4, mcmc_steps=1,
                       step_size=0.05, n_leapfrog=2, batched=True)
        return go(jax.random.PRNGKey(7))

    r_d = run(prop_d, q0_d, p_d)
    r_s = run(prop_s, q0_s, p_s)
    np.testing.assert_allclose(float(r_s.log_Z), float(r_d.log_Z),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(r_s.ess_history),
                               np.asarray(r_d.ess_history), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(r_s.log_weights),
                               np.asarray(r_d.log_weights), atol=1e-8)
    for k in r_d.particles:
        np.testing.assert_allclose(np.asarray(r_s.particles[k]),
                                   np.asarray(r_d.particles[k]), atol=1e-8)


def test_padded_atom_count_matches_dense_oracle(mesh2d):
    """n_atoms not divisible by the atom axis: padded sharded run vs a dense
    oracle forced to the same n_pad (masked atoms excluded everywhere)."""
    n_atoms = 5                       # pads to 6 on a 2-shard atom axis
    t = targets.lj_cluster(n_atoms, kBT=2.0, softening=0.1, e_cap=500.0)
    prop_s, q0_s, p_s, n_pad = _fns(t, n_atoms, mesh=mesh2d)
    assert n_pad == 6
    prop_d, q0_d, p_d, _ = _fns(t, n_atoms, n_pad=n_pad)

    key = jax.random.PRNGKey(3)
    x_d = jax.jit(lambda k: prop_d(k, 8))(key)
    x_s = jax.jit(lambda k: prop_s(k, 8))(key)
    for k in x_d:
        np.testing.assert_allclose(np.asarray(x_s[k]), np.asarray(x_d[k]),
                                   atol=1e-10)
    np.testing.assert_allclose(np.asarray(jax.jit(q0_s)(x_d)),
                               np.asarray(jax.jit(q0_d)(x_d)), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(jax.jit(p_s)(x_d)),
                               np.asarray(jax.jit(p_d)(x_d)), rtol=1e-10)

    # padded density must also equal the UNPADDED dense density on the
    # real-atom block (padding is inert, not just consistent)
    prop_u, q0_u, p_u, _ = _fns(t, n_atoms)
    x_real = {k: v[:, :n_atoms] for k, v in x_d.items()}
    np.testing.assert_allclose(np.asarray(jax.jit(p_d)(x_d)),
                               np.asarray(jax.jit(p_u)(x_real)), rtol=1e-10)


def test_driver_sample_atom_axis(tmp_path, capsys):
    """Driver e2e: sample mode with parallel.atom_axis on the CPU mesh —
    mesh (2, 4), n_atoms 6 pads to 8, output npz trimmed to 6 atoms."""
    import os
    import yaml
    from enflow_tpu.train.driver import Main

    cfg = {
        "mode": "sample",
        "seed": 0,
        "units": {"time": "pico", "dist": "ang"},
        "parallel": {"atom_axis": 4},
        "dynamics": {
            "integrator": "lf", "n_iter": 2, "dt": 0.05,
            "nbr_mode": "all_pairs",
            "network": {"hidden_nf": 8, "node_nf": 3},
            "checkpoint_path": "",
        },
        "sampling": {
            "algo": "smc",
            "target": {"type": "lj_cluster", "n_atoms": 6, "kBT": 2.0,
                       "softening": 0.1, "e_cap": 1000.0},
            "n_particles": 16, "n_temps": 3, "mcmc_steps": 1,
            "step_size": 0.05, "n_leapfrog": 2,
            "output": str(tmp_path / "samples.npz"),
            "metrics_csv": str(tmp_path / "stages.csv"),
        },
    }
    path = tmp_path / "sample.yaml"
    path.write_text(yaml.safe_dump(cfg))
    m = Main()
    m(str(path))
    assert m.mesh.shape == {"data": 2, "atom": 4}
    out = np.load(tmp_path / "samples.npz")
    assert out["pos"].shape == (16, 6, 3)
    assert out["h"].shape == (16, 6, 3)
    assert np.isfinite(out["log_Z"])
    assert np.isfinite(out["log_weights"]).all()
    assert (tmp_path / "stages.csv").exists()
    summary = capsys.readouterr().out
    assert "sampled 16 particles" in summary


def test_driver_sample_atom_axis_rejects_unsupported(tmp_path):
    import yaml
    from enflow_tpu.train.driver import Main

    cfg = {
        "mode": "sample",
        "units": {"time": "pico", "dist": "ang"},
        "parallel": {"atom_axis": 2},
        "dynamics": {
            "integrator": "lf", "n_iter": 1, "dt": 0.05,
            "nbr_mode": "all_pairs",
            "network": {"hidden_nf": 8, "node_nf": 3},
            "checkpoint_path": "",
        },
        "sampling": {
            "algo": "hmc",
            "target": {"type": "lj_cluster", "n_atoms": 4, "kBT": 2.0},
            "n_particles": 8,
        },
    }
    path = tmp_path / "s.yaml"
    path.write_text(yaml.safe_dump(cfg))
    m = Main()
    with pytest.raises(NotImplementedError, match="atom-sharded"):
        m(str(path))


def test_sharded_remc_matches_dense_batched(mesh2d):
    """Atom-sharded REMC (batched shard_map densities, per-replica betas)
    == the dense-batched run, to round-off (same seed)."""
    from enflow_tpu.sample.remc import remc

    n_atoms = 4
    t = targets.lj_cluster(n_atoms, kBT=2.0, softening=0.1, e_cap=500.0)
    prop_d, q0_d, p_d, _ = _fns(t, n_atoms)
    prop_s, q0_s, p_s, _ = _fns(t, n_atoms, mesh=mesh2d)
    K, M = 3, 8
    betas = jnp.asarray([0.0, 0.5, 1.0])

    def run(prop, q0, p):
        @jax.jit
        def go(key):
            kp, ks = jax.random.split(key)
            x0 = jax.tree_util.tree_map(
                lambda a: a.reshape((K, M) + a.shape[1:]), prop(kp, K * M))
            return remc(ks, x0, log_p=p, log_q0=q0, betas=betas,
                        n_rounds=5, mcmc_steps=1, step_size=0.1,
                        n_leapfrog=2, batched=True)
        return go(jax.random.PRNGKey(13))

    r_d = run(prop_d, q0_d, p_d)
    r_s = run(prop_s, q0_s, p_s)
    for k in r_d.samples:
        np.testing.assert_allclose(np.asarray(r_s.samples[k]),
                                   np.asarray(r_d.samples[k]), atol=1e-8,
                                   err_msg=k)
    np.testing.assert_allclose(np.asarray(r_s.swap_accept),
                               np.asarray(r_d.swap_accept), atol=1e-12)
    np.testing.assert_allclose(np.asarray(r_s.accept),
                               np.asarray(r_d.accept), atol=1e-12)


def test_driver_remc_atom_axis_with_mbar(tmp_path, capsys):
    """Driver e2e: REMC + MBAR with parallel.atom_axis on the CPU mesh —
    padded atoms trimmed, finite mbar_log_Z from the sharded densities."""
    import yaml
    from enflow_tpu.train.driver import Main

    cfg = {
        "mode": "sample",
        "seed": 1,
        "units": {"time": "pico", "dist": "ang"},
        "parallel": {"atom_axis": 4},
        "dynamics": {
            "integrator": "lf", "n_iter": 2, "dt": 0.05,
            "nbr_mode": "all_pairs",
            "network": {"hidden_nf": 8, "node_nf": 3},
            "checkpoint_path": "",
        },
        "sampling": {
            "algo": "remc",
            "target": {"type": "lj_cluster", "n_atoms": 6, "kBT": 2.0,
                       "softening": 0.1, "e_cap": 1000.0},
            "n_particles": 8, "n_temps": 3, "n_rounds": 6,
            "discard_rounds": 2, "mcmc_steps": 1,
            "step_size": 0.05, "n_leapfrog": 2,
            "mbar": True, "mbar_pool_rounds": 2, "mbar_blocks": 2,
            "output": str(tmp_path / "remc_sharded.npz"),
            "metrics_csv": str(tmp_path / "remc_sharded.csv"),
        },
    }
    path = tmp_path / "remc_sharded.yaml"
    path.write_text(yaml.safe_dump(cfg))
    m = Main()
    m(str(path))
    assert m.mesh.shape == {"data": 2, "atom": 4}
    out = np.load(tmp_path / "remc_sharded.npz")
    assert out["pos"].shape == (4, 8, 6, 3)     # kept rounds, trimmed atoms
    assert np.isfinite(float(out["mbar_log_Z"]))
    assert np.isfinite(out["pos"]).all()
    assert "remc: 6 rounds x 8 chains x 3 temps" in capsys.readouterr().out


def test_driver_chunked_atom_sharded_smc_matches_monolithic(tmp_path):
    """chunk_temps composes with parallel.atom_axis: segmented 2-D-sharded
    SMC == the monolithic 2-D-sharded run bitwise, and a checkpointed kill
    resumes through the canonical resharding path."""
    import yaml
    from enflow_tpu.train.driver import Main

    def cfg(out_name, **extra):
        return {
            "mode": "sample",
            "seed": 2,
            "units": {"time": "pico", "dist": "ang"},
            "parallel": {"atom_axis": 2},
            "dynamics": {
                "integrator": "lf", "n_iter": 2, "dt": 0.05,
                "nbr_mode": "all_pairs",
                "network": {"hidden_nf": 8, "node_nf": 3},
                "checkpoint_path": "",
            },
            "sampling": {
                "algo": "smc",
                "target": {"type": "lj_cluster", "n_atoms": 5, "kBT": 2.0,
                           "softening": 0.1, "e_cap": 1000.0},
                "n_particles": 16, "n_temps": 4, "mcmc_steps": 1,
                "step_size": 0.05, "n_leapfrog": 2,
                "output": str(tmp_path / out_name),
                **extra,
            },
        }

    def run(c, name):
        path = tmp_path / name
        path.write_text(yaml.safe_dump(c))
        Main()(str(path))

    run(cfg("mono.npz"), "mono.yaml")
    run(cfg("chunk.npz", chunk_temps=2), "chunk.yaml")
    a, b = np.load(tmp_path / "mono.npz"), np.load(tmp_path / "chunk.npz")
    for k in ("pos", "log_weights", "log_Z", "ess_history"):
        np.testing.assert_array_equal(b[k], a[k], err_msg=k)

    # kill-after-checkpoint + resume through _load_sample_state's 2-D
    # resharding; weights may differ by reduction-order ulps
    kill_cfg = cfg("resumed.npz", chunk_temps=2, checkpoint_every=2)
    state_file = str(tmp_path / "resumed.npz") + ".state.npz"
    orig = Main._save_sample_state

    class Killed(RuntimeError):
        pass

    def save_then_die(self, path, stage, state, hists):
        orig(self, path, stage, state, hists)
        raise Killed("simulated kill")

    Main._save_sample_state = save_then_die
    try:
        with pytest.raises(Killed):
            run(kill_cfg, "kill.yaml")
    finally:
        Main._save_sample_state = orig
    assert os.path.exists(state_file)
    run(kill_cfg, "kill.yaml")
    c = np.load(tmp_path / "resumed.npz")
    np.testing.assert_array_equal(c["pos"], a["pos"])
    np.testing.assert_allclose(c["log_weights"], a["log_weights"],
                               rtol=1e-12)


def test_driver_sample_atom_axis_lj_fluid(tmp_path, capsys):
    """Driver e2e on the PERIODIC fluid target (VERDICT r4 item 3): the
    sharded sample path runs min-image ring pair terms with the System box
    equal to the fluid box — the generate-scale workload's program family
    (example/sample_fluid.yaml) at tiny shapes."""
    import yaml
    from enflow_tpu.train.driver import Main

    cfg = {
        "mode": "sample",
        "seed": 0,
        "units": {"time": "pico", "dist": "ang"},
        "parallel": {"atom_axis": 4},
        "dynamics": {
            "integrator": "lf", "n_iter": 2, "dt": 0.05,
            "nbr_mode": "all_pairs",
            "network": {"hidden_nf": 8, "node_nf": 3},
            "checkpoint_path": "",
        },
        "sampling": {
            "algo": "smc",
            "target": {"type": "lj_fluid", "n_atoms": 6, "box": 2.5,
                       "kBT": 2.0, "softening": 0.1, "cutoff": 1.2,
                       "e_cap": 500.0},
            "n_particles": 16, "n_temps": 3, "mcmc_steps": 1,
            "step_size": 0.05, "n_leapfrog": 2,
            "output": str(tmp_path / "fluid_samples.npz"),
        },
    }
    path = tmp_path / "sample_fluid.yaml"
    path.write_text(yaml.safe_dump(cfg))
    m = Main()
    m(str(path))
    out = np.load(tmp_path / "fluid_samples.npz")
    assert out["pos"].shape == (16, 6, 3)
    assert np.isfinite(out["log_Z"])
    assert np.isfinite(out["log_weights"]).all()
    assert "sampled 16 particles" in capsys.readouterr().out


def test_lj_fluid_requires_box(tmp_path):
    import yaml
    from enflow_tpu.train.driver import Main

    cfg = {
        "mode": "sample",
        "units": {"time": "pico", "dist": "ang"},
        "dynamics": {
            "integrator": "lf", "n_iter": 1, "dt": 0.05,
            "nbr_mode": "all_pairs",
            "network": {"hidden_nf": 8, "node_nf": 3},
            "checkpoint_path": "",
        },
        "sampling": {
            "algo": "smc",
            "target": {"type": "lj_fluid", "n_atoms": 4, "kBT": 1.0},
            "n_particles": 8, "n_temps": 2,
        },
    }
    path = tmp_path / "s.yaml"
    path.write_text(yaml.safe_dump(cfg))
    with pytest.raises(ValueError, match="box"):
        Main()(str(path))


def test_sharded_ti_matches_dense(mesh2d):
    """Thermodynamic integration over shard_map densities (batched=True)
    == the dense-batched oracle, same seed, to reduction-order round-off."""
    from enflow_tpu.sample.ti import thermodynamic_integration

    n_atoms = 4
    t = targets.lj_cluster(n_atoms, kBT=2.0, softening=0.05, e_cap=1e3)
    prop_d, q0_d, p_d, _ = _fns(t, n_atoms)
    prop_s, q0_s, p_s, _ = _fns(t, n_atoms, mesh=mesh2d)

    def run(prop, q0, p):
        x0 = jax.jit(prop, static_argnums=1)(jax.random.PRNGKey(3), 16)
        return thermodynamic_integration(
            jax.random.PRNGKey(5), x0, log_q0=q0, log_p=p, batched=True,
            n_nodes=4, n_steps=12, n_warmup=4, step_size=0.05,
            n_leapfrog=2)

    r_d = run(prop_d, q0_d, p_d)
    r_s = run(prop_s, q0_s, p_s)
    np.testing.assert_allclose(float(r_s.log_Z), float(r_d.log_Z),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(r_s.node_mean),
                               np.asarray(r_d.node_mean), atol=1e-8)
    for k in r_d.x:
        np.testing.assert_allclose(np.asarray(r_s.x[k]),
                                   np.asarray(r_d.x[k]), atol=1e-8)


def test_driver_sample_atom_axis_ti(tmp_path, capsys):
    """Driver e2e: sampling.algo: ti with parallel.atom_axis — TI nodes run
    as (chain x atom) shard_map programs; outputs trimmed to n_atoms."""
    import yaml
    from enflow_tpu.train.driver import Main

    cfg = {
        "mode": "sample",
        "seed": 0,
        "units": {"time": "pico", "dist": "ang"},
        "parallel": {"atom_axis": 4},
        "dynamics": {
            "integrator": "lf", "n_iter": 2, "dt": 0.05,
            "nbr_mode": "all_pairs",
            "network": {"hidden_nf": 8, "node_nf": 3},
            "checkpoint_path": "",
        },
        "sampling": {
            "algo": "ti",
            "target": {"type": "lj_cluster", "n_atoms": 6, "kBT": 2.0,
                       "softening": 0.1, "e_cap": 1000.0},
            "n_particles": 16, "ti_nodes": 4, "n_samples": 12,
            "n_warmup": 4, "step_size": 0.05, "n_leapfrog": 2,
            "output": str(tmp_path / "ti.npz"),
            "metrics_csv": str(tmp_path / "ti.csv"),
        },
    }
    path = tmp_path / "ti.yaml"
    path.write_text(yaml.safe_dump(cfg))
    m = Main()
    m(str(path))
    out = np.load(tmp_path / "ti.npz")
    assert out["pos"].shape == (16, 6, 3)
    assert out["h"].shape == (16, 6, 3)
    assert np.isfinite(out["log_Z"])
    assert out["betas"].shape == (4,)
    assert np.isfinite(out["node_mean"]).all()
    assert "TI over 4 nodes x 16 chains" in capsys.readouterr().out
    with open(tmp_path / "ti.csv") as f:
        assert len(f.read().strip().splitlines()) == 5
