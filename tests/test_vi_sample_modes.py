"""Driver tests for the data-free modes: flow-VI training and flow-SMC
sampling (north-star capabilities; no reference equivalents)."""

import os

import numpy as np
import pytest
import yaml

from enflow_tpu.train.driver import Main


def vi_config(tmp_path, n_epochs=4):
    return {
        "mode": "train",
        "units": {"time": "pico", "dist": "ang"},
        "precision": "float64",
        "seed": 2,
        "dynamics": {
            "integrator": "lf",
            "n_iter": 2,
            "dt": 1,
            "checkpoint_path": str(tmp_path / "vi.cpt"),
            "network": {"hidden_nf": 16, "node_nf": 3},
        },
        "training": {
            "objective": "flow_vi",
            "num_epochs": n_epochs,
            "steps_per_epoch": 25,
            "n_particles": 64,
            "lr": 2e-3,
            "scheduler": False,
            "log_interval": 1,
            "metrics_csv": str(tmp_path / "metrics.csv"),
            "target": {"type": "gaussian", "n_atoms": 5, "std": 0.5,
                       "kBT": 1.0},
        },
    }


def run_main(tmp_path, cfg, name):
    path = str(tmp_path / name)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    m = Main()
    m(path)
    return m


def test_flow_vi_loss_forces_exact_ldj():
    """flow_vi_loss must use the true log-det regardless of the NLL-parity
    exact_ldj flag on the config (the KL identity needs the mathematical
    Jacobian; sample/vi.py)."""
    import jax
    import jax.numpy as jnp

    from enflow_tpu.data.system import System
    from enflow_tpu.flow import FlowConfig, init_flow
    from enflow_tpu.nn.egcl import EGCLConfig
    from enflow_tpu.sample.vi import flow_vi_loss, make_system_target,\
        sample_base

    def cfgs(exact):
        return FlowConfig(n_iter=2, dt=0.05,
                          egcl=EGCLConfig(node_nf=3, hidden_nf=8),
                          nbr_mode="all_pairs", exact_ldj=exact)

    params = init_flow(jax.random.PRNGKey(0), cfgs(False), jnp.float64)
    batch = sample_base(jax.random.PRNGKey(1), 4, 5, 3, box=1e3, r_cut=1e2,
                        dtype=jnp.float64)
    tgt = make_system_target(lambda pos: -0.5 * (pos ** 2).sum())
    la, _ = flow_vi_loss(params, cfgs(False), batch, tgt)
    lb, _ = flow_vi_loss(params, cfgs(True), batch, tgt)
    assert float(la) == float(lb)


def _stl_fixture():
    import jax
    import jax.numpy as jnp

    from enflow_tpu.flow import FlowConfig, init_flow
    from enflow_tpu.nn.egcl import EGCLConfig
    from enflow_tpu.sample.vi import sample_base

    cfg = FlowConfig(n_iter=2, dt=0.05,
                     egcl=EGCLConfig(node_nf=3, hidden_nf=8),
                     nbr_mode="all_pairs")
    params = init_flow(jax.random.PRNGKey(5), cfg, jnp.float64)
    batch = sample_base(jax.random.PRNGKey(6), 6, 4, 3, box=1e3, r_cut=1e2,
                        dtype=jnp.float64)
    return cfg, params, batch


def test_stl_loss_value_matches_default_plus_base_term():
    """STL and the default estimator compute the same objective: values
    differ by exactly E[log p0(z)] (the param-independent constant the
    default form drops). Pins the re-encode/base-density plumbing —
    forward(reverse(z)) == z and log q = log p0 + ldj_fwd."""
    import jax
    import numpy as np
    import pytest

    from enflow_tpu.sample.vi import (flow_vi_loss, make_base_log_prob,
                                      make_system_target)

    cfg, params, batch = _stl_fixture()
    tgt = make_system_target(lambda pos: -0.5 * (pos ** 2).sum())
    base_lp = make_base_log_prob()
    l_std, _ = flow_vi_loss(params, cfg, batch, tgt)
    l_stl, _ = flow_vi_loss(params, cfg, batch, tgt, stl=True,
                            base_log_prob=base_lp)
    lp0_mean = float(base_lp(batch).mean())
    assert float(l_stl) == pytest.approx(float(l_std) + lp0_mean, rel=1e-10)


def test_stl_gradient_vanishes_at_optimum():
    """The STL property: when the target IS the flow's own (stopped)
    pushforward density, the per-sample STL gradient is identically zero,
    while the default estimator's score term leaves it nonzero (zero only
    in expectation). This is the variance reduction, made exact."""
    import dataclasses

    import jax
    import numpy as np

    from enflow_tpu.flow import forward_core
    from enflow_tpu.sample.vi import flow_vi_loss, make_base_log_prob

    cfg, params, batch = _stl_fixture()
    base_lp = make_base_log_prob()
    cfg_e = dataclasses.replace(cfg, exact_ldj=True)
    sg = jax.tree_util.tree_map(jax.lax.stop_gradient, params)

    def target(sys_b):   # q_{sg(phi)} as a fixed target density
        z_re, ldj_f = forward_core(sg, cfg_e, sys_b)
        return base_lp(z_re) + ldj_f

    def norm(tree):
        return float(sum(float((g ** 2).sum())
                         for g in jax.tree_util.tree_leaves(tree)) ** 0.5)

    g_stl = jax.grad(lambda p: flow_vi_loss(
        p, cfg, batch, target, stl=True, base_log_prob=base_lp)[0])(params)
    g_std = jax.grad(lambda p: flow_vi_loss(
        p, cfg, batch, target)[0])(params)
    assert norm(g_stl) < 1e-10 * max(norm(g_std), 1.0), (
        norm(g_stl), norm(g_std))
    assert norm(g_std) > 1e-3   # the score term really is there


def test_flow_vi_trains_and_checkpoints(tmp_path, capsys):
    cfg = vi_config(tmp_path)
    run_main(tmp_path, cfg, "vi.yaml")
    out = capsys.readouterr().out
    rows = [l for l in out.split("\n") if l.strip() and l[0].isdigit()]
    losses = [float(r.split()[1]) for r in rows]
    assert len(losses) == 4
    assert all(np.isfinite(losses))
    # VI against a Gaussian target from a Gaussian base: loss must drop
    assert losses[-1] < losses[0]
    assert os.path.exists(cfg["dynamics"]["checkpoint_path"])
    # metrics CSV written with one row per epoch
    with open(cfg["training"]["metrics_csv"]) as f:
        lines = f.read().strip().split("\n")
    assert lines[0].startswith("time,epoch,loss")
    assert len(lines) == 5


@pytest.mark.parametrize("poison", [np.nan, np.inf, -np.inf])
def test_flow_vi_optimizer_survives_nonfinite_grads(tmp_path, poison):
    """A poisoned batch gradient (NaN from an inf-energy log1p-cap VJP, or
    inf from a f32 overflow) must not destroy the parameters. inf matters
    separately: unsanitized, clip_by_global_norm turns an inf gradient into
    NaN updates that poison the Adam moments forever."""
    import jax
    import jax.numpy as jnp
    import optax

    cfg = vi_config(tmp_path, n_epochs=1)
    path = str(tmp_path / "nan.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    m = Main()
    m.setup(path)
    grads = jax.tree_util.tree_map(lambda p: jnp.full_like(p, poison),
                                   m.params)
    updates, _ = m.optimizer.update(grads, m.opt_state, m.params)
    new = optax.apply_updates(m.params, updates)
    for a, b in zip(jax.tree_util.tree_leaves(new),
                    jax.tree_util.tree_leaves(m.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flow_vi_resume_with_incompatible_opt_state(tmp_path, capsys):
    """A checkpoint whose optimizer-state tree doesn't match the current
    chain (e.g. saved by an older version) resumes with restored params
    and a fresh optimizer instead of refusing to run."""
    import jax
    import optax

    from enflow_tpu.train.checkpoint import load_hparams, save_checkpoint

    cfg = vi_config(tmp_path, n_epochs=1)
    m = run_main(tmp_path, cfg, "vi.yaml")
    capsys.readouterr()
    # rewrite the checkpoint with an optimizer state from a DIFFERENT chain
    hp = load_hparams(cfg["dynamics"]["checkpoint_path"])
    wrong_opt = optax.sgd(1e-3).init(m.params)
    save_checkpoint(cfg["dynamics"]["checkpoint_path"],
                    {"params": m.params, "opt_state": wrong_opt}, hp)
    m2 = Main()
    path = str(tmp_path / "vi2.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    m2.setup(path)
    err = capsys.readouterr().err
    assert "fresh optimizer" in err
    for a, b in zip(jax.tree_util.tree_leaves(m2.params),
                    jax.tree_util.tree_leaves(m.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flow_vi_fused_epoch_matches_step_loop(tmp_path, capsys):
    """training.fused_epoch (one lax.scan program per epoch, default) draws
    the same fold_in key sequence as the per-step dispatch loop — final
    parameters must agree to float tolerance."""
    import jax
    import jax.numpy as jnp

    cfg = vi_config(tmp_path, n_epochs=2)
    cfg["training"]["fused_epoch"] = True
    m_fused = run_main(tmp_path, cfg, "vi_fused.yaml")
    os.remove(cfg["dynamics"]["checkpoint_path"])
    cfg["training"]["fused_epoch"] = False
    cfg["training"]["metrics_csv"] = str(tmp_path / "metrics2.csv")
    m_loop = run_main(tmp_path, cfg, "vi_loop.yaml")
    capsys.readouterr()
    for a, b in zip(jax.tree_util.tree_leaves(m_fused.params),
                    jax.tree_util.tree_leaves(m_loop.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8,
                                   atol=1e-10)


def test_flow_vi_stl_trains(tmp_path, capsys):
    """Driver e2e with training.stl: true — loss finite and decreasing."""
    cfg = vi_config(tmp_path)
    cfg["training"]["stl"] = True
    run_main(tmp_path, cfg, "vi_stl.yaml")
    out = capsys.readouterr().out
    rows = [l for l in out.split("\n") if l.strip() and l[0].isdigit()]
    losses = [float(r.split()[1]) for r in rows]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_sample_mode_smc(tmp_path, capsys):
    # train a couple of VI epochs to get a checkpoint, then sample from it
    cfg = vi_config(tmp_path, n_epochs=1)
    run_main(tmp_path, cfg, "vi.yaml")
    capsys.readouterr()

    sample_cfg = {
        "mode": "sample",
        "units": {"time": "pico", "dist": "ang"},
        "precision": "float64",
        "seed": 5,
        "dynamics": {"checkpoint_path": cfg["dynamics"]["checkpoint_path"]},
        "sampling": {
            "algo": "smc",
            "adaptive": True,
            "target_ess_frac": 0.5,
            "n_particles": 32,
            "n_temps": 4,
            "mcmc_steps": 1,
            "step_size": 0.1,
            "n_leapfrog": 3,
            "output": str(tmp_path / "samples.npz"),
            "metrics_csv": str(tmp_path / "sample_metrics.csv"),
            "target": {"type": "gaussian", "n_atoms": 5, "std": 0.5,
                       "kBT": 1.0},
        },
    }
    run_main(tmp_path, sample_cfg, "sample.yaml")
    out = capsys.readouterr().out
    assert "log_Z=" in out
    data = np.load(tmp_path / "samples.npz")
    assert data["pos"].shape == (32, 5, 3)
    assert np.isfinite(data["pos"]).all()
    assert np.isfinite(float(data["log_Z"]))
    assert data["ess_history"].shape == (4,)
    # per-stage anneal diagnostics land in the CSV (VERDICT r2 item 8):
    # one row per temperature stage with beta monotone to 1 and finite ESS
    rows = (tmp_path / "sample_metrics.csv").read_text().strip().splitlines()
    header = rows[0].split(",")
    assert len(rows) == 1 + 4
    i_beta, i_ess = header.index("beta"), header.index("ess")
    betas = [float(r.split(",")[i_beta]) for r in rows[1:]]
    esses = [float(r.split(",")[i_ess]) for r in rows[1:]]
    assert betas == sorted(betas) and abs(betas[-1] - 1.0) < 1e-6
    assert all(np.isfinite(esses))


def test_sample_mode_remc(tmp_path, capsys):
    """algo: remc — flow-bridged parallel tempering through the driver."""
    cfg = vi_config(tmp_path, n_epochs=1)
    run_main(tmp_path, cfg, "vi.yaml")
    capsys.readouterr()

    sample_cfg = {
        "mode": "sample",
        "units": {"time": "pico", "dist": "ang"},
        "precision": "float64",
        "seed": 6,
        "dynamics": {"checkpoint_path": cfg["dynamics"]["checkpoint_path"]},
        "sampling": {
            "algo": "remc",
            "n_particles": 16,          # chains per temperature
            "n_temps": 3,
            "beta_min": 0.2,
            "n_rounds": 20,
            "mcmc_steps": 1,
            "step_size": [0.3, 0.2, 0.1],
            "n_leapfrog": 3,
            "mbar": True,
            "output": str(tmp_path / "remc.npz"),
            "metrics_csv": str(tmp_path / "remc_metrics.csv"),
            "target": {"type": "gaussian", "n_atoms": 5, "std": 0.5,
                       "kBT": 1.0},
        },
    }
    run_main(tmp_path, sample_cfg, "remc.yaml")
    out = capsys.readouterr().out
    assert "swap_accept=" in out
    # per-slot ladder diagnostics in the CSV: beta/hmc_accept/swap_accept
    rows = (tmp_path / "remc_metrics.csv").read_text().strip().splitlines()
    assert len(rows) == 1 + 3                       # header + one per slot
    hdr = rows[0].split(",")
    i_b, i_a = hdr.index("beta"), hdr.index("hmc_accept")
    assert [float(r.split(",")[i_b]) for r in rows[1:]] == \
        sorted(float(r.split(",")[i_b]) for r in rows[1:])
    assert all(0.0 <= float(r.split(",")[i_a]) <= 1.0 for r in rows[1:])
    assert "mbar_log_Z=" in out
    data = np.load(tmp_path / "remc.npz")
    assert data["pos"].shape == (10, 16, 5, 3)     # kept rounds x M x N x 3
    assert np.isfinite(data["pos"]).all()
    assert data["swap_accept"].shape == (2,)
    assert data["betas"].shape == (3,)
    assert np.all(data["swap_accept"] >= 0.0)
    assert data["mbar_f"].shape == (3,)
    assert np.isfinite(float(data["mbar_log_Z"]))
    assert float(data["mbar_converged"]) < 1e-4
    # chain-column block replicate error bar (VERDICT r1 item 9)
    assert data["mbar_log_Z_blocks"].shape == (4,)
    se = float(data["mbar_log_Z_se"])
    assert 0.0 < se < 2.0
    assert abs(data["mbar_log_Z_blocks"].mean()
               - float(data["mbar_log_Z"])) < 6 * se + 0.2
    assert "+-" in out


def test_remc_minimal_ladder_reaches_beta1(tmp_path, capsys):
    """n_temps=2 must give the ladder [0, 1] — geomspace(a, 1, 1) returns
    [a], which would silently label near-flow samples as target draws."""
    cfg = vi_config(tmp_path, n_epochs=1)
    run_main(tmp_path, cfg, "vi.yaml")
    capsys.readouterr()
    sample_cfg = {
        "mode": "sample",
        "units": {"time": "pico", "dist": "ang"},
        "precision": "float64",
        "seed": 8,
        "dynamics": {"checkpoint_path": cfg["dynamics"]["checkpoint_path"]},
        "sampling": {
            "algo": "remc", "n_particles": 8, "n_temps": 2,
            "n_rounds": 4, "mcmc_steps": 1, "step_size": 0.1,
            "n_leapfrog": 2,
            "output": str(tmp_path / "remc2.npz"),
            "target": {"type": "gaussian", "n_atoms": 5, "std": 0.5,
                       "kBT": 1.0},
        },
    }
    run_main(tmp_path, sample_cfg, "remc2.yaml")
    capsys.readouterr()
    data = np.load(tmp_path / "remc2.npz")
    np.testing.assert_array_equal(np.asarray(data["betas"]), [0.0, 1.0])


def test_sample_mode_incomplete_adaptive_anneal_raises(tmp_path, capsys):
    """An adaptive anneal that exhausts n_temps before beta=1 must fail
    loudly: its particles target an intermediate distribution and log_Z is
    a partial-bridge normalizer (observed on-chip: 4 nats off with a
    deceptively high final ESS)."""
    import pytest

    cfg = vi_config(tmp_path, n_epochs=1)
    run_main(tmp_path, cfg, "vi.yaml")
    capsys.readouterr()
    sample_cfg = {
        "mode": "sample",
        "units": {"time": "pico", "dist": "ang"},
        "precision": "float64",
        "seed": 7,
        "dynamics": {"checkpoint_path": cfg["dynamics"]["checkpoint_path"]},
        "sampling": {
            "algo": "smc", "n_particles": 64,
            "n_temps": 2,               # impossible budget
            "adaptive": True, "target_ess_frac": 0.95,
            "mcmc_steps": 1, "step_size": 0.1, "n_leapfrog": 2,
            "output": str(tmp_path / "bad.npz"),
            # narrow target far from the 1-epoch flow: big KL, tiny steps
            "target": {"type": "gaussian", "n_atoms": 5, "std": 0.05,
                       "kBT": 1.0},
        },
    }
    with pytest.raises(RuntimeError, match="anneal incomplete"):
        run_main(tmp_path, sample_cfg, "bad.yaml")


def test_sample_mode_untrained_flow(tmp_path, capsys):
    """Sampling works without a checkpoint when dynamics fully specifies the
    model (benchmark / smoke path)."""
    cfg = {
        "mode": "sample",
        "units": {"time": "pico", "dist": "ang"},
        "precision": "float64",
        "dynamics": {
            "integrator": "lf", "n_iter": 2, "dt": 1,
            "network": {"hidden_nf": 8, "node_nf": 2},
        },
        "sampling": {
            "algo": "ais",
            "n_particles": 16,
            "n_temps": 3,
            "output": str(tmp_path / "s2.npz"),
            "target": {"type": "gaussian", "n_atoms": 4, "std": 1.0,
                       "kBT": 1.0},
        },
    }
    run_main(tmp_path, cfg, "s2.yaml")
    assert os.path.exists(tmp_path / "s2.npz")


def test_flow_vi_forcefield_target(tmp_path, capsys):
    """VI against an inline force-field target through the driver."""
    cfg = vi_config(tmp_path, n_epochs=1)
    cfg["dynamics"]["checkpoint_path"] = str(tmp_path / "ff.cpt")
    cfg["training"]["steps_per_epoch"] = 5
    cfg["training"]["n_particles"] = 16
    cfg["training"]["target"] = {
        "type": "forcefield",
        "kBT": 0.5,
        "params": {
            "atoms": [[1.0, 0.2, 0.0]] * 3,
            "bonds": [[0, 1, 50.0, 1.5], [1, 2, 50.0, 1.5]],
            "angles": [[0, 1, 2, 20.0, 1.911]],
        },
    }
    run_main(tmp_path, cfg, "ff_vi.yaml")
    out = capsys.readouterr().out
    rows = [l for l in out.split("\n") if l.strip() and l[0].isdigit()]
    assert len(rows) == 1
    assert np.isfinite(float(rows[0].split()[1]))
    assert os.path.exists(tmp_path / "ff.cpt")


def test_flow_vi_annealed_softening(tmp_path, capsys):
    """Annealed softening / energy-cap schedule on an LJ cluster target:
    traced schedule scalars (one compile), finite decreasing losses."""
    cfg = vi_config(tmp_path, n_epochs=4)
    cfg["training"]["target"] = {
        "type": "lj_cluster", "n_atoms": 6, "kBT": 2.0,
        "softening": 0.0, "e_cap": 50.0,
        "anneal": {"softening_start": 0.5, "e_cap_start": 5.0, "epochs": 3},
    }
    cfg["training"]["steps_per_epoch"] = 10
    run_main(tmp_path, cfg, "vi_anneal.yaml")
    out = capsys.readouterr().out
    rows = [l for l in out.split("\n") if l.strip() and l[0].isdigit()]
    losses = [float(r.split()[1]) for r in rows]
    assert len(losses) == 4
    assert all(np.isfinite(losses))


def test_flow_vi_anneal_to_uncapped(tmp_path, capsys):
    """e_cap annealing to None (uncapped): gradients stay NaN-free through
    the near-infinite cap (regularize_energy untaken-branch guard)."""
    cfg = vi_config(tmp_path, n_epochs=3)
    cfg["training"]["target"] = {
        "type": "lj_cluster", "n_atoms": 4, "kBT": 2.0,
        "anneal": {"softening_start": 0.3, "e_cap_start": 20.0, "epochs": 2},
    }
    cfg["training"]["steps_per_epoch"] = 8
    run_main(tmp_path, cfg, "vi_anneal2.yaml")
    out = capsys.readouterr().out
    rows = [l for l in out.split("\n") if l.strip() and l[0].isdigit()]
    losses = [float(r.split()[1]) for r in rows]
    assert len(losses) == 3
    assert all(np.isfinite(losses))


def _mcmc_sample_config(tmp_path, cfg, algo, **kw):
    sample_cfg = {
        "mode": "sample",
        "units": {"time": "pico", "dist": "ang"},
        "precision": "float64",
        "seed": 5,
        "dynamics": {"checkpoint_path": cfg["dynamics"]["checkpoint_path"]},
        "sampling": {
            "algo": algo,
            "n_particles": 16,
            "n_samples": 40,
            "n_warmup": 40,
            "step_size": 0.1,
            "output": str(tmp_path / f"{algo}.npz"),
            "target": {"type": "gaussian", "n_atoms": 5, "std": 0.5,
                       "kBT": 1.0},
            **kw,
        },
    }
    return sample_cfg


@pytest.mark.parametrize("algo,extra", [
    ("hmc", {"n_leapfrog": 3, "adapt_step": True, "target_accept": 0.8}),
    ("mala", {"thin": 2}),
    ("nuts", {"max_depth": 5}),
])
def test_sample_mode_mcmc(tmp_path, capsys, algo, extra):
    """sampling.algo: hmc | nuts | mala through the driver (VERDICT item 4:
    the library samplers must be YAML-reachable). Gaussian target with
    std 0.5 — unweighted draws must recover the moment."""
    cfg = vi_config(tmp_path, n_epochs=1)
    run_main(tmp_path, cfg, "vi.yaml")
    capsys.readouterr()

    run_main(tmp_path, _mcmc_sample_config(tmp_path, cfg, algo, **extra),
             f"{algo}.yaml")
    out = capsys.readouterr().out
    assert f"{algo})" in out
    data = np.load(tmp_path / f"{algo}.npz")
    assert data["pos"].shape == (40 * 16, 5, 3)
    for k in ("pos", "vel", "h", "g"):
        assert np.isfinite(data[k]).all()
    # target moment: pos ~ N(0, 0.5^2); vel/h/g unit normal aux
    assert abs(data["pos"].std() - 0.5) < 0.08
    assert abs(data["vel"].std() - 1.0) < 0.12
    if algo in ("hmc", "mala"):
        assert 0.05 < float(data["accept_rate"]) <= 1.0
    else:
        assert float(data["divergence_rate"]) < 0.2


def test_sample_mode_unknown_algo_raises(tmp_path, capsys):
    cfg = vi_config(tmp_path, n_epochs=1)
    run_main(tmp_path, cfg, "vi.yaml")
    bad = _mcmc_sample_config(tmp_path, cfg, "metropolis")
    with pytest.raises(ValueError, match="sampling.algo"):
        run_main(tmp_path, bad, "bad.yaml")


# ---------------------------------------------------------------------------
# chunked / fault-tolerant sample mode (VERDICT r3 item 4)
# ---------------------------------------------------------------------------

def _chunk_sample_cfg(tmp_path, cfg, out_name, **sampling_extra):
    sample_cfg = {
        "mode": "sample",
        "units": {"time": "pico", "dist": "ang"},
        "precision": "float64",
        "seed": 5,
        "dynamics": {"checkpoint_path": cfg["dynamics"]["checkpoint_path"],
                     "nbr_mode": "all_pairs"},
        "sampling": {
            "algo": "smc",
            "n_particles": 16,
            "n_temps": 6,
            "mcmc_steps": 1,
            "step_size": 0.1,
            "n_leapfrog": 2,
            "output": str(tmp_path / out_name),
            "target": {"type": "gaussian", "n_atoms": 4, "std": 0.5,
                       "kBT": 1.0},
            **sampling_extra,
        },
    }
    return sample_cfg


def test_driver_chunked_smc_matches_monolithic(tmp_path, capsys):
    """sampling.chunk_temps: bounded per-program segments == one monolithic
    jitted anneal, bitwise (same seed/YAML)."""
    cfg = vi_config(tmp_path, n_epochs=1)
    run_main(tmp_path, cfg, "vi.yaml")

    run_main(tmp_path, _chunk_sample_cfg(tmp_path, cfg, "mono.npz"),
             "mono.yaml")
    run_main(tmp_path, _chunk_sample_cfg(tmp_path, cfg, "chunk.npz",
                                         chunk_temps=2), "chunk.yaml")
    capsys.readouterr()
    a = np.load(tmp_path / "mono.npz")
    b = np.load(tmp_path / "chunk.npz")
    for k in ("pos", "vel", "h", "g", "log_weights", "log_Z",
              "ess_history"):
        np.testing.assert_array_equal(b[k], a[k], err_msg=k)


def test_driver_chunked_smc_resume_from_stage_checkpoint(tmp_path, capsys):
    """A run killed mid-anneal (simulated right after a stage checkpoint)
    resumes from <output>.state.npz and finishes bitwise-identical to the
    uninterrupted run; the state file is removed on completion."""
    from enflow_tpu.train.driver import Main as M

    cfg = vi_config(tmp_path, n_epochs=1)
    run_main(tmp_path, cfg, "vi.yaml")
    run_main(tmp_path, _chunk_sample_cfg(tmp_path, cfg, "ref.npz",
                                         chunk_temps=2), "ref.yaml")

    kill_cfg = _chunk_sample_cfg(tmp_path, cfg, "resumed.npz",
                                 chunk_temps=2, checkpoint_every=2)
    state_file = str(tmp_path / "resumed.npz") + ".state.npz"

    orig = M._save_sample_state

    class Killed(RuntimeError):
        pass

    def save_then_die(self, path, stage, state, hists):
        orig(self, path, stage, state, hists)
        raise Killed(f"simulated kill after checkpoint at stage {stage}")

    M._save_sample_state = save_then_die
    try:
        with pytest.raises(Killed):
            run_main(tmp_path, kill_cfg, "kill.yaml")
    finally:
        M._save_sample_state = orig
    assert os.path.exists(state_file)

    run_main(tmp_path, kill_cfg, "kill.yaml")   # resumes
    err = capsys.readouterr().err
    assert "resuming sampling at stage 2" in err
    assert not os.path.exists(state_file)       # completed -> removed
    a = np.load(tmp_path / "ref.npz")
    b = np.load(tmp_path / "resumed.npz")
    # particles are elementwise -> exact; weight reductions may differ by
    # ulps when resume re-placement changes the GSPMD reduction order
    for k in ("pos", "vel", "h", "g"):
        np.testing.assert_array_equal(b[k], a[k], err_msg=k)
    for k in ("log_weights", "log_Z", "ess_history"):
        np.testing.assert_allclose(b[k], a[k], rtol=1e-12, err_msg=k)


def test_driver_chunked_smc_retries_on_unavailable(tmp_path, capsys):
    """One transient UNAVAILABLE device error mid-segment is retried
    automatically; the retry is logged in the metrics CSV final row and the
    result equals the fault-free run (deterministic re-dispatch)."""
    import jax as jax_mod

    cfg = vi_config(tmp_path, n_epochs=1)
    run_main(tmp_path, cfg, "vi.yaml")
    run_main(tmp_path, _chunk_sample_cfg(tmp_path, cfg, "ok.npz",
                                         chunk_temps=3), "ok.yaml")

    orig_bur = jax_mod.block_until_ready
    state = {"armed": True, "dispatches": 0}

    def flaky(x):
        state["dispatches"] += 1
        # fail exactly once, on the sync of the second device dispatch
        # (the first anneal segment; dispatch 1 is the proposal)
        if state["armed"] and state["dispatches"] == 2:
            state["armed"] = False
            raise RuntimeError("UNAVAILABLE: TPU device error (simulated)")
        return orig_bur(x)

    jax_mod.block_until_ready = flaky
    try:
        run_main(tmp_path, _chunk_sample_cfg(
            tmp_path, cfg, "retried.npz", chunk_temps=3,
            metrics_csv=str(tmp_path / "retry.csv")), "retry.yaml")
    finally:
        jax_mod.block_until_ready = orig_bur
    out = capsys.readouterr()
    assert "retrying in 5 s" in out.err
    assert "retries=1" in out.out

    rows = (tmp_path / "retry.csv").read_text().strip().splitlines()
    header = rows[0].split(",")
    assert rows[-1].split(",")[header.index("retries")] == "1"
    a = np.load(tmp_path / "ok.npz")
    b = np.load(tmp_path / "retried.npz")
    for k in ("pos", "log_weights", "log_Z"):
        np.testing.assert_array_equal(b[k], a[k], err_msg=k)


def test_driver_chunked_remc_matches_monolithic(tmp_path, capsys):
    """sampling.chunk_rounds: segmented REMC == monolithic, bitwise."""
    cfg = vi_config(tmp_path, n_epochs=1)
    run_main(tmp_path, cfg, "vi.yaml")

    def remc_cfg(out_name, **extra):
        return {
            "mode": "sample",
            "units": {"time": "pico", "dist": "ang"},
            "precision": "float64",
            "seed": 5,
            "dynamics": {"checkpoint_path":
                         cfg["dynamics"]["checkpoint_path"],
                         "nbr_mode": "all_pairs"},
            "sampling": {
                "algo": "remc",
                "n_particles": 8,
                "n_temps": 3,
                "n_rounds": 6,
                "discard_rounds": 2,
                "mcmc_steps": 1,
                "step_size": 0.1,
                "n_leapfrog": 2,
                "output": str(tmp_path / out_name),
                "target": {"type": "gaussian", "n_atoms": 4, "std": 0.5,
                           "kBT": 1.0},
                **extra,
            },
        }

    run_main(tmp_path, remc_cfg("remc_mono.npz"), "rm.yaml")
    run_main(tmp_path, remc_cfg("remc_chunk.npz", chunk_rounds=2),
             "rc.yaml")
    capsys.readouterr()
    a = np.load(tmp_path / "remc_mono.npz")
    b = np.load(tmp_path / "remc_chunk.npz")
    for k in ("pos", "vel", "h", "g", "swap_accept", "accept", "betas"):
        np.testing.assert_array_equal(b[k], a[k], err_msg=k)


def test_compiler_options_parsed_and_ignored_on_cpu(tmp_path, capsys):
    """dynamics.compiler_options: parsed, applied only on TPU-class
    backends (TPU flags are rejected client-side on cpu), and harmless in
    a full CPU sample run."""
    cfg = vi_config(tmp_path, n_epochs=1)
    run_main(tmp_path, cfg, "vi.yaml")
    sample_cfg = _chunk_sample_cfg(tmp_path, cfg, "co.npz", chunk_temps=2)
    sample_cfg["dynamics"]["compiler_options"] = {
        "xla_tpu_scoped_vmem_limit_kib": "49152"}
    m = run_main(tmp_path, sample_cfg, "co.yaml")
    capsys.readouterr()
    assert m.compiler_options is None           # cpu backend -> ignored
    assert np.isfinite(float(np.load(tmp_path / "co.npz")["log_Z"]))


def test_flow_vi_coupled_position_update_e2e(tmp_path, capsys):
    """dynamics.position_update: coupled — VI trains the L2HMC-style drift
    (pos_networks checkpoint roundtrip included) and sample mode runs SMC
    through the coupled flow."""
    cfg = vi_config(tmp_path, n_epochs=2)
    cfg["dynamics"]["position_update"] = "coupled"
    cfg["dynamics"]["nbr_mode"] = "all_pairs"
    cfg["dynamics"]["pos_scale_max"] = 2.5
    m = run_main(tmp_path, cfg, "vi_coupled.yaml")
    capsys.readouterr()
    # both coupled knobs are YAML-reachable (VERDICT r4 item 6)
    assert m.flow_cfg.position_update == "coupled"
    assert m.flow_cfg.pos_scale_max == 2.5

    sample_cfg = {
        "mode": "sample",
        "units": {"time": "pico", "dist": "ang"},
        "precision": "float64",
        "seed": 5,
        "dynamics": {"checkpoint_path": cfg["dynamics"]["checkpoint_path"],
                     "position_update": "coupled",
                     "nbr_mode": "all_pairs"},
        "sampling": {
            "algo": "smc",
            "n_particles": 16,
            "n_temps": 3,
            "mcmc_steps": 1,
            "step_size": 0.1,
            "n_leapfrog": 2,
            "output": str(tmp_path / "coupled_samples.npz"),
            "target": {"type": "gaussian", "n_atoms": 5, "std": 0.5,
                       "kBT": 1.0},
        },
    }
    run_main(tmp_path, sample_cfg, "sample_coupled.yaml")
    out = capsys.readouterr().out
    assert "log_Z=" in out
    data = np.load(tmp_path / "coupled_samples.npz")
    assert np.isfinite(data["pos"]).all()
    assert np.isfinite(float(data["log_Z"]))


def test_flow_vi_tempered_anneal(tmp_path, capsys):
    """training.target.anneal.beta_start: the tempered-VI schedule reaches
    the loss (a beta_start=0.1 run differs from the untempered one on the
    first epoch and both stay finite)."""
    import copy

    def lj_cfg(beta_start):
        cfg = vi_config(tmp_path, n_epochs=2)
        cfg["seed"] = 11
        cfg["training"]["steps_per_epoch"] = 5
        cfg["training"]["n_particles"] = 16
        cfg["training"]["target"] = {
            "type": "lj_cluster", "n_atoms": 5, "kBT": 2.0, "c_osc": 0.5,
            "softening": 0.0, "e_cap": 100.0,
            "anneal": {"softening_start": 0.2, "e_cap_start": 50.0,
                       "epochs": 2, "beta_start": beta_start},
        }
        return copy.deepcopy(cfg)

    cfg_t = lj_cfg(0.1)
    cfg_t["dynamics"]["checkpoint_path"] = str(tmp_path / "t.cpt")
    cfg_t["training"]["metrics_csv"] = str(tmp_path / "t.csv")
    run_main(tmp_path, cfg_t, "vi_tempered.yaml")
    cfg_u = lj_cfg(1.0)
    cfg_u["dynamics"]["checkpoint_path"] = str(tmp_path / "u.cpt")
    cfg_u["training"]["metrics_csv"] = str(tmp_path / "u.csv")
    run_main(tmp_path, cfg_u, "vi_untempered.yaml")
    capsys.readouterr()

    def losses(p):
        rows = (tmp_path / p).read_text().strip().splitlines()
        i = rows[0].split(",").index("loss")
        return [float(r.split(",")[i]) for r in rows[1:]]

    lt, lu = losses("t.csv"), losses("u.csv")
    assert np.isfinite(lt).all() and np.isfinite(lu).all()
    # beta reaches the objective: epoch-0 losses differ (same seed/noise)
    assert abs(lt[0] - lu[0]) > 1e-6


def test_beta_start_validation(tmp_path, capsys):
    """anneal.beta_start outside (0, 1] is rejected at config parse time:
    beta=0 is an improper flat target for reverse-KL VI, beta<0 inverts
    the target (ADVICE r4)."""
    for bad in (0.0, -0.5, 1.5):
        cfg = vi_config(tmp_path, n_epochs=1)
        cfg["training"]["target"] = {
            "type": "lj_cluster", "n_atoms": 5, "kBT": 2.0, "c_osc": 0.5,
            "softening": 0.0, "e_cap": 100.0,
            "anneal": {"softening_start": 0.2, "epochs": 2,
                       "beta_start": bad},
        }
        with pytest.raises(ValueError, match="beta_start"):
            run_main(tmp_path, cfg, f"vi_bad_beta_{bad}.yaml")
    capsys.readouterr()


def test_sample_mode_per_stage_nbr_overflow(tmp_path, capsys):
    """VERDICT r4 item 7: with a truncating neighbor format, EVERY anneal
    stage carries its own nbr_overflow count in sampling.metrics_csv (the
    in-program tracked counter), not just a final-particles probe —
    engineered here by giving the flow a 2-slot topk capacity on a 6-atom
    target so mid-anneal configurations truncate at every stage."""
    cfg = vi_config(tmp_path, n_epochs=1)
    run_main(tmp_path, cfg, "vi_for_ovf.yaml")

    sample_cfg = {
        "mode": "sample",
        "units": {"time": "pico", "dist": "ang"},
        "precision": "float64",
        "seed": 5,
        "dynamics": {"checkpoint_path": cfg["dynamics"]["checkpoint_path"],
                     "nbr_mode": "dense", "nbr_capacity": 2,
                     "validate_capacity": False},
        "sampling": {
            "algo": "smc",
            "n_particles": 16,
            "n_temps": 3,
            "mcmc_steps": 1,
            "step_size": 0.1,
            "n_leapfrog": 2,
            "output": str(tmp_path / "ovf_samples.npz"),
            "metrics_csv": str(tmp_path / "ovf_stages.csv"),
            "target": {"type": "gaussian", "n_atoms": 6, "std": 0.5,
                       "kBT": 1.0},
        },
    }
    run_main(tmp_path, sample_cfg, "sample_ovf.yaml")
    err = capsys.readouterr().err
    assert "neighbor slots truncated" in err

    rows = (tmp_path / "ovf_stages.csv").read_text().strip().splitlines()
    head = rows[0].split(",")
    i_ovf = head.index("nbr_overflow")
    counts = [int(r.split(",")[i_ovf]) for r in rows[1:]]
    assert len(counts) == 3
    # truncation is visible at EVERY stage, including non-final ones (the
    # r4 probe reported only the final configurations)
    assert all(c > 0 for c in counts)

    # exact formats: no column noise — all_pairs run leaves it empty
    sample_cfg["dynamics"] = {
        "checkpoint_path": cfg["dynamics"]["checkpoint_path"],
        "nbr_mode": "all_pairs"}
    sample_cfg["sampling"]["metrics_csv"] = str(tmp_path / "ovf_ap.csv")
    sample_cfg["sampling"]["output"] = str(tmp_path / "ovf_ap.npz")
    run_main(tmp_path, sample_cfg, "sample_ovf_ap.yaml")
    capsys.readouterr()
    rows = (tmp_path / "ovf_ap.csv").read_text().strip().splitlines()
    i_ovf = rows[0].split(",").index("nbr_overflow")
    assert all(r.split(",")[i_ovf] == "" for r in rows[1:])


def test_remc_per_round_nbr_overflow(tmp_path, capsys):
    """REMC analogue: the per-round tracked counter totals into the CSV
    final row and the warning fires (truncating topk capacity)."""
    cfg = vi_config(tmp_path, n_epochs=1)
    run_main(tmp_path, cfg, "vi_for_ovf_r.yaml")
    sample_cfg = {
        "mode": "sample",
        "units": {"time": "pico", "dist": "ang"},
        "precision": "float64",
        "seed": 5,
        "dynamics": {"checkpoint_path": cfg["dynamics"]["checkpoint_path"],
                     "nbr_mode": "dense", "nbr_capacity": 2,
                     "validate_capacity": False},
        "sampling": {
            "algo": "remc",
            "n_particles": 8,
            "n_temps": 3,
            "n_rounds": 4,
            "discard_rounds": 1,
            "mcmc_steps": 1,
            "step_size": 0.1,
            "n_leapfrog": 2,
            "output": str(tmp_path / "ovf_remc.npz"),
            "metrics_csv": str(tmp_path / "ovf_remc.csv"),
            "target": {"type": "gaussian", "n_atoms": 6, "std": 0.5,
                       "kBT": 1.0},
        },
    }
    run_main(tmp_path, sample_cfg, "sample_ovf_remc.yaml")
    err = capsys.readouterr().err
    assert "neighbor slots truncated" in err
    rows = (tmp_path / "ovf_remc.csv").read_text().strip().splitlines()
    i_ovf = rows[0].split(",").index("nbr_overflow")
    assert int(rows[-1].split(",")[i_ovf]) > 0


def test_flow_vi_drift_position_update_fluid_e2e(tmp_path, capsys):
    """position_update: drift — the PBC-compatible learned translation
    trains against the periodic lj_fluid target and sample mode runs SMC
    through the drift flow (checkpoint roundtrip included)."""
    cfg = vi_config(tmp_path, n_epochs=2)
    cfg["dynamics"]["position_update"] = "drift"
    cfg["dynamics"]["nbr_mode"] = "dense"
    cfg["training"]["target"] = {
        "type": "lj_fluid", "n_atoms": 6, "box": 2.5, "kBT": 2.0,
        "softening": 0.1, "cutoff": 1.2, "e_cap": 500.0,
    }
    run_main(tmp_path, cfg, "vi_drift.yaml")
    capsys.readouterr()

    sample_cfg = {
        "mode": "sample",
        "units": {"time": "pico", "dist": "ang"},
        "precision": "float64",
        "seed": 5,
        "dynamics": {"checkpoint_path": cfg["dynamics"]["checkpoint_path"],
                     "position_update": "drift", "nbr_mode": "dense"},
        "sampling": {
            "algo": "smc",
            "n_particles": 16,
            "n_temps": 3,
            "mcmc_steps": 1,
            "step_size": 0.1,
            "n_leapfrog": 2,
            "output": str(tmp_path / "drift_samples.npz"),
            "target": {"type": "lj_fluid", "n_atoms": 6, "box": 2.5,
                       "kBT": 2.0, "softening": 0.1, "cutoff": 1.2,
                       "e_cap": 500.0},
        },
    }
    run_main(tmp_path, sample_cfg, "sample_drift.yaml")
    out = capsys.readouterr().out
    assert "log_Z=" in out
    data = np.load(tmp_path / "drift_samples.npz")
    assert np.isfinite(data["pos"]).all()
    assert np.isfinite(float(data["log_Z"]))
