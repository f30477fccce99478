"""Runtime neighbor-truncation counter (VERDICT r3 item 5).

The one-time startup capacity validation samples INITIAL configurations —
positions move during flow integration, so a truncating neighbor format
(top-k capacity / cell / images) can silently drop edges mid-flow. The
counter (``neighbors_with_diffs(with_overflow=True)`` threaded through
``FlowConfig.track_overflow``) makes that visible in the train/sample
metrics CSVs.
"""

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from enflow_tpu.data.neighbors import neighbors_with_diffs
from enflow_tpu.data.system import System
from enflow_tpu.flow.integrators import FlowConfig, init_flow, forward_core
from enflow_tpu.nn.egcl import EGCLConfig

DTYPE = jnp.float64


def _cluster(B=2, N=6, spread=0.5, seed=0):
    """Tightly clustered atoms: every atom within cutoff of every other."""
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.uniform(-spread, spread, (B, N, 3)), DTYPE)
    box = jnp.full((B, 3), 50.0, DTYPE)
    mask = jnp.ones((B, N), bool)
    r_cut = jnp.full((B,), 5.0, DTYPE)
    return pos, box, mask, r_cut


def test_topk_overflow_count_exact():
    pos, box, mask, r_cut = _cluster(B=2, N=6)
    # every atom has 5 in-cutoff neighbors; capacity 3 drops 2 per atom
    nbrs, cd, ovf = neighbors_with_diffs(pos, box, mask, r_cut, capacity=3,
                                         mode="topk", with_overflow=True)
    assert int(ovf) == 2 * 6 * 2
    # ample capacity: zero
    *_, ovf0 = neighbors_with_diffs(pos, box, mask, r_cut, capacity=5,
                                    mode="topk", with_overflow=True)
    assert int(ovf0) == 0


def test_dense_and_all_pairs_report_zero():
    pos, box, mask, r_cut = _cluster()
    for mode, cap in (("dense", None), ("all_pairs", None)):
        *_, ovf = neighbors_with_diffs(pos, box, mask, r_cut, capacity=cap,
                                       mode=mode, with_overflow=True)
        assert int(ovf) == 0


def test_images_overflow_count():
    pos, box, mask, r_cut = _cluster(B=1, N=5)
    # slot capacity below the 4 in-cutoff neighbors per atom
    *_, ovf = neighbors_with_diffs(pos, box, mask, r_cut, capacity=2,
                                   mode="images", with_overflow=True)
    assert int(ovf) == (4 - 2) * 5
    *_, ovf0 = neighbors_with_diffs(pos, box, mask, r_cut, capacity=8,
                                    mode="images", with_overflow=True)
    assert int(ovf0) == 0


def test_cell_overflow_counts_dropped_atoms_and_excess():
    # all atoms in one corner -> one cell holds everything; cell_capacity 2
    # drops atoms from the table AND the per-atom candidates overflow
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.uniform(0.1, 0.4, (1, 6, 3)), DTYPE)
    box = jnp.full((1, 3), 4.0, DTYPE)
    mask = jnp.ones((1, 6), bool)
    r_cut = jnp.full((1,), 2.0, DTYPE)
    *_, ovf = neighbors_with_diffs(pos, box, mask, r_cut, capacity=5,
                                   mode="cell", cells_per_dim=2,
                                   cell_capacity=2, with_overflow=True)
    assert int(ovf) >= 4            # at least the 4 atoms dropped from cells
    *_, ovf0 = neighbors_with_diffs(pos, box, mask, r_cut, capacity=5,
                                    mode="cell", cells_per_dim=2,
                                    cell_capacity=8, with_overflow=True)
    assert int(ovf0) == 0


@pytest.mark.parametrize("integrator", ["lf", "vv"])
def test_flow_forward_tracks_overflow_and_values_unchanged(integrator):
    pos, box, mask, r_cut = _cluster(B=2, N=6, seed=4)
    rng = np.random.default_rng(5)
    sys0 = System(h=jnp.asarray(rng.normal(size=(2, 6, 3)), DTYPE),
                  g=jnp.asarray(rng.normal(size=(2, 6, 3)), DTYPE),
                  pos=pos, vel=jnp.asarray(
                      rng.normal(size=(2, 6, 3)) * 0.1, DTYPE),
                  mask=mask, box=box, r_cut=r_cut)

    def cfg(track, cap=2):
        return FlowConfig(n_iter=2, dt=0.02, integrator=integrator,
                          egcl=EGCLConfig(node_nf=3, hidden_nf=8),
                          nbr_capacity=cap, nbr_mode="dense",
                          track_overflow=track)

    params = init_flow(jax.random.PRNGKey(0), cfg(False), DTYPE)
    out_plain, ldj_plain = forward_core(params, cfg(False), sys0)
    out_t, ldj_t, ovf = forward_core(params, cfg(True), sys0)
    # tracking must not perturb the flow itself
    np.testing.assert_array_equal(np.asarray(out_t.pos),
                                  np.asarray(out_plain.pos))
    np.testing.assert_array_equal(np.asarray(ldj_t), np.asarray(ldj_plain))
    # capacity 2 vs 5 real neighbors -> every step truncates
    assert int(ovf) > 0
    # ample capacity: zero even when tracked
    *_, ovf0 = forward_core(params, cfg(True, cap=6), sys0)
    assert int(ovf0) == 0


def test_driver_train_csv_reports_overflow(tmp_path, capsys):
    """An engineered mid-flow overflow (tiny top-k capacity, validation
    off) is reported per epoch in the metrics CSV and as a warning."""
    from test_driver import write_xyz_dataset, base_config, run_main

    xyz = str(tmp_path / "mols.xyz")
    write_xyz_dataset(xyz)
    cfg = base_config(tmp_path, xyz)
    cfg["training"]["num_epochs"] = 2
    cfg["training"]["metrics_csv"] = str(tmp_path / "metrics.csv")
    cfg["dynamics"]["nbr_capacity"] = 1           # 4-atom mols, r_cut 9
    cfg["dynamics"]["validate_capacity"] = False  # engineer silent mode

    run_main(tmp_path, cfg)
    err = capsys.readouterr().err
    assert "truncated" in err and "neighbor slots" in err
    rows = (tmp_path / "metrics.csv").read_text().strip().splitlines()
    header = rows[0].split(",")
    i = header.index("nbr_overflow")
    vals = [int(r.split(",")[i]) for r in rows[1:]]
    assert len(vals) == 2 and all(v > 0 for v in vals)


def test_driver_validation_recommends_headroom(tmp_path, capsys):
    """The capacity error recommends a concrete value with the headroom
    factor; a passing-but-tight capacity warns about the recommendation."""
    from test_driver import write_xyz_dataset, base_config, run_main

    xyz = str(tmp_path / "mols.xyz")
    write_xyz_dataset(xyz)
    cfg = base_config(tmp_path, xyz)
    cfg["dynamics"]["nbr_capacity"] = 1
    with pytest.raises(ValueError, match=r"Recommended dynamics"
                                         r".nbr_capacity >= 4 .3 observed"):
        run_main(tmp_path, cfg)

    capsys.readouterr()
    cfg2 = base_config(tmp_path, xyz)
    cfg2["training"]["num_epochs"] = 1
    cfg2["dynamics"]["nbr_capacity"] = 3          # == observed max, < 1.25x
    run_main(tmp_path, cfg2, "tight.yaml")
    err = capsys.readouterr().err
    assert "below the mid-flow headroom recommendation" in err
    assert "recommended 4" in err


def test_driver_sample_probe_reports_overflow(tmp_path, capsys):
    """Sample mode with a truncating capacity: the final-particle probe
    lands a positive nbr_overflow on the CSV's last row."""
    from enflow_tpu.train.driver import Main

    cfg = {
        "mode": "sample",
        "units": {"time": "pico", "dist": "ang"},
        "precision": "float64",
        "seed": 3,
        "dynamics": {
            "integrator": "lf", "n_iter": 1, "dt": 0.05,
            "nbr_mode": "dense", "nbr_capacity": 1,
            "network": {"hidden_nf": 8, "node_nf": 3},
            "checkpoint_path": "",
        },
        "sampling": {
            "algo": "smc",
            "n_particles": 8, "n_temps": 2, "mcmc_steps": 0,
            "output": str(tmp_path / "s.npz"),
            "metrics_csv": str(tmp_path / "s.csv"),
            "target": {"type": "gaussian", "n_atoms": 4, "std": 0.5,
                       "kBT": 1.0},
        },
    }
    path = tmp_path / "s.yaml"
    path.write_text(yaml.safe_dump(cfg))
    Main()(str(path))
    err = capsys.readouterr().err
    assert "truncated" in err
    rows = (tmp_path / "s.csv").read_text().strip().splitlines()
    header = rows[0].split(",")
    last = rows[-1].split(",")
    assert int(last[header.index("nbr_overflow")]) > 0
