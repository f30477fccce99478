"""Reference-checkpoint import: torch ``model.cpt`` -> our ``.npz``.

Builds a synthetic checkpoint with the reference's exact state-dict layout
(reference ``enflow/nn/egcl.py:21-55``, ``nn/argmax.py:9-12``, saved by
``main.py:236-250``), converts it, and verifies the converted flow computes
the SAME numbers as a direct torch evaluation of the raw state dict — an
independent oracle that would catch any transpose or key-mapping error.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from enflow_tpu.data.system import System
from enflow_tpu.flow import FlowConfig, init_flow
from enflow_tpu.flow.integrators import _lf_forward
from enflow_tpu.nn.egcl import EGCLConfig
from enflow_tpu.utils.torch_import import (import_reference_checkpoint,
                                           load_reference_checkpoint)

torch.set_default_dtype(torch.float64)
DTYPE = jnp.float64

NF, HIDDEN, N_ITER = 4, 8, 3


def make_reference_state_dict(rng):
    """Random tensors under the reference's state-dict keys/shapes (torch
    Linear stores weight [out, in])."""
    def lin(out_d, in_d, prefix, bias=True):
        d = {prefix + ".weight": torch.tensor(rng.normal(size=(out_d, in_d)))}
        if bias:
            d[prefix + ".bias"] = torch.tensor(rng.normal(size=(out_d,)))
        return d

    sd = {}
    for k in range(N_ITER):
        p = f"networks.{k}."
        sd.update(lin(HIDDEN, 2 * NF + 1, p + "edge_nn.0"))
        sd.update(lin(HIDDEN, HIDDEN, p + "edge_nn.2"))
        sd.update(lin(HIDDEN, HIDDEN + NF, p + "node_nn.0"))
        sd.update(lin(NF, HIDDEN, p + "node_nn.2"))
        sd.update(lin(HIDDEN, HIDDEN, p + "coord_nn.0"))
        sd.update(lin(1, HIDDEN, p + "coord_nn.2", bias=False))
        sd.update(lin(HIDDEN, NF, p + "vel_scaling_nn.0"))
        sd.update(lin(1, HIDDEN, p + "vel_scaling_nn.2"))
    sd.update(lin(HIDDEN, NF, "dequantize.network.0"))
    sd.update(lin(2 * NF, HIDDEN, "dequantize.network.2"))
    # scale down: random-normal weights explode through exp(Q) otherwise
    return {k: v * 0.1 for k, v in sd.items()}


def make_reference_ckpt(tmp_path, rng):
    path = str(tmp_path / "model.cpt")
    torch.save({
        "epoch": 7,
        "model_state_dict": make_reference_state_dict(rng),
        "optimizer_state_dict": {},
        "node_nf": NF,
        "hidden_nf": HIDDEN,
        "softening": 0.1,
        "lj_kBT": 0.83,
        "integrator": "lf",
        "n_iter": N_ITER,
        "dt": 0.05,
    }, path)
    return path


def sd_mlp(sd, prefixes, x, final_act=False):
    """Evaluate an MLP straight from raw state-dict entries (torch layout)."""
    for i, p in enumerate(prefixes):
        x = x @ sd[p + ".weight"].T
        if p + ".bias" in sd:
            x = x + sd[p + ".bias"]
        if i < len(prefixes) - 1 or final_act:
            x = torch.nn.functional.silu(x)
    return x


def sd_egcl(sd, k, h, pos, box, r_cut):
    """Reference EGCL (egcl.py:57-93) evaluated directly from the raw state
    dict — fully independent of the converter under test."""
    p = f"networks.{k}."
    n = h.shape[0]
    rows, cols, diffs = [], [], []
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d = pos[i] - pos[j]
            d = d - torch.round(d / box) * box
            if float((d ** 2).sum()) < r_cut ** 2:
                rows.append(i)
                cols.append(j)
                diffs.append(d)
    rows_t = torch.tensor(rows)
    coord_diff = torch.stack(diffs)
    radial = (coord_diff ** 2).sum(dim=1, keepdim=True)

    m = sd_mlp(sd, [p + "edge_nn.0", p + "edge_nn.2"],
               torch.cat([h[rows], h[cols], radial], dim=1), final_act=True)
    agg = torch.zeros(n, m.shape[1])
    agg.index_add_(0, rows_t, m)
    G = sd_mlp(sd, [p + "node_nn.0", p + "node_nn.2"],
               torch.cat([h, agg], dim=1))
    gate = sd_mlp(sd, [p + "coord_nn.0", p + "coord_nn.2"], m)
    trans = torch.clamp(coord_diff * gate, -100, 100)
    F = torch.zeros(n, 3)
    F.index_add_(0, rows_t, trans)
    count = torch.zeros(n)
    count.index_add_(0, rows_t, torch.ones(len(rows)))
    F = F / count.clamp(min=1).unsqueeze(1)
    Q = sd_mlp(sd, [p + "vel_scaling_nn.0", p + "vel_scaling_nn.2"], h)
    return Q, F, G


def make_system(rng, B=2, N=5, box_len=7.0, r_cut=3.0):
    idx = rng.integers(0, NF, size=(B, N))
    return System(
        h=jnp.asarray(np.eye(NF)[idx], DTYPE),
        g=jnp.asarray(rng.normal(size=(B, N, NF)) * 0.4, DTYPE),
        pos=jnp.asarray(rng.uniform(-box_len / 2, box_len / 2, (B, N, 3)), DTYPE),
        vel=jnp.asarray(rng.normal(size=(B, N, 3)) * 0.4, DTYPE),
        mask=jnp.ones((B, N), bool),
        box=jnp.full((B, 3), box_len, DTYPE),
        r_cut=jnp.full((B,), r_cut, DTYPE),
    )


def test_imported_flow_matches_raw_state_dict(tmp_path):
    rng = np.random.default_rng(0)
    path = make_reference_ckpt(tmp_path, rng)
    params, hparams = load_reference_checkpoint(path)
    assert hparams["n_iter"] == N_ITER and hparams["epoch"] == 7

    cfg = FlowConfig(n_iter=N_ITER, dt=hparams["dt"],
                     egcl=EGCLConfig(node_nf=NF, hidden_nf=HIDDEN))
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, DTYPE), params)
    s = make_system(rng)
    out, ldj, _ = _lf_forward(params, cfg, s)

    ckpt = torch.load(path, weights_only=False)
    sd = ckpt["model_state_dict"]
    for b in range(s.num_mols):
        h = torch.tensor(np.asarray(s.h[b]))
        g = torch.tensor(np.asarray(s.g[b]))
        pos = torch.tensor(np.asarray(s.pos[b]))
        vel = torch.tensor(np.asarray(s.vel[b]))
        box = torch.tensor(np.asarray(s.box[b]))
        ldj_t = 0.0
        for k in range(N_ITER):
            Q, F, G = sd_egcl(sd, k, h, pos, box, float(s.r_cut[b]))
            vel = torch.exp(Q) * vel + F * cfg.dt
            g = g + G * cfg.dt
            pos = pos + vel * cfg.dt
            pos = pos - torch.round(pos / box) * box
            h = h + g * cfg.dt
            ldj_t += float(Q.sum())
        np.testing.assert_allclose(np.asarray(out.pos[b]), pos.numpy(),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(out.h[b]), h.numpy(), atol=1e-10)
        assert float(ldj[b]) == pytest.approx(ldj_t, abs=1e-10)


def test_imported_dequantizer_matches_raw_state_dict(tmp_path):
    from enflow_tpu.nn import argmax as am

    rng = np.random.default_rng(1)
    path = make_reference_ckpt(tmp_path, rng)
    params, _ = load_reference_checkpoint(path)
    dequant = jax.tree_util.tree_map(lambda x: jnp.asarray(x, DTYPE),
                                     params["dequant"])

    h = jnp.asarray(np.eye(NF)[rng.integers(0, NF, size=(2, 5))], DTYPE)
    key = jax.random.PRNGKey(2)
    z, log_q = am.forward(dequant, h, jnp.ones((2, 5), bool), key)

    sd = torch.load(path, weights_only=False)["model_state_dict"]
    eps = torch.tensor(np.asarray(jax.random.normal(key, h.shape, DTYPE)))
    ht = torch.tensor(np.asarray(h))
    net_out = sd_mlp(sd, ["dequantize.network.0", "dequantize.network.2"], ht)
    log_scale, translate = torch.chunk(net_out, 2, dim=-1)
    u = translate + eps * log_scale.exp()
    T = (ht * u).sum(-1, keepdim=True)
    z_t = ht * u + (1 - ht) * (T - torch.nn.functional.softplus(T - u))
    np.testing.assert_allclose(np.asarray(z), z_t.numpy(), atol=1e-12)
    for b in range(2):
        lq = (-0.5 * ((u[b] ** 2).sum() + math.log(2 * math.pi))
              - log_scale[b].sum()
              - ((1 - ht[b])
                 * torch.nn.functional.logsigmoid(T[b] - u[b])).sum())
        assert float(log_q[b]) == pytest.approx(float(lq), abs=1e-10)


def test_vv_checkpoint_with_wrong_network_count_errors(tmp_path):
    """The network count is derived from the state dict, not the integrator:
    a 'vv' checkpoint carrying only n_iter networks (what the reference's
    main.py:151 would actually save — its VV path IndexErrors at train time)
    must raise a clear mismatch error instead of KeyErroring mid-convert."""
    rng = np.random.default_rng(5)
    path = str(tmp_path / "vv.cpt")
    torch.save({
        "epoch": 0,
        "model_state_dict": make_reference_state_dict(rng),  # N_ITER networks
        "node_nf": NF, "hidden_nf": HIDDEN, "softening": 0.1,
        "lj_kBT": 0.83, "integrator": "vv", "n_iter": N_ITER, "dt": 0.05,
    }, path)
    with pytest.raises(ValueError, match="needs 4"):
        load_reference_checkpoint(path)


def test_non_flow_checkpoint_errors(tmp_path):
    rng = np.random.default_rng(6)
    path = str(tmp_path / "junk.cpt")
    torch.save({
        "epoch": 0, "model_state_dict": {"foo.weight": torch.zeros(2, 2)},
        "node_nf": NF, "hidden_nf": HIDDEN, "softening": 0.1,
        "lj_kBT": 0.83, "integrator": "lf", "n_iter": N_ITER, "dt": 0.05,
    }, path)
    with pytest.raises(ValueError, match="no networks"):
        load_reference_checkpoint(path)


def test_import_roundtrips_through_driver_checkpoint(tmp_path):
    """The written .npz restores positionally against an init_flow template
    (exactly what the driver does) and carries no opt_state tree."""
    from enflow_tpu.train.checkpoint import (has_tree, load_checkpoint,
                                             load_hparams)

    rng = np.random.default_rng(3)
    path = make_reference_ckpt(tmp_path, rng)
    out_path = str(tmp_path / "model.npz")
    params, hparams = import_reference_checkpoint(path, out_path, "float64")

    hp = load_hparams(out_path)
    assert hp == hparams
    assert not has_tree(out_path, "opt_state")

    cfg = FlowConfig(n_iter=hp["n_iter"], dt=hp["dt"],
                     egcl=EGCLConfig(node_nf=hp["node_nf"],
                                     hidden_nf=hp["hidden_nf"]))
    template = init_flow(jax.random.PRNGKey(0), cfg, DTYPE)
    tree, _ = load_checkpoint(out_path, {"params": template})
    for a, b in zip(jax.tree_util.tree_leaves(tree["params"]),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_driver_trains_from_imported_checkpoint(tmp_path):
    """End-to-end: reference .cpt -> import -> driver train resumes from it
    (fresh optimizer path) and writes a full checkpoint back."""
    import yaml

    from enflow_tpu.train.checkpoint import has_tree
    from enflow_tpu.train.driver import Main

    rng = np.random.default_rng(4)
    ref = make_reference_ckpt(tmp_path, rng)
    npz = str(tmp_path / "imported.npz")
    import_reference_checkpoint(ref, npz, "float64")

    xyz = str(tmp_path / "mols.xyz")
    with open(xyz, "w") as f:
        for _ in range(4):
            f.write("5\nc\n")
            for a in range(5):
                sym = ["C", "O", "H", "N"][a % 4]
                x, y, z = rng.uniform(-3, 3, 3)
                f.write(f"{sym} {x:.6f} {y:.6f} {z:.6f}\n")

    config = {
        "mode": "train",
        "units": {"time": "pico", "dist": "ang"},
        "precision": "float64",
        "dataset": {
            "type": "xyz",
            "raw_file": xyz,
            "atom_types": ["H", "C", "N", "O"],   # node_nf == NF == 4
            "box": [12.0, 12.0, 12.0], "r_cut": 9.0,
            "randomize_vel": True, "temp": 300,
        },
        "dynamics": {
            "integrator": "lf", "n_iter": N_ITER, "dt": 1.0,
            "checkpoint_path": npz,
            "network": {"hidden_nf": HIDDEN},
        },
        "training": {
            "num_epochs": 1, "batch_size": 4, "lr": 1e-4,
            "scheduler": False,
            "loss": {"temp": 100, "softening": 0.1},
            "log_interval": 1,
        },
    }
    cfg_path = tmp_path / "train.yaml"
    cfg_path.write_text(yaml.safe_dump(config))

    main = Main()
    main(str(cfg_path))
    assert main.start_epoch == 8          # imported epoch 7 + 1
    assert has_tree(npz, "opt_state")     # re-saved with optimizer state


# ---------------------------------------------------------------------------
# export (utils/torch_export.py): our .npz -> reference .cpt
# ---------------------------------------------------------------------------

def test_export_roundtrips_reference_state_dict(tmp_path):
    """import -> export reproduces the original reference checkpoint:
    identical key set, bit-equal tensors (double transpose), metadata
    preserved."""
    from enflow_tpu.utils.torch_export import export_reference_checkpoint

    rng = np.random.default_rng(11)
    cpt_in = make_reference_ckpt(tmp_path, rng)
    npz = str(tmp_path / "model.npz")
    import_reference_checkpoint(cpt_in, npz)
    cpt_out = str(tmp_path / "back.cpt")
    export_reference_checkpoint(npz, cpt_out, lr=2e-3)

    a = torch.load(cpt_in, weights_only=False)
    b = torch.load(cpt_out, weights_only=False)
    assert set(a["model_state_dict"]) == set(b["model_state_dict"])
    for k in a["model_state_dict"]:
        np.testing.assert_array_equal(a["model_state_dict"][k].numpy(),
                                      b["model_state_dict"][k].numpy())
    for k in ("epoch", "node_nf", "hidden_nf", "softening", "lj_kBT",
              "integrator", "n_iter", "dt"):
        assert a[k] == b[k], k


def test_exported_checkpoint_restores_into_reference_torch_run(tmp_path):
    """The exported dict supports the reference's resume path
    (main.py:100-116,193-195): model_state_dict loads into torch Linear
    stacks of the right shapes, and optimizer_state_dict loads into a
    fresh torch Adam and steps."""
    from enflow_tpu.utils.torch_export import export_reference_checkpoint

    rng = np.random.default_rng(12)
    npz = str(tmp_path / "model.npz")
    import_reference_checkpoint(make_reference_ckpt(tmp_path, rng), npz)
    cpt = str(tmp_path / "export.cpt")
    export_reference_checkpoint(npz, cpt, lr=5e-4)
    ckpt = torch.load(cpt, weights_only=False)

    params = [torch.nn.Parameter(t.clone())
              for t in ckpt["model_state_dict"].values()]
    opt = torch.optim.Adam(params, lr=1e-3)
    opt.load_state_dict(ckpt["optimizer_state_dict"])
    assert opt.param_groups[0]["lr"] == 5e-4     # exported lr wins
    loss = sum((p ** 2).sum() for p in params)
    loss.backward()
    opt.step()                                   # fresh moments, no error


def test_export_rejects_floor_dequantizer(tmp_path):
    from enflow_tpu.flow import FlowConfig, init_flow as _init
    from enflow_tpu.nn.egcl import EGCLConfig as _E
    from enflow_tpu.train.checkpoint import save_checkpoint
    from enflow_tpu.utils.torch_export import export_reference_checkpoint

    cfg = FlowConfig(n_iter=2, dt=0.05, egcl=_E(node_nf=3, hidden_nf=8),
                     dequantizer="floor")
    params = _init(jax.random.PRNGKey(0), cfg, np.float64)
    npz = str(tmp_path / "floor.npz")
    save_checkpoint(npz, {"params": params},
                    {"epoch": 0, "node_nf": 3, "hidden_nf": 8,
                     "dequantizer": "floor", "n_iter": 2, "dt": 0.05})
    with pytest.raises(ValueError, match="ArgMax"):
        export_reference_checkpoint(npz, str(tmp_path / "x.cpt"))
