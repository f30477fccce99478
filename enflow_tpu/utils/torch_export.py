"""Export enflow_tpu checkpoints to the reference (torch) format.

The inverse of :mod:`.torch_import`: converts this framework's
self-describing ``.npz`` checkpoint (``train/checkpoint.py``) into the
single ``torch.save`` dict the reference driver writes and loads
(reference ``enflow/main.py:100-116,236-250``) — so a model trained or
fine-tuned here can be loaded by the reference code base for comparison,
or handed to collaborators still running it.

Key mapping and transposes are exactly :mod:`.torch_import` reversed
(torch ``nn.Linear`` stores ``weight [out, in]``; our layers store
``w [in, out]``). The exported dict carries a FRESH torch-Adam
``optimizer_state_dict`` (empty ``state``, one param group enumerating the
model tensors): the reference loads it unconditionally on resume
(main.py:193-194), and a fresh state dict simply restarts the moments —
optax moments don't map onto torch Adam's.

CLI::

    python -m enflow_tpu.utils.torch_export model.npz model.cpt [--lr 1e-3]
"""

from __future__ import annotations

import numpy as np

from .torch_import import _require_torch

# torch.optim.Adam per-group hyperparameters a fresh state dict must carry
# for Optimizer.load_state_dict + Adam.step to work after restore
_ADAM_GROUP_DEFAULTS = {
    "lr": 1e-3, "betas": (0.9, 0.999), "eps": 1e-8, "weight_decay": 0,
    "amsgrad": False, "maximize": False, "foreach": None,
    "capturable": False, "differentiable": False, "fused": None,
}


def _t(x):
    """Our Linear weight [in, out] -> a torch tensor [out, in]."""
    torch = _require_torch()
    return torch.tensor(np.asarray(x).T.copy())


def _v(x):
    torch = _require_torch()
    return torch.tensor(np.asarray(x).copy())


def _emit_linear(sd, prefix, layer):
    sd[prefix + ".weight"] = _t(layer["w"])
    if "b" in layer:
        sd[prefix + ".bias"] = _v(layer["b"])


def params_to_state_dict(params):
    """Our flow param pytree -> the reference ``model_state_dict``.

    Unstacks the per-step network leaves (leading axis k) into
    ``networks.{k}.*`` entries; exact inverse of
    :func:`.torch_import.convert_state_dict`.
    """
    import jax

    if "pos_networks" in params:
        raise ValueError(
            "position_update='coupled'/'drift' flows have no reference-format "
            "representation (the reference flow has no drift networks, "
            "dynamics.py:12-21); export the shift-flow part is not "
            "meaningful — keep coupled checkpoints in the native npz format")
    nets = params["networks"]
    num_networks = jax.tree_util.tree_leaves(nets)[0].shape[0]
    sd = {}
    for k in range(num_networks):
        net = jax.tree_util.tree_map(lambda x: x[k], nets)
        p = f"networks.{k}."
        for name in ("edge_nn", "node_nn", "coord_nn", "vel_scaling_nn"):
            for i, layer in zip((0, 2), net[name]):
                _emit_linear(sd, f"{p}{name}.{i}", layer)
        if "att_nn" in net:
            _emit_linear(sd, p + "att_nn.0", net["att_nn"])
    for i, layer in zip((0, 2), params["dequant"]["network"]):
        _emit_linear(sd, f"dequantize.network.{i}", layer)
    return sd


def _fresh_adam_state_dict(n_params: int, lr: float):
    group = dict(_ADAM_GROUP_DEFAULTS, lr=lr,
                 params=list(range(n_params)))
    return {"state": {}, "param_groups": [group]}


def export_reference_checkpoint(in_path, out_path, lr: float = 1e-3):
    """Convert ``in_path`` (our .npz) to ``out_path`` (reference .cpt).

    The architecture hyperparameters come from the npz's embedded hparams
    (the same self-describing set the reference embeds, main.py:236-250).
    Floor-dequantizer checkpoints cannot be expressed in the reference
    format (its ArgMax is hardcoded, main.py:153) and raise.
    """
    torch = _require_torch()
    from ..flow import FlowConfig, init_flow
    from ..nn.egcl import EGCLConfig
    from ..train.checkpoint import load_checkpoint, load_hparams

    hparams = load_hparams(in_path)
    if hparams.get("dequantizer", "argmax") != "argmax":
        raise ValueError(
            "the reference checkpoint format only supports the ArgMax "
            f"dequantizer (main.py:153); this checkpoint uses "
            f"{hparams.get('dequantizer')!r}")
    cfg = FlowConfig(
        n_iter=int(hparams["n_iter"]), dt=float(hparams["dt"]),
        egcl=EGCLConfig(node_nf=int(hparams["node_nf"]),
                        hidden_nf=int(hparams["hidden_nf"])),
        integrator=str(hparams.get("integrator", "lf")))
    import jax

    template = init_flow(jax.random.PRNGKey(0), cfg, np.float64)
    trees, _ = load_checkpoint(in_path, {"params": template})
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float64), trees["params"])
    sd = params_to_state_dict(params)
    torch.save({
        "epoch": int(hparams.get("epoch", 0)),
        "model_state_dict": sd,
        "optimizer_state_dict": _fresh_adam_state_dict(len(sd), lr),
        "node_nf": int(hparams["node_nf"]),
        "hidden_nf": int(hparams["hidden_nf"]),
        "softening": float(hparams.get("softening", 0.0)),
        "lj_kBT": float(hparams.get("lj_kBT", 1.0)),
        "integrator": str(hparams.get("integrator", "lf")),
        "n_iter": int(hparams["n_iter"]),
        "dt": float(hparams["dt"]),
    }, out_path)
    return sd, hparams


def main(argv=None):
    import sys

    argv = sys.argv[1:] if argv is None else argv
    lr = 1e-3
    if "--lr" in argv:
        i = argv.index("--lr")
        lr = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if len(argv) != 2:
        print(__doc__)
        raise SystemExit(2)
    sd, hparams = export_reference_checkpoint(argv[0], argv[1], lr=lr)
    print(f"exported {argv[0]} -> {argv[1]}  "
          f"(integrator={hparams.get('integrator', 'lf')}, "
          f"n_iter={hparams['n_iter']}, hidden_nf={hparams['hidden_nf']}, "
          f"node_nf={hparams['node_nf']}, {len(sd)} tensors)")


if __name__ == "__main__":
    main()
