"""Import reference (torch) checkpoints into enflow_tpu's format.

The reference saves one ``torch.save`` dict per epoch holding the DDP-unwrapped
``model_state_dict`` plus the architecture hyperparameters (reference
``enflow/main.py:236-250``: epoch, node_nf, hidden_nf, softening, lj_kBT,
integrator, n_iter, dt, and optimizer/scheduler state dicts). This module
converts that file into this framework's self-describing ``.npz`` checkpoint
(``train/checkpoint.py``), so a user migrating from the reference can continue
training, generate, or sample from an existing trained model without
retraining.

State-dict layout mapped (all from the reference's module structure):

- ``networks.{k}.edge_nn.{0,2}.{weight,bias}``      (egcl.py:21-25)
- ``networks.{k}.node_nn.{0,2}.{weight,bias}``      (egcl.py:27-30)
- ``networks.{k}.coord_nn.0.{weight,bias}``,
  ``networks.{k}.coord_nn.2.weight`` (no bias)      (egcl.py:32-43)
- ``networks.{k}.vel_scaling_nn.{0,2}.{weight,bias}`` (egcl.py:52-55)
- ``networks.{k}.att_nn.0.{weight,bias}``           (egcl.py:46-49, optional)
- ``dequantize.network.{0,2}.{weight,bias}``        (argmax.py:9-12)

torch ``nn.Linear`` stores ``weight [out, in]``; our layers compute ``x @ w``
with ``w [in, out]``, so every weight is transposed. Optimizer state is NOT
imported (torch Adam moments don't map onto optax pytrees usefully across
frameworks); the driver initializes a fresh optimizer when a checkpoint
carries no ``opt_state`` tree.

CLI::

    python -m enflow_tpu.utils.torch_import model.cpt model.npz [float32|float64]
"""

from __future__ import annotations

import numpy as np


def _require_torch():
    try:
        import torch
    except ImportError as e:  # pragma: no cover - torch is baked into the env
        raise ImportError(
            "importing a reference checkpoint requires torch (only for "
            "reading the file; the converted checkpoint is torch-free)"
        ) from e
    return torch


def _w(sd, key):
    """Fetch a torch Linear weight and transpose to our [in, out] layout."""
    return np.asarray(sd[key].detach().cpu().numpy()).T


def _b(sd, key):
    return np.asarray(sd[key].detach().cpu().numpy())


def _linear(sd, prefix, bias=True):
    layer = {"w": _w(sd, prefix + ".weight")}
    if bias:
        layer["b"] = _b(sd, prefix + ".bias")
    return layer


def convert_state_dict(sd, num_networks: int):
    """Reference ``model_state_dict`` -> our flow param pytree (NumPy leaves).

    Returns the same structure as :func:`enflow_tpu.flow.init_flow`: stacked
    per-step EGCL parameters plus the ArgMax dequantizer.
    """
    nets = []
    for k in range(num_networks):
        p = f"networks.{k}."
        net = {
            "edge_nn": [_linear(sd, p + "edge_nn.0"),
                        _linear(sd, p + "edge_nn.2")],
            "node_nn": [_linear(sd, p + "node_nn.0"),
                        _linear(sd, p + "node_nn.2")],
            "coord_nn": [_linear(sd, p + "coord_nn.0"),
                         _linear(sd, p + "coord_nn.2", bias=False)],
            "vel_scaling_nn": [_linear(sd, p + "vel_scaling_nn.0"),
                               _linear(sd, p + "vel_scaling_nn.2")],
        }
        if p + "att_nn.0.weight" in sd:
            net["att_nn"] = _linear(sd, p + "att_nn.0")
        nets.append(net)
    import jax

    networks = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *nets)
    dequant = {"network": [_linear(sd, "dequantize.network.0"),
                           _linear(sd, "dequantize.network.2")]}
    return {"networks": networks, "dequant": dequant}


def load_reference_checkpoint(path):
    """Read a reference ``model.cpt``. Returns ``(params, hparams)`` where
    ``params`` is our flow pytree (NumPy float64 leaves — the reference model
    is float64, flow/base.py:12) and ``hparams`` matches the keys our driver
    embeds in its own checkpoints."""
    torch = _require_torch()
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model_state_dict"]
    n_iter = int(ckpt["n_iter"])
    integrator = str(ckpt["integrator"]).lower()
    # Derive the network count from the state dict itself rather than
    # inferring it from the integrator: the reference always constructs
    # n_iter EGCLs (main.py:151) even for VV (whose forward would then
    # IndexError at train time), so integrator-based inference is
    # untestable against real files. Count the distinct networks.{k}
    # prefixes actually present and validate against what OUR integrator
    # will need at restore time (n_iter for lf, n_iter+1 for vv).
    net_ids = {int(k.split(".")[1]) for k in sd
               if k.startswith("networks.")}
    if not net_ids:
        raise ValueError(f"{path}: no networks.<k>.* entries in "
                         "model_state_dict — not a reference flow checkpoint")
    num_networks = max(net_ids) + 1
    if net_ids != set(range(num_networks)):
        raise ValueError(f"{path}: non-contiguous network indices "
                         f"{sorted(net_ids)} in model_state_dict")
    expected = n_iter + 1 if integrator == "vv" else n_iter
    if num_networks != expected:
        raise ValueError(
            f"{path}: checkpoint holds {num_networks} EGCL networks but "
            f"integrator={integrator!r} with n_iter={n_iter} needs "
            f"{expected}; cannot restore this model faithfully")
    params = convert_state_dict(sd, num_networks)
    hparams = {
        "epoch": int(ckpt.get("epoch", 0)),
        "node_nf": int(ckpt["node_nf"]),
        "hidden_nf": int(ckpt["hidden_nf"]),
        "softening": float(ckpt["softening"]),
        "lj_kBT": float(ckpt["lj_kBT"]),
        "integrator": integrator,
        "dequantizer": "argmax",   # hardcoded in the reference (main.py:153)
        "n_iter": n_iter,
        "dt": float(ckpt["dt"]),
    }
    return params, hparams


def import_reference_checkpoint(in_path, out_path, dtype="float64"):
    """Convert ``in_path`` (reference torch .cpt) to ``out_path`` (our .npz).

    The output restores through the driver's normal checkpoint path: hparams
    define the architecture, ``params`` load positionally against an
    ``init_flow`` template (identical tree structure by construction), and a
    fresh optimizer is initialized on resume (no ``opt_state`` tree).
    """
    from ..train.checkpoint import save_checkpoint

    params, hparams = load_reference_checkpoint(in_path)
    dt = np.dtype(dtype)
    import jax

    params = jax.tree_util.tree_map(lambda x: x.astype(dt), params)
    save_checkpoint(out_path, {"params": params}, hparams)
    return params, hparams


def main(argv=None):
    import sys

    argv = sys.argv[1:] if argv is None else argv
    if len(argv) not in (2, 3):
        print(__doc__)
        raise SystemExit(2)
    dtype = argv[2] if len(argv) == 3 else "float64"
    _, hparams = import_reference_checkpoint(argv[0], argv[1], dtype)
    print(f"imported {argv[0]} -> {argv[1]}  "
          f"(integrator={hparams['integrator']}, n_iter={hparams['n_iter']}, "
          f"hidden_nf={hparams['hidden_nf']}, node_nf={hparams['node_nf']}, "
          f"epoch={hparams['epoch']}, dtype={dtype})")


if __name__ == "__main__":
    main()
