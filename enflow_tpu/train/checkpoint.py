"""Self-describing single-file checkpoints.

Parity with the reference's ``torch.save`` checkpoint dict (reference
``enflow/main.py:236-250``): one file holding model + optimizer state *plus
the architecture hyperparameters* (node_nf, hidden_nf, n_iter, dt, integrator,
lj_kBT, softening, epoch) so generate mode can rebuild the model from the
checkpoint alone (reference main.py:102-109).

Format: a single ``.npz``. The checkpoint is a dict of named pytrees (e.g.
``{"params": ..., "opt_state": ...}``); each tree's leaves are stored
positionally under its name (``params_00000`` ...) plus a JSON ``hparams``
entry. Restoring unflattens into freshly-initialized template trees, so no
pickled code is executed (unlike ``torch.load``) and any subset of trees can
be loaded (generate mode restores only ``params``, reference main.py:153-157).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def save_checkpoint(path, trees: dict, hparams: dict):
    payload = {}
    for name, tree in trees.items():
        leaves = jax.tree_util.tree_leaves(tree)
        for i, x in enumerate(leaves):
            payload[f"{name}_{i:05d}"] = np.asarray(jax.device_get(x))
    payload["hparams"] = np.frombuffer(
        json.dumps(hparams).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)  # atomic: never leave a torn checkpoint


def load_hparams(path) -> dict:
    with np.load(path) as z:
        return json.loads(bytes(z["hparams"]).decode())


def has_tree(path, name: str) -> bool:
    """Whether the checkpoint stores any leaves under ``name`` (e.g.
    checkpoints imported from the reference carry ``params`` but no
    ``opt_state``)."""
    with np.load(path) as z:
        return any(k.startswith(name + "_") for k in z.files)


def load_checkpoint(path, templates: dict):
    """Load the named trees in ``templates`` (freshly-initialized pytrees of
    the right structure). Returns ``(trees, hparams)``."""
    out = {}
    with np.load(path) as z:
        hparams = json.loads(bytes(z["hparams"]).decode())
        for name, template in templates.items():
            leaves, treedef = jax.tree_util.tree_flatten(template)
            keys = sorted(k for k in z.files if k.startswith(name + "_"))
            if len(keys) != len(leaves):
                raise ValueError(
                    f"checkpoint {path} tree '{name}' has {len(keys)} leaves "
                    f"but the model expects {len(leaves)} — architecture "
                    f"mismatch")
            new_leaves = []
            for key, old in zip(keys, leaves):
                arr = z[key]
                if hasattr(old, "shape") and tuple(arr.shape) != tuple(jnp.shape(old)):
                    raise ValueError(
                        f"checkpoint leaf {key} shape {arr.shape} != expected "
                        f"{jnp.shape(old)}")
                new_leaves.append(
                    jnp.asarray(arr, getattr(old, "dtype", arr.dtype)))
            out[name] = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return out, hparams
