"""Minimal functional parameter system: linear layers and MLPs as pytrees.

The flow integrators ``lax.scan`` over *stacked* per-step parameter pytrees, so
networks are plain ``init(key) -> params`` / ``apply(params, x)`` pairs rather
than stateful modules (the reference uses ``torch.nn.Sequential``/``ModuleList``,
e.g. ``enflow/nn/egcl.py:21-55``, which cannot be scanned).

Initialization follows torch defaults for statistical parity with the
reference's layers: weights and biases ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))
(what ``torch.nn.Linear.reset_parameters`` produces), with an explicit
Xavier-uniform option for the EGCL coordinate gate (reference
``enflow/nn/egcl.py:32-33``).
"""

import math

import jax
import jax.numpy as jnp


def silu(x):
    return jax.nn.silu(x)


def init_linear(key, in_dim, out_dim, dtype=jnp.float32, bias=True,
                init="torch", gain=1.0):
    """Create linear-layer params ``{'w': [in, out], 'b': [out]?}``."""
    wkey, bkey = jax.random.split(key)
    if init == "torch":
        bound = 1.0 / math.sqrt(in_dim)
        w = jax.random.uniform(wkey, (in_dim, out_dim), dtype, -bound, bound)
    elif init == "xavier_uniform":
        bound = gain * math.sqrt(6.0 / (in_dim + out_dim))
        w = jax.random.uniform(wkey, (in_dim, out_dim), dtype, -bound, bound)
    else:
        raise ValueError(init)
    params = {"w": w}
    if bias:
        bound = 1.0 / math.sqrt(in_dim)
        params["b"] = jax.random.uniform(bkey, (out_dim,), dtype, -bound, bound)
    return params


def apply_linear(params, x):
    y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    return y


def init_mlp(key, dims, dtype=jnp.float32):
    """MLP params: list of linear layers for ``dims = [in, h1, ..., out]``."""
    keys = jax.random.split(key, len(dims) - 1)
    return [init_linear(k, dims[i], dims[i + 1], dtype)
            for i, k in enumerate(keys)]


def apply_mlp(params, x, act=silu, final_act=None):
    """Apply an MLP: activation between layers, optional final activation."""
    for i, layer in enumerate(params):
        x = apply_linear(layer, x)
        if i < len(params) - 1:
            x = act(x)
        elif final_act is not None:
            x = final_act(x)
    return x
