"""Floor (uniform) dequantizer — alternative to ArgMax.

Parity with reference ``enflow/nn/floor.py:5-14``: forward adds uniform noise
scaled by ``dequant_scale`` with zero log-density contribution; reverse is
``floor``. Not wired into the reference driver (ArgMax is hardcoded,
reference main.py:153); here it is selectable from config.
"""

import jax
import jax.numpy as jnp


def init_floor(dequant_scale=1.0):
    # No trainable parameters; keep scale as static config-like state.
    return {"dequant_scale": jnp.asarray(dequant_scale)}


def forward(params, h, atom_mask, key):
    noise = jax.random.uniform(key, h.shape, h.dtype)
    z = h + params["dequant_scale"].astype(h.dtype) * noise
    return (jnp.where(atom_mask[..., None], z, 0.0),
            jnp.zeros((h.shape[0],), h.dtype))


def reverse(z, atom_mask):
    return jnp.where(atom_mask[..., None], jnp.floor(z), 0.0)
