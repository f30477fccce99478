"""Floor (uniform) dequantizer — alternative to ArgMax.

Parity with reference ``enflow/nn/floor.py:5-14``: forward adds uniform noise
scaled by ``dequant_scale`` with zero log-density contribution; reverse is
``floor``. Not wired into the reference driver (ArgMax is hardcoded,
reference main.py:153); here it is selectable from config.

The scale is *static* (``FlowConfig.dequant_scale``), not a parameter: the
reference keeps it as a plain attribute too, and making it trainable would
be wrong — ``log_q`` is 0 only for a fixed scale (a learned scale would need
a ``-sum(log scale)`` density term, and any scale > 1 breaks the
``floor``-based inverse).
"""

import jax
import jax.numpy as jnp


def init_floor(dequant_scale=1.0):
    # No trainable parameters and no state: the scale lives in FlowConfig.
    return {}


def forward(scale, h, atom_mask, key):
    noise = jax.random.uniform(key, h.shape, h.dtype)
    z = h + jnp.asarray(scale, h.dtype) * noise
    return (jnp.where(atom_mask[..., None], z, 0.0),
            jnp.zeros((h.shape[0],), h.dtype))


def reverse(z, atom_mask):
    return jnp.where(atom_mask[..., None], jnp.floor(z), 0.0)
