"""ArgMax flow dequantizer for one-hot atom-type features.

Semantic parity with reference ``enflow/nn/argmax.py:6-29`` (an argmax flow /
variational dequantization): a conditional Gaussian ``u ~ N(translate,
exp(log_scale))`` from an MLP on ``h``, a thresholding transform that makes the
one-hot argmax recoverable, and an accumulated ``log_q``:

    net_out            = MLP(h)                       (argmax.py:9-15)
    u                  = translate + eps * exp(log_scale)   (:17)
    log_q              = log_gaussian(u) - sum(log_scale)   (:19)
    T                  = sum(h * u, -1)                     (:21)
    z                  = h*u + (1-h)*(T - softplus(T-u))    (:22)
    log_q             -= sum((1-h) * logsigmoid(T-u))       (:23-24)
    reverse(z)         = one_hot(argmax(z))                 (:28-29)

Mask-aware: padded atoms produce ``z = 0`` and contribute nothing to ``log_q``.
RNG is explicit (``jax.random`` key) instead of the reference's hidden
``torch.randn`` (argmax.py:17).
"""

import jax
import jax.numpy as jnp

from .mlp import init_mlp, apply_mlp
from ..utils.helpers import LOG_2PI


def init_argmax(key, node_nf, hidden_nf, dtype=jnp.float32):
    # network: Linear(nf->hidden), SiLU, Linear(hidden->2nf) (argmax.py:9-12)
    return {"network": init_mlp(key, [node_nf, hidden_nf, 2 * node_nf], dtype)}


def forward(params, h, atom_mask, key):
    """Dequantize one-hot ``h`` -> continuous ``z`` with accumulated ``log_q``.

    Args:
      h: ``[B, N, nf]`` one-hot features.
      atom_mask: ``[B, N]`` bool.
      key: PRNG key for the dequantization noise.

    Returns:
      ``(z [B, N, nf], log_q [B])`` — per-molecule log_q (samplers need
      per-particle densities; summing recovers the reference's batch scalar).
      The formula follows the reference convention exactly; the reference's
      ``log_gaussian`` adds a single ``log(2*pi)`` per call (helpers.py:4-5),
      which here is charged once per molecule — the batch NLL re-applies the
      global-constant quirk (see ``flow/loss.py``). ``log_q`` is *added* to
      the ldj by the integrators, as the reference does (dynamics.py:11).
    """
    am = atom_mask[..., None]
    net_out = apply_mlp(params["network"], h)
    log_scale, translate = jnp.split(net_out, 2, axis=-1)
    eps = jax.random.normal(key, h.shape, h.dtype)
    u = translate + eps * jnp.exp(log_scale)

    # log_q = log_gaussian(u) - log_scale.sum()   (masked, per molecule)
    u_sq = jnp.where(am, u * u, 0.0)
    log_q = (-0.5 * (u_sq.sum(axis=(1, 2)) + LOG_2PI)
             - jnp.where(am, log_scale, 0.0).sum(axis=(1, 2)))

    T = (h * u).sum(-1, keepdims=True)
    z = h * u + (1.0 - h) * (T - jax.nn.softplus(T - u))
    ldj = (1.0 - h) * jax.nn.log_sigmoid(T - u)
    log_q = log_q - jnp.where(am, ldj, 0.0).sum(axis=(1, 2))

    return jnp.where(am, z, 0.0), log_q


def reverse(z, atom_mask):
    """Re-quantize: one-hot of the argmax (reference argmax.py:28-29)."""
    oh = jax.nn.one_hot(jnp.argmax(z, axis=-1), z.shape[-1], dtype=z.dtype)
    return jnp.where(atom_mask[..., None], oh, 0.0)
