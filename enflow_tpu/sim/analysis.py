"""Trajectory analysis observables (device-side, jit/vmap-friendly).

The reference's only trajectory "analysis" is eyeballing OpenMM
StateDataReporter logs (reference ``enflow/data/simulated.py:128-129``);
fluids work needs at least the radial distribution function to validate the
LJ latent sampler against known structure (and generated molecular
configurations against MD).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def radial_distribution(pos, box, r_max, n_bins: int = 100, mask=None):
    """g(r) over a trajectory under the minimum-image convention.

    Args:
      pos:   ``[F, N, 3]`` frames (or ``[N, 3]`` for a single frame).
      box:   ``[3]`` periodic box lengths.
      r_max: histogram range; must be <= min(box)/2 for min-image validity.
      n_bins: number of radial bins.
      mask:  optional ``[N]`` real-atom mask.

    Returns:
      ``(r_centers [n_bins], g [n_bins])`` normalized so an ideal gas gives
      g(r) = 1: each i<j pair counted once against the ideal-gas expectation
      ``(N_real (N_real - 1) / 2) * shell_volume / box_volume`` per frame.
    """
    pos = jnp.asarray(pos)
    if pos.ndim == 2:
        pos = pos[None]
    F, N, _ = pos.shape
    box = jnp.asarray(box, pos.dtype)
    if mask is None:
        mask = jnp.ones((N,), bool)
    n_real = mask.sum()

    iu = jnp.triu(jnp.ones((N, N), dtype=bool), k=1)
    pair_mask = iu & mask[:, None] & mask[None, :]
    edges = jnp.linspace(0.0, r_max, n_bins + 1).astype(pos.dtype)

    def frame_hist(p):
        d = p[:, None, :] - p[None, :, :]
        d = d - jnp.round(d / box) * box
        # invalid pairs get r = inf, deterministically past the last edge
        # (a negative sentinel would go through sqrt(-1) = NaN, which both
        # trips jax_debug_nans and relies on searchsorted's NaN ordering)
        r = jnp.sqrt(jnp.where(pair_mask, (d * d).sum(-1), jnp.inf))
        return jnp.histogram(r, bins=edges)[0]

    hist = jax.vmap(frame_hist)(pos).sum(axis=0).astype(pos.dtype)

    shell_vol = (4.0 / 3.0) * jnp.pi * (edges[1:] ** 3 - edges[:-1] ** 3)
    n_pairs = n_real * (n_real - 1) / 2.0
    ideal = F * n_pairs * shell_vol / box.prod()
    centers = 0.5 * (edges[1:] + edges[:-1])
    return centers, hist / jnp.maximum(ideal, 1e-30)
