"""Atom-axis-sharded pairwise energies: the ring "long-context" pattern.

The reference's scaling wall is the dense O(N^2) pairwise work — the
27-image neighbor list (reference ``enflow/data/base.py:135``) and the LJ
loss (``flow/loss.py:14``) both materialize dense distance matrices on one
device. For large systems (LJ55+, solvated boxes — BASELINE config 5) the
TPU-native answer (SURVEY §5) is to shard the *atom axis* across the mesh
and rotate position blocks around the ICI ring with ``lax.ppermute``,
accumulating per-block pairwise terms — O(N^2/P) compute and O(N/P) memory
per chip, with bandwidth overlapped by XLA.

``sharded_softened_lj_energy`` matches ``sim.potentials.softened_lj_energy``
bit-for-block and is differentiable (autodiff through ``ppermute`` yields the
reverse rotation), so forces and the NLL gradient shard the same way.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.helpers import min_image


def _block_pair_energy(pos_i, pos_j, box, softening, cutoff, mask_i, mask_j,
                       exclude_diag):
    """Sum of pair energies between two atom blocks (ordered pairs)."""
    diff = pos_i[:, None, :] - pos_j[None, :, :]
    diff = min_image(diff, box)
    d2 = (diff * diff).sum(-1)
    valid = mask_i[:, None] & mask_j[None, :] & (d2 < cutoff * cutoff)
    if exclude_diag is not None:
        valid = valid & ~exclude_diag
    r = jnp.sqrt(jnp.where(valid, d2, 1.0))
    inv = 1.0 / (softening + r)
    inv6 = inv**6
    e = 4.0 * (inv6 * inv6 - inv6)
    return jnp.where(valid, e, 0.0).sum()


def ring_softened_lj_energy(pos_blk, mask_blk, box, softening, cutoff,
                            axis_name: str):
    """Per-shard body: total energy with atoms sharded over ``axis_name``.

    ``pos_blk [n_blk, 3]`` / ``mask_blk [n_blk]`` are this device's atoms.
    Returns the replicated global energy (psum over shards).
    """
    n_dev = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    n_blk = pos_blk.shape[0]
    eye = jnp.eye(n_blk, dtype=bool)

    def step(s, carry):
        energy, other_pos, other_mask = carry
        # at rotation s, `other` originated from shard (my_idx + s) % n_dev
        diag = jnp.where(s == 0, True, False)
        e = _block_pair_energy(
            pos_blk, other_pos, box, softening, cutoff, mask_blk, other_mask,
            exclude_diag=jnp.where(diag, eye, jnp.zeros_like(eye)))
        energy = energy + e
        # rotate: receive the block from my right neighbor
        perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        other_pos = jax.lax.ppermute(other_pos, axis_name, perm)
        other_mask = jax.lax.ppermute(other_mask, axis_name, perm)
        return energy, other_pos, other_mask

    del my_idx
    # the running energy is per-shard data: mark it varying over the mesh
    # axis so the fori_loop carry types line up (shard_map VMA typing)
    zero = jax.lax.pcast(jnp.zeros((), pos_blk.dtype), (axis_name,),
                         to="varying")
    energy, _, _ = jax.lax.fori_loop(0, n_dev, step,
                                     (zero, pos_blk, mask_blk))
    # ordered pairs counted across all shards -> halve for i<j convention
    return 0.5 * jax.lax.psum(energy, axis_name)


def ring_alchemical_lj(pos_blk, mask_blk, softening, axis_name: str):
    """Atom-sharded NLL pairwise term: the *loss* LJ formula
    (``flow/loss.py:lj_potential`` — softening on r^2, no PBC, no cutoff,
    zero-distance pairs excluded) with atoms rotated around the ring.

    ``pos_blk [B, n_blk, 3]`` / ``mask_blk [B, n_blk]`` are this shard's atom
    blocks of a batch of molecules. Returns the replicated per-molecule
    energies ``[B]``. Exactly the dense value: ordered pairs accumulate over
    rotations and are halved (self/coincident pairs drop via the ``d2 != 0``
    exclusion the reference applies, loss.py:15).
    """
    n_dev = jax.lax.psum(1, axis_name)
    perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def pair_block(pos_j, mask_j):
        diff = pos_blk[:, :, None, :] - pos_j[:, None, :, :]
        d2 = (diff * diff).sum(-1)
        valid = (mask_blk[:, :, None] & mask_j[:, None, :]) & (d2 != 0.0)
        r_sq = jnp.where(valid, d2 + softening, 1.0)
        r_6 = r_sq * r_sq * r_sq
        e = 4.0 * (1.0 / (r_6 * r_6) - 1.0 / r_6)
        return jnp.where(valid, e, 0.0).sum(axis=(1, 2))

    def step(s, carry):
        energy, pos_j, mask_j = carry
        energy = energy + pair_block(pos_j, mask_j)
        pos_j = jax.lax.ppermute(pos_j, axis_name, perm)
        mask_j = jax.lax.ppermute(mask_j, axis_name, perm)
        return energy, pos_j, mask_j

    # zero carry derived from the input so its varying-axes type matches the
    # loop output on any mesh (inputs may vary over a data axis too)
    zero = 0.0 * pos_blk[:, 0, 0]
    energy, _, _ = jax.lax.fori_loop(0, n_dev, step,
                                     (zero, pos_blk, mask_blk))
    return 0.5 * jax.lax.psum(energy, axis_name)


def ring_pair_terms(pos_blk, mask_blk, axis_name: str, term_fn, box=None):
    """Generic atom-sharded unordered-pair reduction.

    ``pos_blk [B, n_blk, 3]`` / ``mask_blk [B, n_blk]`` are this shard's atom
    blocks. ``term_fn(d2 [B, bi, bj], valid [B, bi, bj]) -> [B]`` evaluates
    and sums a pair term over the valid entries of one block pair; ``valid``
    already excludes padded atoms and self-pairs (the diagonal of the s == 0
    rotation), so ``term_fn`` only adds its own physics (coincident-pair
    guards, cutoffs). Ordered pairs accumulate over the ``ppermute`` ring and
    are halved — exactly the dense i<j sum for any symmetric term.

    ``box`` (optional): periodic box — scalar or anything broadcastable to
    the ``[B, bi, bj, 3]`` displacement block; when given, displacements are
    min-image wrapped before squaring (the PBC-fluid targets,
    ``sample/targets.py:lj_fluid``).

    This is the building block for atom-sharded sampler *targets*
    (``sample/targets.py: Target.log_prob_sharded``) — the same ring pattern
    as :func:`ring_alchemical_lj`, with the pair formula injected.
    """
    n_dev = jax.lax.psum(1, axis_name)
    perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    nb = pos_blk.shape[1]
    eye = jnp.eye(nb, dtype=bool)[None]

    def step(s, carry):
        acc, pos_j, mask_j = carry
        diff = pos_blk[:, :, None, :] - pos_j[:, None, :, :]
        if box is not None:
            diff = min_image(diff, box)
        d2 = (diff * diff).sum(-1)
        valid = mask_blk[:, :, None] & mask_j[:, None, :]
        valid = valid & ~jnp.where(s == 0, eye, jnp.zeros_like(eye))
        acc = acc + term_fn(d2, valid)
        pos_j = jax.lax.ppermute(pos_j, axis_name, perm)
        mask_j = jax.lax.ppermute(mask_j, axis_name, perm)
        return acc, pos_j, mask_j

    # zero carry derived from the input (varying-axes typing, see above)
    zero = 0.0 * pos_blk[:, 0, 0]
    acc, _, _ = jax.lax.fori_loop(0, n_dev, step, (zero, pos_blk, mask_blk))
    return 0.5 * jax.lax.psum(acc, axis_name)


def make_sharded_lj_energy(mesh: Mesh, axis: str = "atom"):
    """Build a jitted sharded energy: ``f(pos [N,3], mask [N], box, softening,
    cutoff) -> scalar`` with ``N`` divided over ``mesh[axis]``."""

    @partial(jax.jit, static_argnames=("softening", "cutoff"))
    def energy(pos, mask, box, softening, cutoff):
        f = jax.shard_map(
            lambda p, m, b: ring_softened_lj_energy(
                p, m, b, softening, cutoff, axis),
            mesh=mesh,
            in_specs=(P(axis), P(axis), P()),
            out_specs=P(),
        )
        return f(pos, mask, box)

    return energy
