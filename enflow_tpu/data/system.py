"""Batched molecular state as an immutable, fixed-shape JAX pytree.

TPU-native replacement for the reference's mutable, flat-batched ``Data``
(reference ``enflow/data/base.py:21-144``). Differences by design:

- **Dense padded batching** ``[B, N_max, ...]`` with a boolean atom mask instead
  of PyG-style ragged concatenation + per-molecule cumsum slicing (reference
  ``base.py:34-50``). Static shapes are what XLA needs to tile work onto the
  MXU; ``vmap`` over the leading molecule axis replaces every per-molecule
  Python loop in the reference (e.g. ``flow/loss.py:13``, ``data/base.py:129``).
- **Immutability**: flow steps return new ``System`` instances; no in-place
  mutation (reference mutates ``data.pos`` etc. in ``flow/dynamics.py:12-19``).
- Host-only metadata (atom symbols ``z``, labels) lives in the dataset layer,
  not in the device pytree (reference keeps them as Python lists on ``Data``).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..utils.helpers import apply_pbc


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("h", "g", "pos", "vel", "mask", "box", "r_cut"),
    meta_fields=(),
)
@dataclasses.dataclass(frozen=True)
class System:
    """Batched molecular state.

    Attributes:
      h:    ``[B, N, node_nf]`` node features (one-hot atom types, or their
            dequantized continuous relaxation inside the flow).
      g:    ``[B, N, node_nf]`` auxiliary conjugate features ("feature momenta").
      pos:  ``[B, N, 3]`` positions (LJ reduced units).
      vel:  ``[B, N, 3]`` velocities (LJ reduced units).
      mask: ``[B, N]`` bool, True for real atoms, False for padding.
      box:  ``[B, 3]`` periodic box lengths per molecule.
      r_cut: ``[B]`` neighbor cutoff per molecule.
    """

    h: jax.Array
    g: jax.Array
    pos: jax.Array
    vel: jax.Array
    mask: jax.Array
    box: jax.Array
    r_cut: jax.Array

    # -- shape accessors (static) ------------------------------------------
    @property
    def num_mols(self) -> int:
        return self.pos.shape[0]

    @property
    def n_max(self) -> int:
        return self.pos.shape[1]

    @property
    def node_nf(self) -> int:
        return self.h.shape[-1]

    # -- traced quantities -------------------------------------------------
    @property
    def num_atoms(self):
        """Total number of real atoms across the batch (traced scalar)."""
        return self.mask.sum()

    @property
    def atoms_per_mol(self):
        """``[B]`` real atom counts (the reference's ``N`` vector, base.py:28)."""
        return self.mask.sum(axis=-1)

    # -- functional updates ------------------------------------------------
    def replace(self, **kwargs) -> "System":
        return dataclasses.replace(self, **kwargs)

    def get_mol(self, i) -> "System":
        """Slice out molecule ``i`` as a ``B=1`` System (the reference's
        ``Data.get_mol``, base.py:34-50 — here a zero-copy padded view; use
        ``atoms_per_mol`` to trim padding host-side if needed)."""
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i, 1, axis=0)
        return System(h=sl(self.h), g=sl(self.g), pos=sl(self.pos),
                      vel=sl(self.vel), mask=sl(self.mask),
                      box=sl(self.box), r_cut=sl(self.r_cut))

    def pbc(self) -> "System":
        """Wrap positions into the primary image (reference ``base.py:119-120``).

        Padded atoms are left untouched (they are zeros).
        """
        wrapped = apply_pbc(self.pos, self.box[:, None, :])
        return self.replace(pos=jnp.where(self.mask[..., None], wrapped, self.pos))

    def center(self) -> "System":
        """Subtract the per-molecule mean position over real atoms
        (reference ``data/transforms.py:45-52``)."""
        m = self.mask[..., None].astype(self.pos.dtype)
        count = jnp.clip(m.sum(axis=1, keepdims=True), 1, None)
        mean = (self.pos * m).sum(axis=1, keepdims=True) / count
        return self.replace(pos=jnp.where(self.mask[..., None], self.pos - mean, self.pos))

    def astype(self, dtype) -> "System":
        return self.replace(
            h=self.h.astype(dtype),
            g=self.g.astype(dtype),
            pos=self.pos.astype(dtype),
            vel=self.vel.astype(dtype),
            box=self.box.astype(dtype),
            r_cut=self.r_cut.astype(dtype),
        )

    def zero_padded(self) -> "System":
        """Force padded-atom entries of all per-atom fields to zero."""
        am = self.mask[..., None]
        return self.replace(
            h=jnp.where(am, self.h, 0.0),
            g=jnp.where(am, self.g, 0.0),
            pos=jnp.where(am, self.pos, 0.0),
            vel=jnp.where(am, self.vel, 0.0),
        )


def concatenate(systems) -> System:
    """Concatenate batched systems along the molecule axis (same N_max)."""
    return System(
        **{
            f.name: jnp.concatenate([getattr(s, f.name) for s in systems], axis=0)
            for f in dataclasses.fields(System)
        }
    )
