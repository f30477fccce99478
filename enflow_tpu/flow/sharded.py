"""Atom-axis-sharded flow: shard_map wrappers over the flow + NLL.

End-to-end large-N path (SURVEY §5): for systems whose atom count is the
scaling axis (the reference's analogue of "sequence length" — its dense
neighbor list ``data/base.py:135`` and loss ``flow/loss.py:14`` are both
O(N^2) on one device), the ``System``'s atom dimension is sharded over an
``atom`` mesh axis. Every EGCL evaluation becomes a ``ppermute`` ring over
neighbor blocks (``parallel/ring.py``), the NLL pairwise term a ring energy
(``parallel/pairwise.py``), and per-molecule reductions (ldj, kinetic,
Gaussian terms) ``psum``s — O(N^2/P) compute and O(N/P) state per device,
with collectives riding the ICI.

Composes with data parallelism: a 2-D mesh ``("data", "atom")`` shards the
molecule batch over ``data`` and each molecule's atoms over ``atom``.
Parameters stay replicated (in_specs ``P()``); the wrappers are
``jax.grad``-compatible (autodiff through shard_map/ppermute), so the same
train step runs single-chip dense or pod-sharded with no body changes.

Top-k neighbor capacity doesn't shard this way (a global top-k over atoms);
sharded runs use ``nbr_mode`` 'dense' or 'all_pairs', whose edge sets are
defined blockwise.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.system import System
from ..utils.helpers import LOG_2PI
from .integrators import FlowConfig, forward, reverse, forward_core, \
    reverse_core, _dequant_reverse
from .loss import alchemical_log_px


def system_specs(axis="atom", data_axis=None) -> System:
    """A ``System`` of PartitionSpecs: atoms over ``axis``, molecules over
    ``data_axis`` (None = replicated batch)."""
    pa = P(data_axis, axis)
    return System(h=pa, g=pa, pos=pa, vel=pa, mask=pa,
                  box=P(data_axis), r_cut=P(data_axis))


def shard_system(sys: System, mesh: Mesh, axis="atom", data_axis=None) -> System:
    """Place a ``System`` on the mesh with the atom axis sharded."""
    specs = system_specs(axis, data_axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), sys, specs)


def _sharded_cfg(cfg: FlowConfig, axis: str) -> FlowConfig:
    if cfg.nbr_mode not in ("dense", "all_pairs"):
        raise ValueError(
            f"atom-sharded flow supports nbr_mode 'dense'/'all_pairs', got "
            f"{cfg.nbr_mode!r} (top-k capacity is a global op)")
    if cfg.nbr_capacity is not None:
        raise ValueError("nbr_capacity is not supported in atom-sharded mode")
    # remat is forcibly disabled inside shard_map. Functional constraint:
    # jax.checkpoint cannot evaluate eagerly inside shard_map ("Eager
    # evaluation of closed_call isn't yet supported"), so a remat'd scan
    # body breaks any non-jitted grad of the sharded flow. It is also
    # unwanted here: atom sharding already divides the edge activations by
    # the mesh size, and rematerializing the ring EGCL would re-run every
    # backward ppermute rotation (double ICI traffic).
    return dataclasses.replace(cfg, axis_name=axis, remat=False)


def sharded_forward(mesh: Mesh, params, cfg: FlowConfig, sys: System, key,
                    axis="atom", data_axis=None):
    """``flow.forward`` with atoms sharded: returns ``(out_system, ldj [B])``,
    the system sharded like the input and ldj replicated over ``axis``."""
    cfg_s = _sharded_cfg(cfg, axis)
    specs = system_specs(axis, data_axis)
    f = jax.shard_map(
        lambda p, s, k: forward(p, cfg_s, s, k), mesh=mesh,
        in_specs=(P(), specs, P()), out_specs=(specs, P(data_axis)))
    return f(params, sys, key)


def sharded_forward_core(mesh: Mesh, params, cfg: FlowConfig, sys: System,
                         axis="atom", data_axis=None):
    cfg_s = _sharded_cfg(cfg, axis)
    specs = system_specs(axis, data_axis)
    f = jax.shard_map(
        lambda p, s: forward_core(p, cfg_s, s), mesh=mesh,
        in_specs=(P(), specs), out_specs=(specs, P(data_axis)))
    return f(params, sys)


def sharded_reverse_core(mesh: Mesh, params, cfg: FlowConfig, sys: System,
                         axis="atom", data_axis=None):
    cfg_s = _sharded_cfg(cfg, axis)
    specs = system_specs(axis, data_axis)
    f = jax.shard_map(
        lambda p, s: reverse_core(p, cfg_s, s), mesh=mesh,
        in_specs=(P(), specs), out_specs=(specs, P(data_axis)))
    return f(params, sys)


def sharded_reverse(mesh: Mesh, params, cfg: FlowConfig, sys: System,
                    axis="atom", data_axis=None):
    """``flow.reverse`` (inverse integrate + re-quantize), atoms sharded."""
    cfg_s = _sharded_cfg(cfg, axis)
    specs = system_specs(axis, data_axis)

    def body(p, s):
        s, _ = reverse_core(p, cfg_s, s)
        return s.replace(h=_dequant_reverse(cfg_s, s.h, s.mask))

    f = jax.shard_map(body, mesh=mesh, in_specs=(P(), specs),
                      out_specs=specs)
    return f(params, sys)


def make_sharded_nll(mesh: Mesh, cfg: FlowConfig, kBT, softening,
                     num_log_gaussian_calls=3, partition_func=10.0,
                     axis="atom", data_axis=None):
    """Build ``loss(params, sys, key) -> scalar``: the alchemical NLL of the
    sharded forward pass, globally identical to
    ``alchemical_nll(forward(...))`` on one device (``jax.grad``-able).
    """
    cfg_s = _sharded_cfg(cfg, axis)
    specs = system_specs(axis, data_axis)

    def body(p, s, k):
        out, ldj = forward(p, cfg_s, s, k)
        real = jax.lax.psum(s.mask.any(axis=1).astype(jnp.int32), axis) > 0
        per_mol = alchemical_log_px(out, ldj, kBT, softening, partition_func,
                                    axis_name=axis)
        tot = jnp.where(real, per_mol, 0.0).sum()
        num = real.sum().astype(out.pos.dtype)
        if data_axis:
            tot = jax.lax.psum(tot, data_axis)
            num = jax.lax.psum(num, data_axis)
        # re-globalize the log(2*pi)-per-log_gaussian-call constant
        # (see alchemical_nll)
        log_px = tot + 0.5 * num_log_gaussian_calls * LOG_2PI * (num - 1.0)
        return -log_px / num

    f = jax.shard_map(body, mesh=mesh, in_specs=(P(), specs, P()),
                      out_specs=P())

    def loss(params, sys, key):
        return f(params, sys, key)

    return loss
