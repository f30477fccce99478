"""JAX-native MD: Langevin-middle (BAOAB) integrator, FIRE minimizer,
Maxwell-Boltzmann thermalization.

TPU-native replacement for the OpenMM machinery the reference drives in
``enflow/data/simulated.py:108-133`` (``LangevinMiddleIntegrator``,
``minimizeEnergy``, ``setVelocitiesToTemperature``, reporter capture loop).
Everything is pure-functional in LJ reduced units (argon mass = 1) and runs
under one ``jit`` on TPU: the inner MD loop is a ``lax.scan`` over capture
intervals, each containing a ``lax.fori_loop`` of integrator steps — latent
sampling never leaves the device.

The Langevin-middle scheme matches OpenMM's (kick, half-drift, O-step
friction+noise, half-drift)::

    v <- v + dt * F(x)/m
    x <- x + dt/2 * v
    v <- a*v + sqrt(kBT/m)*sqrt(1-a^2) * R,   a = exp(-gamma*dt)
    x <- x + dt/2 * v
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..utils.helpers import apply_pbc


class MDState(NamedTuple):
    pos: jax.Array   # [N, 3]
    vel: jax.Array   # [N, 3]
    key: jax.Array


def instantaneous_temperature(vel, mass=1.0):
    """kBT estimate from kinetic energy: sum(m v^2) / (3 N)."""
    n = vel.shape[0]
    return (mass * (vel * vel)).sum() / (3.0 * n)


def thermalize(key, n_atoms, kBT, mass=1.0, dtype=jnp.float32):
    """Maxwell-Boltzmann velocities (OpenMM ``setVelocitiesToTemperature``
    equivalent, reference simulated.py:116)."""
    std = jnp.sqrt(jnp.asarray(kBT / mass, dtype))
    return std * jax.random.normal(key, (n_atoms, 3), dtype)


def langevin_middle_step(state: MDState, force_fn: Callable, dt, friction,
                         kBT, mass=1.0, box=None) -> MDState:
    """One BAOAB Langevin-middle step.

    With a periodic ``box``, positions are kept wrapped — an identity on the
    dynamics (forces use min-image) that stops coordinates drifting toward
    float32 overflow over long trajectories.
    """
    pos, vel, key = state
    key, nkey = jax.random.split(key)
    vel = vel + dt * force_fn(pos) / mass
    pos = pos + 0.5 * dt * vel
    a = jnp.exp(-friction * dt)
    noise = jnp.sqrt(kBT / mass) * jnp.sqrt(1.0 - a * a)
    vel = a * vel + noise * jax.random.normal(key, vel.shape, vel.dtype)
    pos = pos + 0.5 * dt * vel
    if box is not None:
        pos = apply_pbc(pos, box)
    return MDState(pos, vel, nkey)


def simulate(key, pos0, vel0, energy_fn: Callable, *, n_steps: int,
             interval: int, dt, friction, kBT, box=None, mass=1.0):
    """Run MD, capturing a frame every ``interval`` steps.

    Mirrors the reference's reporter protocol (simulated.py:31-76): frames are
    captured at steps ``interval, 2*interval, ..., <= n_steps`` with captured
    positions PBC-wrapped (the reporter wraps them itself, simulated.py:46;
    the integration state stays unwrapped like OpenMM's). ``discard``
    filtering (``report_from``) is left to the host caller — the frame count
    must be static under jit.

    Returns:
      ``(frames, final_state)`` where frames is a dict of stacked arrays
      ``pos [n_frames,N,3]``, ``vel``, ``pe [n_frames]``, ``kBT_inst``,
      ``step [n_frames]``.
    """
    force = jax.grad(lambda p: -energy_fn(p))
    n_frames = n_steps // interval

    def inner(i, st):
        return langevin_middle_step(st, force, dt, friction, kBT, mass, box)

    def chunk(st, chunk_idx):
        st = jax.lax.fori_loop(0, interval, inner, st)
        cap_pos = apply_pbc(st.pos, box) if box is not None else st.pos
        frame = {
            "pos": cap_pos,
            "vel": st.vel,
            "pe": energy_fn(st.pos),
            "kBT_inst": instantaneous_temperature(st.vel, mass),
            "step": (chunk_idx + 1) * interval,
        }
        return st, frame

    state = MDState(pos0, vel0, key)
    state, frames = jax.lax.scan(chunk, state, jnp.arange(n_frames))
    return frames, state


class NVEState(NamedTuple):
    pos: jax.Array    # [N, 3]
    vel: jax.Array    # [N, 3]
    force: jax.Array  # [N, 3] (carried so each step costs ONE force eval)


def velocity_verlet_step(state: NVEState, force_fn: Callable, dt,
                         mass=1.0, box=None) -> NVEState:
    """One NVE velocity-Verlet step (no thermostat).

    Symplectic and time-reversible: total energy oscillates but does not
    drift — the canonical integrator-correctness oracle (see
    tests/test_sim.py energy-conservation test). The force at the new
    positions is carried in the state, so each step evaluates the force
    once, like the kick-drift-kick form in any production MD engine.
    """
    pos, vel, f = state
    vel = vel + 0.5 * dt * f / mass
    pos = pos + dt * vel
    if box is not None:
        pos = apply_pbc(pos, box)
    f = force_fn(pos)
    vel = vel + 0.5 * dt * f / mass
    return NVEState(pos, vel, f)


def simulate_nve(pos0, vel0, energy_fn: Callable, *, n_steps: int,
                 interval: int, dt, box=None, mass=1.0):
    """Constant-energy MD; captures ``pe``/``ke``/``te`` per frame.

    Same reporter protocol as :func:`simulate`; returns
    ``(frames, final_state)``.
    """
    force = jax.grad(lambda p: -energy_fn(p))
    n_frames = n_steps // interval

    def inner(i, st):
        return velocity_verlet_step(st, force, dt, mass, box)

    def chunk(st, chunk_idx):
        st = jax.lax.fori_loop(0, interval, inner, st)
        pe = energy_fn(st.pos)
        ke = 0.5 * (mass * (st.vel * st.vel)).sum()
        frame = {
            "pos": apply_pbc(st.pos, box) if box is not None else st.pos,
            "vel": st.vel,
            "pe": pe, "ke": ke, "te": pe + ke,
            "kBT_inst": instantaneous_temperature(st.vel, mass),
            "step": (chunk_idx + 1) * interval,
        }
        return st, frame

    state = NVEState(pos0, vel0, force(pos0))
    state, frames = jax.lax.scan(chunk, state, jnp.arange(n_frames))
    return frames, state


def minimize_fire(pos0, energy_fn: Callable, *, n_steps: int = 200,
                  dt_start: float = 0.01, dt_max: float = 0.1,
                  alpha_start: float = 0.1, f_inc: float = 1.1,
                  f_dec: float = 0.5, f_alpha: float = 0.99,
                  n_min: int = 5, max_step: float = 0.05, box=None):
    """FIRE energy minimization (OpenMM ``minimizeEnergy`` stand-in,
    reference simulated.py:114). Fixed step count for static shapes.

    ``max_step`` caps the per-coordinate displacement per iteration
    (in reduced length units) — without it, one overshoot into the stiff
    LJ wall launches atoms to overflow in float32 and ``min_image`` of an
    infinite coordinate is NaN. ``box`` (optional) keeps positions wrapped.
    """
    force = jax.grad(lambda p: -energy_fn(p))

    def step(carry, _):
        pos, vel, dt, alpha, n_pos = carry
        f = force(pos)
        vel = vel + dt * f
        power = (f * vel).sum()
        f_norm = jnp.sqrt((f * f).sum()) + 1e-12
        v_norm = jnp.sqrt((vel * vel).sum())
        vel_mixed = (1.0 - alpha) * vel + alpha * f / f_norm * v_norm

        uphill = power <= 0.0
        vel = jnp.where(uphill, jnp.zeros_like(vel), vel_mixed)
        n_pos = jnp.where(uphill, 0, n_pos + 1)
        grow = (~uphill) & (n_pos > n_min)
        dt = jnp.where(grow, jnp.minimum(dt * f_inc, dt_max),
                       jnp.where(uphill, dt * f_dec, dt))
        alpha = jnp.where(grow, alpha * f_alpha,
                          jnp.where(uphill, alpha_start, alpha))
        pos = pos + jnp.clip(dt * vel, -max_step, max_step)
        if box is not None:
            pos = apply_pbc(pos, box)
        return (pos, vel, dt, alpha, n_pos), None

    init = (pos0, jnp.zeros_like(pos0), jnp.asarray(dt_start, pos0.dtype),
            jnp.asarray(alpha_start, pos0.dtype), jnp.asarray(0))
    (pos, *_), _ = jax.lax.scan(step, init, None, length=n_steps)
    return pos
