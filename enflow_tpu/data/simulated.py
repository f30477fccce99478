"""Simulated datasets: datasets whose samples come from running MD on-device.

TPU-native rebuild of the reference's OpenMM-driven ``SimulatedDataset``
(reference ``enflow/data/simulated.py:15-133``): subclasses implement
``setup`` returning a JAX potential-energy function plus an initial
configuration, and this base class runs the full pipeline the reference
delegates to OpenMM — energy minimization (FIRE standing in for
``minimizeEnergy``, reference simulated.py:114), Maxwell-Boltzmann
thermalization (``setVelocitiesToTemperature``, simulated.py:116),
Langevin-middle dynamics (``LangevinMiddleIntegrator``, simulated.py:110),
and a reporter protocol that captures a frame every ``interval`` steps after
``discard`` (simulated.py:37-76), writes a PDB trajectory (simulated.py:48-55)
and a ``StateDataReporter``-style CSV log (simulated.py:128-129).

The whole MD trajectory runs inside one jitted ``lax.scan`` on the device
(``enflow_tpu.sim.integrate.simulate``); only captured frames come back to
the host. Dynamics use the dimensionally-correct time conversion
(``time_to_lj_md`` — the reference's reduced time unit carries a stray
sqrt(1000 g/kg); see ``utils/conversion.py``) so "dt: 0.004 ps" decorrelates
the same amount of real time OpenMM would.

Unit flow: YAML parameters arrive in declared lab units; the simulation runs
in LJ reduced units; captured frames are converted *back* to lab units before
``append`` so the standard transform pipeline (``ConvertPositionsFrom`` etc.)
applies unchanged — exactly how the reference's OpenMM frames enter
``_get_data``.

Subclass contract (the extension point, reference simulated.py:85)::

    class MyDataset(SimulatedDataset):
        latent_features = False   # True: draw h,g ~ N(0, 1/sqrt(kBT))
                                  # (the LJ latent sampler, simulated.py:59-64)

        def setup(self, box_red, **params):
            # box_red: [3] box lengths in reduced units
            # returns (energy_fn(pos)->scalar in reduced units,
            #          pos0 [N,3] reduced, atom symbols [N], name)
"""

from __future__ import annotations

import os
from abc import abstractmethod

import numpy as np

from .datasets import InMemoryDataset
from ..utils import conversion as cv
from ..utils.constants import eps


def _ensure_parent(path):
    """Create a declared output file's parent directory (the example
    configs point log/traj into data/<name>/ which need not exist yet)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)


def write_pdb_frames(path, z, frames_ang, box_ang):
    """Minimal multi-MODEL PDB trajectory writer (coordinates in Angstrom;
    parity artifact for the reference's PDB reporter, simulated.py:48-55)."""
    with open(path, "w") as f:
        f.write(
            "CRYST1{:9.3f}{:9.3f}{:9.3f}  90.00  90.00  90.00 P 1           1\n"
            .format(*[float(b) for b in box_ang]))
        for m, pos in enumerate(frames_ang, start=1):
            f.write(f"MODEL     {m:4d}\n")
            for i, (sym, (x, y, c)) in enumerate(zip(z, pos), start=1):
                el = sym[:2].rjust(2)
                f.write(
                    f"ATOM  {i:5d} {sym:<4.4s} MOL A   1    "
                    f"{x:8.3f}{y:8.3f}{c:8.3f}  1.00  0.00          {el}\n")
            f.write("ENDMDL\n")
        f.write("END\n")


class SimulatedDataset(InMemoryDataset):
    """In-memory dataset populated by an on-device MD run."""

    #: subclasses set True to attach latent Gaussian features
    #: ``h, g ~ N(0, 1/sqrt(kBT))`` instead of one-hot atom types
    #: (reference simulated.py:59-64 — the LJ latent-sampler behavior).
    latent_features = False

    @abstractmethod
    def setup(self, box_red, **params):
        """Return ``(energy_fn, pos0, z, name)`` — see module docstring."""

    def process(self, temp, n_iter, interval, dt, friction=1.0, discard=-1,
                dist_unit="ang", time_unit="pico", node_nf=None, log=None,
                traj=None, minimize_steps=200, **setup_params):
        import jax
        import jax.numpy as jnp
        from ..sim import minimize_fire, simulate, thermalize

        if self.box is None:
            raise ValueError(
                "SimulatedDataset requires a box (lab units) in the dataset "
                "section")
        box_red = cv.dist_to_lj(np.asarray(self.box, np.float64), dist_unit)

        energy, pos0, z, name = self.setup(
            box_red, dist_unit=dist_unit, **setup_params)

        kBT = cv.kelvin_to_lj(float(temp))
        # dimensionally-correct MD time: dt and friction (units 1/time)
        dt_red = cv.time_to_lj_md(float(dt), time_unit)
        friction_red = float(friction) / cv.time_to_lj_md(1.0, time_unit)

        box_j = jnp.asarray(box_red)
        pos0 = jnp.asarray(np.asarray(pos0))
        n_atoms = int(pos0.shape[0])

        # deterministic device randomness from the dataset seed (the
        # reference draws unseeded through OpenMM)
        key = jax.random.PRNGKey(int(self.rng.integers(0, 2**31 - 1)))
        k_therm, k_md = jax.random.split(key)

        # minimize -> thermalize -> Langevin MD (reference simulated.py:114-126)
        pos_min = minimize_fire(pos0, energy, n_steps=int(minimize_steps),
                                box=box_j)
        vel0 = thermalize(k_therm, n_atoms, kBT, dtype=pos_min.dtype)
        frames, _ = simulate(
            k_md, pos_min, vel0, energy, n_steps=int(n_iter),
            interval=int(interval), dt=dt_red, friction=friction_red,
            kBT=kBT, box=box_j)

        steps = np.asarray(frames["step"])
        pos_frames = np.asarray(frames["pos"], np.float64)
        vel_frames = np.asarray(frames["vel"], np.float64)
        pe = np.asarray(frames["pe"], np.float64)
        kBT_inst = np.asarray(frames["kBT_inst"], np.float64)

        # StateDataReporter-parity CSV log (reference simulated.py:128-129):
        # step, potential energy (kJ/mol), instantaneous temperature (K)
        if log:
            lines = ['#"Step","Potential Energy (kJ/mole)","Temperature (K)"']
            for s, e, t in zip(steps, pe, kBT_inst):
                lines.append(
                    f"{int(s)},{e * eps / 1000.0},{cv.lj_to_kelvin(t)}")
            _ensure_parent(log)
            with open(log, "w") as f:
                f.write("\n".join(lines) + "\n")
            print("\n".join(lines), flush=True)

        report_from = int(discard)
        if report_from == -1:   # reference convention (lig/simulated)
            report_from = int(interval)
        keep = steps >= report_from

        if traj:
            _ensure_parent(traj)
            write_pdb_frames(
                traj, z, [cv.lj_to_dist(p, "ang") for p in pos_frames[keep]],
                cv.lj_to_dist(box_red, "ang"))

        latent = self.latent_features and node_nf is not None
        for s, pos_r, vel_r in zip(steps[keep], pos_frames[keep],
                                   vel_frames[keep]):
            h = g = None
            if latent:
                std = 1.0 / np.sqrt(kBT)
                h = self.rng.normal(0.0, std, (n_atoms, int(node_nf)))
                g = self.rng.normal(0.0, std, (n_atoms, int(node_nf)))
            self.append(
                z=z,
                pos=cv.lj_to_dist(pos_r, dist_unit),
                vel=cv.lj_to_vel_md(vel_r, dist_unit, time_unit),
                label=f"Simulated dataset: {name} Frame: {int(s)}",
                h=h, g=g)
