"""Generic molecular force-field Boltzmann targets (bonded + nonbonded).

The reference obtains real-molecule energies through OpenMM/OpenFF force
fields (reference ``enflow/data/lig.py:40-57``), which are unavailable here
and unnecessary at runtime: a classical force field is a short sum of closed
forms. This module evaluates

    E = sum_bonds    k_b (r - r0)^2
      + sum_angles   k_a (theta - theta0)^2
      + sum_torsions k_t (1 + cos(n*phi - phase))
      + sum_pairs    lj_scale * 4 eps_ij ((s_ij/r)^12 - (s_ij/r)^6)
                   + q_scale * ke q_i q_j / r

with Lorentz-Berthelot combining, an exclusion/scale matrix built from the
bond graph (1-2 and 1-3 excluded, 1-4 scaled — AMBER conventions by
default), and stable arctan2-based angle/dihedral geometry. Parameters are
plain arrays loadable from a JSON/YAML dict (``ForceField.from_dict``), so
alanine-dipeptide-class targets (BASELINE config 4) are a parameter file,
not a dependency.

Energy is a pure JAX function of ``[N, 3]`` positions — differentiable,
``vmap``/``jit`` friendly, and usable directly as an HMC/NUTS/SMC target or
as an MD potential for the ``sim`` engine.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .targets import Target


@partial(jax.tree_util.register_dataclass,
         data_fields=("bond_idx", "bond_k", "bond_r0", "angle_idx", "angle_k",
                      "angle_t0", "torsion_idx", "torsion_k", "torsion_n",
                      "torsion_phase", "sigma", "epsilon", "charge",
                      "lj_scale", "q_scale"),
         meta_fields=("ke",))
@dataclasses.dataclass(frozen=True)
class ForceField:
    bond_idx: jax.Array      # [NB, 2] int32
    bond_k: jax.Array        # [NB]
    bond_r0: jax.Array       # [NB]
    angle_idx: jax.Array     # [NA, 3]
    angle_k: jax.Array       # [NA]
    angle_t0: jax.Array      # [NA]
    torsion_idx: jax.Array   # [NT, 4]
    torsion_k: jax.Array     # [NT]
    torsion_n: jax.Array     # [NT]
    torsion_phase: jax.Array # [NT]
    sigma: jax.Array         # [N]
    epsilon: jax.Array       # [N]
    charge: jax.Array        # [N]
    lj_scale: jax.Array      # [N, N] pair scale (0 excluded, 0.5 1-4, 1 else)
    q_scale: jax.Array       # [N, N]
    ke: float = 1.0          # Coulomb constant in the working unit system

    @property
    def n_atoms(self) -> int:
        return self.sigma.shape[0]

    @staticmethod
    def from_dict(d, dtype=jnp.float64, lj_14: float = 0.5,
                  q_14: float = 1.0 / 1.2, ke: float = 1.0) -> "ForceField":
        """Build from a plain dict (e.g. parsed YAML/JSON) with keys
        ``bonds: [[i, j, k, r0], ...]``, ``angles: [[i, j, k, kθ, θ0], ...]``,
        ``torsions: [[i, j, k, l, kφ, n, phase], ...]``,
        ``atoms: [[sigma, epsilon, charge], ...]``. The exclusion/scale
        matrices are derived from the bond graph (AMBER 1-4 factors by
        default)."""
        bonds = np.asarray(d.get("bonds", np.zeros((0, 4))), np.float64)
        angles = np.asarray(d.get("angles", np.zeros((0, 5))), np.float64)
        torsions = np.asarray(d.get("torsions", np.zeros((0, 7))), np.float64)
        atoms = np.asarray(d["atoms"], np.float64)
        n = atoms.shape[0]

        # bond graph -> 1-2/1-3/1-4 classification
        adj = [[] for _ in range(n)]
        for b in bonds[:, :2].astype(int):
            adj[b[0]].append(b[1])
            adj[b[1]].append(b[0])
        lj_s = np.ones((n, n))
        q_s = np.ones((n, n))
        np.fill_diagonal(lj_s, 0.0)
        np.fill_diagonal(q_s, 0.0)
        for i in range(n):
            for j in adj[i]:                       # 1-2
                lj_s[i, j] = q_s[i, j] = 0.0
                for k in adj[j]:                   # 1-3
                    if k != i:
                        lj_s[i, k] = q_s[i, k] = 0.0
        for i in range(n):
            for j in adj[i]:
                for k in adj[j]:
                    if k == i:
                        continue
                    for l in adj[k]:               # 1-4 (unless closer)
                        if l in (i, j):
                            continue
                        if lj_s[i, l] == 1.0:
                            lj_s[i, l] = lj_14
                            q_s[i, l] = q_14

        def arr(x, dt=dtype):
            return jnp.asarray(x, dt)

        return ForceField(
            bond_idx=arr(bonds[:, :2], jnp.int32),
            bond_k=arr(bonds[:, 2]), bond_r0=arr(bonds[:, 3]),
            angle_idx=arr(angles[:, :3], jnp.int32),
            angle_k=arr(angles[:, 3]), angle_t0=arr(angles[:, 4]),
            torsion_idx=arr(torsions[:, :4], jnp.int32),
            torsion_k=arr(torsions[:, 4]), torsion_n=arr(torsions[:, 5]),
            torsion_phase=arr(torsions[:, 6]),
            sigma=arr(atoms[:, 0]), epsilon=arr(atoms[:, 1]),
            charge=arr(atoms[:, 2]),
            lj_scale=arr(lj_s), q_scale=arr(q_s), ke=float(ke))


def _angle(a, b, c):
    """Stable angle at b for points a-b-c."""
    u = a - b
    v = c - b
    cross = jnp.cross(u, v)
    return jnp.arctan2(jnp.linalg.norm(cross), u @ v)


def _dihedral(a, b, c, d):
    """Stable torsion angle for a-b-c-d (IUPAC sign convention)."""
    b1 = b - a
    b2 = c - b
    b3 = d - c
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    m1 = jnp.cross(n1, b2 / jnp.linalg.norm(b2))
    return jnp.arctan2(m1 @ n2, n1 @ n2)


def ff_energy(ff: ForceField, pos):
    """Total force-field energy of one configuration ``pos [N, 3]``."""
    e = jnp.zeros((), pos.dtype)

    if ff.bond_idx.shape[0]:
        ri = pos[ff.bond_idx[:, 0]]
        rj = pos[ff.bond_idx[:, 1]]
        r = jnp.linalg.norm(ri - rj + 1e-30, axis=1)
        e = e + (ff.bond_k * (r - ff.bond_r0) ** 2).sum()

    if ff.angle_idx.shape[0]:
        th = jax.vmap(_angle)(pos[ff.angle_idx[:, 0]],
                              pos[ff.angle_idx[:, 1]],
                              pos[ff.angle_idx[:, 2]])
        e = e + (ff.angle_k * (th - ff.angle_t0) ** 2).sum()

    if ff.torsion_idx.shape[0]:
        phi = jax.vmap(_dihedral)(pos[ff.torsion_idx[:, 0]],
                                  pos[ff.torsion_idx[:, 1]],
                                  pos[ff.torsion_idx[:, 2]],
                                  pos[ff.torsion_idx[:, 3]])
        e = e + (ff.torsion_k * (1.0 + jnp.cos(ff.torsion_n * phi
                                               - ff.torsion_phase))).sum()

    # nonbonded: LJ (Lorentz-Berthelot) + Coulomb with pair scales
    n = ff.n_atoms
    diff = pos[:, None, :] - pos[None, :, :]
    d2 = (diff * diff).sum(-1)
    iu = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
    r = jnp.sqrt(jnp.where(iu, d2, 1.0))
    sig = 0.5 * (ff.sigma[:, None] + ff.sigma[None, :])
    eps = jnp.sqrt(ff.epsilon[:, None] * ff.epsilon[None, :])
    s6 = (sig / r) ** 6
    e_lj = ff.lj_scale * 4.0 * eps * (s6 * s6 - s6)
    e_q = ff.q_scale * ff.ke * ff.charge[:, None] * ff.charge[None, :] / r
    e = e + jnp.where(iu, e_lj + e_q, 0.0).sum()
    return e


def forcefield_target(ff: ForceField, kBT: float = 1.0,
                      e_cap: float | None = None) -> Target:
    """Boltzmann target ``log p(x) = -E_ff(x)/kBT``.

    ``e_cap`` log-caps extreme energies (``targets.regularize_energy``) — a
    flow-VI training aid for the r -> 0 LJ/Coulomb wall; accepts a traced
    scalar for annealing, like the cluster targets.
    """
    from .targets import regularize_energy

    def log_prob(x, e_cap=e_cap):
        u = ff_energy(ff, x)
        if e_cap is not None:
            u = regularize_energy(u, e_cap)
        return -u / kBT

    return Target(log_prob=log_prob, dim=(ff.n_atoms, 3), name="forcefield")


def dihedral_angles(ff: ForceField, pos):
    """Torsion angles ``[NT]`` of a configuration (free-energy observables,
    e.g. alanine dipeptide phi/psi)."""
    return jax.vmap(_dihedral)(pos[ff.torsion_idx[:, 0]],
                               pos[ff.torsion_idx[:, 1]],
                               pos[ff.torsion_idx[:, 2]],
                               pos[ff.torsion_idx[:, 3]])


def zmatrix_to_cartesian(entries) -> np.ndarray:
    """Build Cartesian coordinates from internal coordinates (NeRF).

    ``entries`` is a list of ``[i, j, k, l, r, theta, phi]`` rows placing atom
    ``i`` at distance ``r`` from ``j``, bond angle ``theta`` (radians) with
    ``k``, and dihedral ``phi`` about ``j-k`` relative to ``l``. The first
    three rows may use ``-1`` for missing references (first atom at the
    origin, second along +x, third in the xy-plane). Atom indices are free —
    rows must only reference already-placed atoms — so a parameter file can
    carry its starting geometry as a ``zmatrix`` block (see
    ``example/ala2_ff.yaml``).
    """
    n = max(int(e[0]) for e in entries) + 1
    pos = np.zeros((n, 3))
    for e in entries:
        i, j, k, l = (int(v) for v in e[:4])
        r, theta, phi = (float(v) for v in e[4:7])
        if j < 0:                                     # first atom: origin
            pos[i] = 0.0
        elif k < 0:                                   # second: along +x
            pos[i] = pos[j] + [r, 0.0, 0.0]
        else:
            # NeRF: bond i-j, angle i-j-k, dihedral i-j-k-l
            ab = pos[k] - (pos[l] if l >= 0
                           else pos[k] + np.array([0.0, 0.0, 1.0]))
            bc = pos[j] - pos[k]
            bc_u = bc / np.linalg.norm(bc)
            n1 = np.cross(ab, bc)
            if np.linalg.norm(n1) < 1e-10:            # colinear reference
                n1 = np.cross(bc_u, [0.0, 0.0, 1.0])
                if np.linalg.norm(n1) < 1e-10:
                    n1 = np.cross(bc_u, [0.0, 1.0, 0.0])
            n1 = n1 / np.linalg.norm(n1)
            m1 = np.cross(n1, bc_u)
            # sign of the n1 term chosen so that the requested phi equals
            # the measured _dihedral(i, j, k, l) (IUPAC convention)
            d2 = np.array([-r * np.cos(theta),
                           r * np.sin(theta) * np.cos(phi),
                           -r * np.sin(theta) * np.sin(phi)])
            pos[i] = pos[j] + d2[0] * bc_u + d2[1] * m1 + d2[2] * n1
    return pos


def free_energy_profile(angles, kBT: float, bins: int = 36,
                        weights=None):
    """1-D dihedral free-energy profile ``F = -kBT log p`` over [-pi, pi].

    ``angles [S]`` sampled torsion values (e.g. phi across an MCMC/SMC
    ensemble); optional importance ``weights [S]``. Returns ``(centers [bins],
    F [bins])`` with F shifted to min 0; empty bins are +inf.
    """
    angles = np.asarray(angles)
    hist, edges = np.histogram(angles, bins=bins, range=(-np.pi, np.pi),
                               weights=None if weights is None
                               else np.asarray(weights), density=True)
    centers = 0.5 * (edges[:-1] + edges[1:])
    with np.errstate(divide="ignore"):
        F = -float(kBT) * np.log(hist)
    return centers, F - F[np.isfinite(F)].min()
