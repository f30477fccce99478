from .potentials import softened_lj_energy, lj_energy
from .integrate import (
    langevin_middle_step,
    velocity_verlet_step,
    simulate,
    simulate_nve,
    thermalize,
    minimize_fire,
    instantaneous_temperature,
)
from .analysis import radial_distribution
