from .potentials import softened_lj_energy, lj_energy
from .integrate import (
    langevin_middle_step,
    simulate,
    thermalize,
    minimize_fire,
    instantaneous_temperature,
)
