from . import targets
from .forcefield import ForceField, ff_energy, forcefield_target
from .mcmc import (hmc_kernel, tempered_hmc_kernel, run_hmc, mala_kernel,
                   dual_averaging_warmup)
from .nuts import nuts_kernel, run_nuts
from .remc import remc, tile_replicas, REMCResult
from .mbar import mbar, mbar_from_remc, MBARResult
from .smc import (
    ess_from_log_weights,
    systematic_resample,
    smc,
    ais,
)
from .ti import thermodynamic_integration, geometric_grid, TIResult
