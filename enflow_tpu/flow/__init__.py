from .integrators import (FlowConfig, init_flow, forward, reverse,
                          forward_core, reverse_core)
from .loss import alchemical_nll, alchemical_log_px
