from .integrators import FlowConfig, init_flow, forward, reverse
from .loss import alchemical_nll
