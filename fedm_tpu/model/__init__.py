from .forms import (
    bdf2_history_part,
    drift_diffusion_flux,
    balance_equation_contrib,
    poisson_contrib,
)
from .system import CoupledSystem, StepParams

__all__ = [
    "bdf2_history_part",
    "drift_diffusion_flux",
    "balance_equation_contrib",
    "poisson_contrib",
    "CoupledSystem",
    "StepParams",
]
