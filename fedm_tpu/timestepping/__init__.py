from .controllers import adaptive_timestep, adaptive_timestep_PI34, adaptive_timestep_H211b
from .driver import AdaptiveDriver, TimeState, step_error_norm

__all__ = [
    "adaptive_timestep",
    "adaptive_timestep_PI34",
    "adaptive_timestep_H211b",
    "AdaptiveDriver",
    "TimeState",
    "step_error_norm",
]
