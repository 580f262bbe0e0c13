from .tof import TimeOfFlight1D, TimeOfFlight2D
from .generic import PlasmaConfig, PlasmaModel

__all__ = ["TimeOfFlight1D", "TimeOfFlight2D", "PlasmaConfig",
           "PlasmaModel"]
