from .tof import TimeOfFlight1D, TimeOfFlight2D

__all__ = ["TimeOfFlight1D", "TimeOfFlight2D"]
