from .linear import cg, bicgstab
from .newton import newton_krylov, NewtonConfig

__all__ = ["cg", "bicgstab", "newton_krylov", "NewtonConfig"]
