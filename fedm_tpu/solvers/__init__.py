from .linear import cg, bicgstab, gmres
from .newton import newton_krylov, NewtonConfig

__all__ = ["cg", "bicgstab", "gmres", "newton_krylov", "NewtonConfig"]
