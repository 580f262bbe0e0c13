from .exprs import compile_expression
from .interp import lut_interp

__all__ = ["compile_expression", "lut_interp"]
