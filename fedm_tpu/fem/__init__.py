from .elements import tabulate, cell_quadrature, facet_quadrature
from .space import FunctionSpace
from .assembly import CellBatch, FacetBatch, interpolate, project, vector_l2_norm
from .dirichlet import DirichletBC, combine_bcs

__all__ = [
    "tabulate",
    "cell_quadrature",
    "facet_quadrature",
    "FunctionSpace",
    "CellBatch",
    "FacetBatch",
    "interpolate",
    "project",
    "vector_l2_norm",
    "DirichletBC",
    "combine_bcs",
]
