"""Linear elliptic (Poisson) solves with Dirichlet lifting.

The reference solves an initial Poisson problem with MUMPS before the first
coupled step (`examples/glow_discharge/fedm-gd.py:288-300`,
`fedm/functions.py:1154-1161`). The TPU-native equivalent: a symmetrically
masked, Jacobi-preconditioned CG on the matrix-free stiffness operator.

The masked operator  Op(v) = P_bc v + P_free A P_free v  is SPD whenever A
is, so CG applies; Dirichlet data enters through the standard lifting
u = g + z with z = 0 on the boundary.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..fem.assembly import CellBatch
from .linear import cg

Array = jax.Array


def stiffness_diagonal(batch: CellBatch, coeff_q: Optional[Array] = None) -> Array:
    """Diagonal of the (coefficient-weighted) stiffness matrix."""
    g = batch.grads  # [n_cells, gq, n_local, dim]
    g2 = jnp.sum(g * g, axis=-1)  # [n_cells, gq, n_local]
    scale = batch.scale
    if coeff_q is not None:
        scale = scale * coeff_q
    if g2.shape[1] == 1:
        contrib = scale.sum(axis=1)[:, None] * g2[:, 0]  # [n_cells, n_local]
    else:
        contrib = jnp.einsum("cq,cqa->ca", scale, g2)
    return batch.scatter(contrib)


def solve_poisson(
    batch: CellBatch,
    f_q: Array,
    mask: Array,
    g: Array,
    coeff_q: Optional[Array] = None,
    x0: Optional[Array] = None,
    tol: float = 1e-10,
    maxiter: int = 2000,
    precond: Optional[callable] = None,
):
    """Solve ∫ c ∇u·∇v dx = ∫ f v dx with u = g on `mask` dofs.

    f_q, coeff_q: values at quadrature points [n_cells, n_q].
    mask, g: [n_dofs] boolean / values.
    precond: optional r -> ~A^-1 r (e.g. a multigrid V-cycle or z-line
    solve); default Jacobi. On anisotropic corridor meshes plain Jacobi-CG
    can exhaust maxiter, so callers with an elliptic preconditioner should
    pass it.
    Returns (u, relres, iters).
    """

    def A(x):
        G = batch.grad(batch.gather(x))  # [n_cells, n_q, dim]
        if coeff_q is not None:
            G = G * coeff_q[:, :, None]
        return batch.scatter(batch.stiffness(G))

    def op(v):
        v_free = jnp.where(mask, 0.0, v)
        return jnp.where(mask, v, A(v_free))

    g_ext = jnp.where(mask, g, 0.0)
    b = batch.scatter(batch.mass(f_q))
    rhs = jnp.where(mask, 0.0, b - A(g_ext))

    diag = stiffness_diagonal(batch, coeff_q)
    diag = jnp.where(mask | (diag == 0), 1.0, diag)

    z0 = None
    if x0 is not None:
        z0 = jnp.where(mask, 0.0, x0 - g_ext)
    M = precond if precond is not None else (lambda r: r / diag)
    z, relres, iters = cg(op, rhs, x0=z0, precond=M,
                          tol=tol, maxiter=maxiter)
    return g_ext + jnp.where(mask, 0.0, z), relres, iters
