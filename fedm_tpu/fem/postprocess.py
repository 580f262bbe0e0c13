"""Post-processing helpers: facet-normal projection and boundary-gradient
recovery.

Replacements for the reference's `Normal_vector`
(`/root/reference/fedm/functions.py:1133-1151`: L2 projection of the facet
normal onto CG1, used for flux post-processing) and `BoundaryGradient`
(`fedm/functions.py:1164-1208`: accurate boundary flux/E-field extraction
via the consistency-term trick).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .assembly import CellBatch, FacetBatch
from .space import FunctionSpace
from ..solvers.linear import cg

Array = jax.Array


def normal_vector(space: FunctionSpace, quad_degree: int = 4,
                  axisymmetric: bool = False) -> Array:
    """Project the boundary facet normal onto the P1/P2 nodal space:
    solve the boundary mass system M_b n = b with M_b = ∮ φ_a φ_b ds,
    b = ∮ n φ_a ds (reference `Normal_vector`; the reference regularises
    interior rows with `ident_zeros`, here they solve to 0 and are masked).
    Returns [n_dofs, dim] nodal normals (zero off the boundary)."""
    fb = FacetBatch(space, markers=None, quad_degree=quad_degree,
                    axisymmetric=axisymmetric)
    dim = space.mesh.dim

    def Mb(x):  # boundary mass matvec per component
        return fb.scatter(fb.mass(fb.value(fb.gather(x))))

    ones = jnp.ones((fb.scale.shape[0], fb.n_q), fb.dtype)
    lump = fb.scatter(fb.mass(ones))
    on_boundary = lump > 0
    diag = jnp.where(on_boundary, lump, 1.0)

    out = []
    for d in range(dim):
        b = fb.scatter(fb.mass(jnp.broadcast_to(
            fb.normal[:, None, d], (fb.scale.shape[0], fb.n_q))))

        def op(x):
            return jnp.where(on_boundary, Mb(jnp.where(on_boundary, x, 0.0)),
                             x)

        x, _, _ = cg(op, jnp.where(on_boundary, b, 0.0),
                     precond=lambda r: r / diag, tol=1e-10, maxiter=500)
        out.append(jnp.where(on_boundary, x, 0.0))
    return jnp.stack(out, axis=-1)


def boundary_gradient(
    batch: CellBatch,
    space: FunctionSpace,
    var: Array,
    source_q: Array,
    extract_markers,
    epsilon: float = 8.854187817e-12,
    quad_degree: int = 4,
    axisymmetric: bool = False,
    tol: float = 1e-10,
) -> Array:
    """Accurate normal boundary flux (e.g. the electric field at an
    electrode) via the consistency-term trick (reference
    `BoundaryGradient`, after D. Kamensky): on the extraction boundary,
    solve  ∮ E v ds = ∮ eps ∂n(var) v ds  with the surface flux replaced by
    the volume residual  eps ∫ ∇var·∇v dx - ∫ f v dx  restricted to test
    functions supported at the boundary — which converges at the rate of
    the volume discretisation rather than of the raw gradient trace.

    Returns nodal values on the extraction boundary (zero elsewhere).
    """
    # volume residual of the Poisson equation (the consistency term)
    res = epsilon * batch.scatter(batch.stiffness(
        batch.grad(batch.gather(var)))) - batch.scatter(batch.mass(source_q))

    fb = FacetBatch(space, markers=extract_markers, quad_degree=quad_degree,
                    axisymmetric=axisymmetric)
    ones = jnp.ones((fb.scale.shape[0], fb.n_q), fb.dtype)
    lump = fb.scatter(fb.mass(ones))
    on_b = lump > 0
    diag = jnp.where(on_b, lump, 1.0)

    def Mb(x):
        return fb.scatter(fb.mass(fb.value(fb.gather(x))))

    def op(x):
        return jnp.where(on_b, Mb(jnp.where(on_b, x, 0.0)), x)

    # weak-flux identity: for boundary-supported v, res(v) = eps ∮ ∂n(var) v,
    # so the recovered normal field E = -∂n(var) solves  M_b E = -res/eps
    rhs = jnp.where(on_b, -res / epsilon, 0.0)
    E, _, _ = cg(op, rhs, precond=lambda r: r / diag, tol=tol, maxiter=1000)
    return jnp.where(on_b, E, 0.0)
