"""Geometric multigrid: mesh-independent preconditioned-CG convergence."""

import numpy as np
import jax.numpy as jnp
import pytest

from fedm_tpu.mesh import rectangle_mesh
from fedm_tpu.fem import FunctionSpace
from fedm_tpu.fem.interpolation import p1_transfer, prolong, restrict
from fedm_tpu.solvers.multigrid import GeometricMultigrid
from fedm_tpu.solvers.linear import cg


def _hierarchy(n, axisym=False):
    spaces, masks = [], []
    k = n
    while k >= 4:
        s = FunctionSpace(rectangle_mesh((0, 0), (1, 1), k, k), 1)
        c = s.dof_coords
        spaces.append(s)
        masks.append(np.isclose(c[:, 1], 0) | np.isclose(c[:, 1], 1))
        k //= 2
    return spaces, masks


def test_transfer_reproduces_linears():
    coarse = FunctionSpace(rectangle_mesh((0, 0), (1, 1), 4, 4), 1)
    fine = FunctionSpace(rectangle_mesh((0, 0), (1, 1), 16, 16), 1)
    idx, w = p1_transfer(coarse, fine)
    # P1 interpolation is exact for linear fields
    f = lambda c: 2.0 * c[:, 0] - 3.0 * c[:, 1] + 0.5
    u_c = jnp.asarray(f(coarse.dof_coords))
    np.testing.assert_allclose(np.asarray(prolong(idx, w, u_c)),
                               f(fine.dof_coords), atol=1e-12)
    # restriction is the exact transpose of prolongation
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(coarse.n_dofs))
    y = jnp.asarray(rng.standard_normal(fine.n_dofs))
    lhs = float(jnp.vdot(prolong(idx, w, x), y))
    rhs = float(jnp.vdot(x, restrict(idx, w, y, coarse.n_dofs)))
    assert lhs == pytest.approx(rhs, rel=1e-12)


@pytest.mark.parametrize("n", [16, 32, 64])
def test_mg_cg_iterations_mesh_independent(n):
    spaces, masks = _hierarchy(n)
    mg = GeometricMultigrid(spaces, masks, quad_degree=2)
    lev = mg.levels[0]
    rng = np.random.default_rng(1)
    b = jnp.where(lev.mask, 0.0,
                  jnp.asarray(rng.standard_normal(spaces[0].n_dofs)))
    x, relres, iters = cg(lev.A, b, precond=mg.precond, tol=1e-10,
                          maxiter=100)
    assert float(relres) < 1e-9
    assert int(iters) <= 12  # mesh-independent (Jacobi needs O(n))
