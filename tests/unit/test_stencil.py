"""StencilOp (solvers/stencil.py): exactness of the 9-probe stencil
extraction vs the unstructured masked Laplacian matvec, on uniform and
graded structured meshes, plus the line-coefficient slicing used by the
multigrid z-line smoother."""

import numpy as np
import jax.numpy as jnp

from fedm_tpu.fem import CellBatch, FunctionSpace
from fedm_tpu.mesh import rectangle_mesh
from fedm_tpu.solvers.stencil import StencilOp


def _masked_laplacian(nx=12, nz=20, aspect=8.0, axisymmetric=False):
    mesh = rectangle_mesh((0, 0), (1.0, nz / (nx * aspect)), nx, nz, "right")
    space = FunctionSpace(mesh, 1)
    batch = CellBatch(space, quad_degree=2, axisymmetric=axisymmetric)
    c = space.dof_coords
    mask = jnp.asarray(np.isclose(c[:, 1], 0.0)
                       | np.isclose(c[:, 1], c[:, 1].max()))

    def A(x):
        x_in = jnp.where(mask, 0.0, x)
        Ax = batch.scatter(batch.stiffness(batch.grad(batch.gather(x_in))))
        return jnp.where(mask, x, Ax)

    ix, iz = np.meshgrid(np.arange(nx + 1), np.arange(nz + 1), indexing="ij")
    grid = iz * (nx + 1) + ix
    return A, grid, space.n_dofs


def test_stencil_matches_operator():
    A, grid, n = _masked_laplacian()
    st = StencilOp(A, grid, n)  # validate=True asserts internally
    rng = np.random.default_rng(1)
    for _ in range(3):
        x = jnp.asarray(rng.standard_normal(n))
        np.testing.assert_allclose(np.asarray(st(x)), np.asarray(A(x)),
                                   rtol=1e-10, atol=1e-10)


def test_stencil_axisymmetric():
    A, grid, n = _masked_laplacian(axisymmetric=True)
    st = StencilOp(A, grid, n)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(n))
    np.testing.assert_allclose(np.asarray(st(x)), np.asarray(A(x)),
                               rtol=1e-10, atol=1e-12)


def test_line_coeffs_match_zline_probes():
    from fedm_tpu.solvers.linesmoother import (ZLineSmoother,
                                               tridiag_solve_pcr)

    A, grid, n = _masked_laplacian()
    st = StencilOp(A, grid, n)
    sm = ZLineSmoother(A, grid, n, n_iter=1)
    a, b, c = st.line_coeffs()
    np.testing.assert_allclose(np.asarray(a), np.asarray(sm._a), atol=1e-12)
    np.testing.assert_allclose(np.asarray(b), np.asarray(sm._b), atol=1e-12)
    np.testing.assert_allclose(np.asarray(c), np.asarray(sm._c), atol=1e-12)
    # one line solve through each path agrees
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.standard_normal(n))
    x_sm = np.asarray(sm.solve(r))
    x_st = np.asarray(st.to_flat(tridiag_solve_pcr(a, b, c, st.to_grid(r))))
    np.testing.assert_allclose(x_st, x_sm, rtol=1e-9, atol=1e-9)


def test_mg_with_stencil_ops_converges_as_before():
    from fedm_tpu.fem import FunctionSpace
    from fedm_tpu.mesh import rectangle_mesh
    from fedm_tpu.solvers.linear import cg
    from fedm_tpu.solvers.multigrid import GeometricMultigrid

    nx, nz, aspect = 16, 64, 40.0
    spaces, masks, grids = [], [], []
    for lv in range(3):
        f = 2 ** lv
        mesh = rectangle_mesh((0, 0), (1.0, nz / (nx * aspect)),
                              nx // f, nz // f, "right")
        sp = FunctionSpace(mesh, 1)
        spaces.append(sp)
        c = sp.dof_coords
        masks.append(np.isclose(c[:, 1], 0.0)
                     | np.isclose(c[:, 1], c[:, 1].max()))
        ix, iz = np.meshgrid(np.arange(nx // f + 1), np.arange(nz // f + 1),
                             indexing="ij")
        grids.append(iz * (nx // f + 1) + ix)

    mg = GeometricMultigrid(spaces, masks, line_grids=grids)
    # the V-cycle ops on structured levels must be StencilOps now
    from fedm_tpu.solvers.stencil import StencilOp
    assert isinstance(mg.ops[0], StencilOp)
    lev = mg.levels[0]
    rng = np.random.default_rng(4)
    b = jnp.asarray(rng.standard_normal(lev.n)) * (~lev.mask)
    _, res, it = cg(lev.A, b, precond=mg.precond, tol=1e-8, maxiter=400)
    assert float(res) < 1e-7
    assert int(it) <= 25
