"""Manufactured-solution verification of the FE core + CG solver.

Mirrors the role of the reference's initial Poisson sub-stack
(`examples/glow_discharge/fedm-gd.py:288-300`) as the first numerics gate
(SURVEY.md section 7, build stage 2).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fedm_tpu.mesh import rectangle_mesh, interval_mesh
from fedm_tpu.fem import FunctionSpace, CellBatch, interpolate
from fedm_tpu.solvers.elliptic import solve_poisson


def _solve_square(n, degree=1):
    mesh = rectangle_mesh((0, 0), (1, 1), n, n, "right")
    space = FunctionSpace(mesh, degree)
    batch = CellBatch(space, quad_degree=4)
    exact = lambda x: np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
    xq = np.asarray(batch.x_q)
    f_q = 2 * np.pi**2 * np.sin(np.pi * xq[..., 0]) * np.sin(np.pi * xq[..., 1])
    bdofs = space.boundary_dofs()
    mask = np.zeros(space.n_dofs, dtype=bool)
    mask[bdofs] = True
    u, relres, iters = solve_poisson(
        batch, jnp.asarray(f_q), jnp.asarray(mask), jnp.zeros(space.n_dofs)
    )
    assert relres < 1e-9
    err = np.asarray(u) - exact(space.dof_coords)
    return np.sqrt(np.mean(err**2))


def test_poisson_p1_converges_second_order():
    e1 = _solve_square(8)
    e2 = _solve_square(16)
    rate = np.log2(e1 / e2)
    assert e2 < 5e-3
    assert 1.8 < rate < 2.3


def test_poisson_p2_small_error():
    e = _solve_square(8, degree=2)
    assert e < 2e-4


def test_poisson_1d_interval_p2_exactness():
    # -u'' = 2 with u(0)=u(1)=0 -> u = x(1-x), exactly representable in P2
    mesh = interval_mesh(7, 0.0, 1.0)
    space = FunctionSpace(mesh, 2)
    batch = CellBatch(space, quad_degree=4)
    f_q = jnp.full((batch.scale.shape[0], batch.n_q), 2.0)
    mask = np.zeros(space.n_dofs, dtype=bool)
    mask[space.boundary_dofs()] = True
    u, relres, _ = solve_poisson(batch, f_q, jnp.asarray(mask),
                                 jnp.zeros(space.n_dofs))
    x = space.dof_coords[:, 0]
    np.testing.assert_allclose(np.asarray(u), x * (1 - x), atol=1e-10)


def test_axisymmetric_poisson_weight():
    # On an annulus-free axisymmetric disc r in [0,1], z in [0,1]:
    # with u = 1 - r^2, (1/r)(r u_r)_r = -4, so -Lap u = 4.
    mesh = rectangle_mesh((0, 0), (1, 1), 12, 12, "right")
    space = FunctionSpace(mesh, 1)
    batch = CellBatch(space, quad_degree=4, axisymmetric=True)
    f_q = jnp.full((batch.scale.shape[0], batch.n_q), 4.0)
    coords = space.dof_coords
    # Dirichlet on r=1 and z=0, z=1 faces with exact values (natural BC du/dr=0
    # holds at the axis r=0)
    mask = np.isclose(coords[:, 0], 1.0) | np.isclose(coords[:, 1], 0.0) \
        | np.isclose(coords[:, 1], 1.0)
    g = 1.0 - coords[:, 0] ** 2
    u, relres, _ = solve_poisson(batch, f_q, jnp.asarray(mask), jnp.asarray(g))
    err = np.asarray(u) - (1 - coords[:, 0] ** 2)
    assert np.sqrt(np.mean(err**2)) < 2e-3


def test_interpolate_scalar_and_callable():
    mesh = interval_mesh(4, 0, 1)
    space = FunctionSpace(mesh, 1)
    v = interpolate(2.5, space)
    assert v.shape == (5,)
    assert float(v[0]) == 2.5
    w = interpolate(lambda x: x[:, 0] ** 2, space)
    np.testing.assert_allclose(np.asarray(w), space.dof_coords[:, 0] ** 2)
