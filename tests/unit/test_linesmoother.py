"""z-line relaxation (solvers/linesmoother.py): exactness of the batched
Thomas solve, correctness of the 9-probe stencil extraction, and the
anisotropy robustness that point methods lack (the round-1 corridor-mesh
failure mode, docs/STREAMER_STUDY.md conclusion 3)."""

import numpy as np
import jax
import jax.numpy as jnp

from fedm_tpu.fem import CellBatch, FunctionSpace
from fedm_tpu.mesh import Mesh, rectangle_mesh
from fedm_tpu.solvers.linear import cg
from fedm_tpu.solvers.linesmoother import ZLineSmoother, tridiag_solve_batched


def test_tridiag_solve_exact():
    rng = np.random.default_rng(0)
    n_lines, n = 5, 40
    a = rng.standard_normal((n_lines, n)) * 0.3
    c = rng.standard_normal((n_lines, n)) * 0.3
    b = 2.0 + np.abs(rng.standard_normal((n_lines, n)))  # diag dominant
    a[:, 0] = c[:, -1] = 0.0
    d = rng.standard_normal((n_lines, n))
    x = np.asarray(tridiag_solve_batched(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), jnp.asarray(d)))
    for l in range(n_lines):
        T = np.diag(b[l]) + np.diag(a[l, 1:], -1) + np.diag(c[l, :-1], 1)
        np.testing.assert_allclose(T @ x[l], d[l], atol=1e-10)


def test_pcr_matches_thomas():
    # parallel cyclic reduction (the TPU-native log-depth solver) must
    # reproduce the sequential Thomas solve on diagonally dominant lines,
    # including non-power-of-two lengths
    from fedm_tpu.solvers.linesmoother import tridiag_solve_pcr

    rng = np.random.default_rng(7)
    for n in (1, 2, 3, 17, 64, 101):
        n_lines = 4
        a = rng.standard_normal((n_lines, n)) * 0.4
        c = rng.standard_normal((n_lines, n)) * 0.4
        b = 2.5 + np.abs(rng.standard_normal((n_lines, n)))
        a[:, 0] = c[:, -1] = 0.0
        d = rng.standard_normal((n_lines, n))
        args = [jnp.asarray(v) for v in (a, b, c, d)]
        x_pcr = np.asarray(tridiag_solve_pcr(*args))
        x_th = np.asarray(tridiag_solve_batched(*args))
        np.testing.assert_allclose(x_pcr, x_th, rtol=1e-10, atol=1e-10)


def _aniso_problem(nx=24, nz=96, aspect=40.0):
    """Masked Laplacian on a structured mesh with dz << dx (corridor-like
    anisotropy): returns (A, node_grid, mask, n_dofs, batch)."""
    mesh = rectangle_mesh((0, 0), (1.0, nz / (nx * aspect)), nx, nz, "right")
    space = FunctionSpace(mesh, 1)
    batch = CellBatch(space, quad_degree=2)
    coords = space.dof_coords
    zmax = coords[:, 1].max()
    mask = jnp.asarray(np.isclose(coords[:, 1], 0.0)
                       | np.isclose(coords[:, 1], zmax))

    def A(x):
        x_in = jnp.where(mask, 0.0, x)
        Ax = batch.scatter(batch.stiffness(batch.grad(batch.gather(x_in))))
        return jnp.where(mask, x, Ax)

    ix, iz = np.meshgrid(np.arange(nx + 1), np.arange(nz + 1), indexing="ij")
    node_grid = iz * (nx + 1) + ix
    return A, node_grid, mask, space.n_dofs, batch


def test_stencil_extraction_gives_exact_line_solve_in_1d_limit():
    # on a z-line-decoupled operator the line solve must be EXACT:
    # build the full dense A, zero cross-line couplings, compare
    A, grid, mask, n, _ = _aniso_problem(nx=6, nz=12, aspect=10.0)
    eye = np.eye(n)
    dense = np.stack([np.asarray(A(jnp.asarray(eye[:, k])))
                      for k in range(n)], axis=1)
    # keep only in-line entries (same ix)
    ix_of = np.empty(n, int)
    for ix in range(grid.shape[0]):
        ix_of[grid[ix]] = ix
    inline = dense * (ix_of[:, None] == ix_of[None, :])
    Ail = lambda x: jnp.asarray(inline) @ x
    sm = ZLineSmoother(Ail, grid, n, n_iter=1)
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.standard_normal(n))
    x = np.asarray(sm.solve(r))
    np.testing.assert_allclose(inline @ x, np.asarray(r), atol=1e-9)


def test_zline_beats_point_jacobi_on_anisotropic_poisson():
    A, grid, mask, n, batch = _aniso_problem()
    diag = np.zeros(n)
    eyeI = np.arange(n)
    # jacobi diag via probes (cheap)
    for s in range(3):
        for t in range(3):
            v = np.zeros(n)
            ix, iz = np.meshgrid(np.arange(grid.shape[0]),
                                 np.arange(grid.shape[1]), indexing="ij")
            sel = (ix % 3 == s) & (iz % 3 == t)
            v[grid[sel]] = 1.0
            y = np.asarray(A(jnp.asarray(v)))
            diag[grid[sel]] = y[grid[sel]]
    dj = jnp.asarray(np.where(diag == 0, 1.0, diag))

    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal(n)) * (~mask)

    x_j, res_j, it_j = cg(A, b, precond=lambda r: r / dj,
                          tol=1e-8, maxiter=2000)
    sm = ZLineSmoother(A, grid, n, n_iter=1)
    x_l, res_l, it_l = cg(A, b, precond=sm.solve, tol=1e-8, maxiter=2000)
    assert float(res_l) < 1e-7
    # the line preconditioner must cut iterations dramatically on the
    # aspect-40 mesh (z-coupling dominates -> lines capture it exactly)
    assert int(it_l) * 4 <= int(it_j)
    # same solution up to the Krylov tolerance (scaled by solution size)
    scale = np.abs(np.asarray(x_j)).max()
    np.testing.assert_allclose(np.asarray(x_l), np.asarray(x_j),
                               rtol=1e-4, atol=1e-6 * scale)


def test_mg_with_line_smoother_on_anisotropic_mesh():
    # multigrid with z-line smoothing stays effective where the round-1
    # point-smoothed V-cycle degraded (aspect ~40 corridor)
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

    mg_line = GeometricMultigrid(spaces, masks, line_grids=grids)
    mg_point = GeometricMultigrid(spaces, masks)
    lev = mg_line.levels[0]
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(lev.n)) * (~lev.mask)

    _, res_l, it_l = cg(lev.A, b, precond=mg_line.precond,
                        tol=1e-8, maxiter=400)
    _, res_p, it_p = cg(lev.A, b, precond=mg_point.precond,
                        tol=1e-8, maxiter=400)
    assert float(res_l) < 1e-7
    # line-smoothed MG converges in few iterations AND beats point-smoothed
    assert int(it_l) <= 25
    assert int(it_l) <= int(it_p)
