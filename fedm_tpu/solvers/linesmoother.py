"""z-line (block-tridiagonal) smoothing for anisotropic structured meshes.

Round-1 post-mortem (docs/STREAMER_STUDY.md): on the um-resolution
streamer corridor mesh (dz << dr, aspect ratios 10-100) point-smoothed
multigrid and point-Jacobi preconditioning both degrade — the strong
z-direction coupling (1/dz^2) dominates the operator and point methods
cannot damp z-oscillatory error. The textbook fix is LINE relaxation
along the strong direction: solve each z-line's tridiagonal system
exactly, batched over the r-columns.

TPU shape: the Thomas algorithm is a `lax.scan` along z carrying one
scalar pair per r-column — all columns march in lockstep as [n_x]-lane
vector ops, so the sequential direction costs n_z fused vector steps.

Stencil extraction needs no matrix assembly: for a structured mesh whose
dof stencil lies within (i±1, j±1) ('right'/'left' rectangle meshes), nine
probe matvecs A(e_{ab}) with e colored by (i mod 3, j mod 3) isolate every
stencil entry; we keep the in-line sub/diag/super coefficients. Works
directly on the MASKED operator (Dirichlet rows come out as identity
rows automatically).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def tridiag_solve_batched(a: Array, b: Array, c: Array, d: Array) -> Array:
    """Solve per-line tridiagonal systems, batched over the leading axis.

    a, b, c, d: [n_lines, n_z] (sub-, main-, super-diagonal, rhs);
    a[:, 0] and c[:, -1] are ignored. Returns x [n_lines, n_z].
    """
    n_lines = a.shape[0]
    zero = jnp.zeros((n_lines,), d.dtype)

    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        aj, bj, cj, dj = inp
        denom = bj - aj * cp_prev
        cp = cj / denom
        dp = (dj - aj * dp_prev) / denom
        return (cp, dp), (cp, dp)

    _, (cps, dps) = lax.scan(fwd, (zero, zero),
                             (a.T, b.T, c.T, d.T))

    def bwd(x_next, inp):
        cp, dp = inp
        x = dp - cp * x_next
        return x, x

    _, xs = lax.scan(bwd, zero, (cps, dps), reverse=True)
    return xs.T


class ZLineSmoother:
    """Line-Jacobi preconditioner: exact tridiagonal solves along index-j
    lines of a structured dof grid, with optional Richardson iterations.

    A: the (masked) linear operator on flat [n_dofs] vectors.
    node_grid: [n_i, n_j] int array of dof ids; every dof must appear
        exactly once (structured 'right'/'left' meshes).
    n_iter: total line solves (1 = plain line-Jacobi; >1 adds damped
        Richardson refinement steps x += M(r - A x)).
    """

    def __init__(self, A: Callable, node_grid: np.ndarray, n_dofs: int,
                 n_iter: int = 2, dtype=None):
        node_grid = np.asarray(node_grid)
        assert node_grid.size == n_dofs, (
            "node_grid must enumerate every dof exactly once")
        self.A = A
        self.grid = jnp.asarray(node_grid, jnp.int32)
        self.n_dofs = n_dofs
        self.n_iter = n_iter
        n_i, n_j = node_grid.shape
        dtype = jax.dtypes.canonicalize_dtype(jnp.float64 if dtype is None
                                              else dtype)

        # 9 coloring probes isolate the (di, dj) stencil entries; batched
        # through ONE vmapped call so setup costs one compile per level
        I, J = np.meshgrid(np.arange(n_i), np.arange(n_j), indexing="ij")
        probes = np.zeros((9, n_dofs))
        keys = []
        for ai in range(3):
            for bj in range(3):
                sel = (I % 3 == ai) & (J % 3 == bj)
                probes[len(keys), node_grid[sel]] = 1.0
                keys.append((ai, bj))
        ys = np.asarray(jax.vmap(A)(jnp.asarray(probes, dtype)))
        resp = {k: ys[i] for i, k in enumerate(keys)}
        diag = np.empty((n_i, n_j))
        sub = np.zeros((n_i, n_j))
        sup = np.zeros((n_i, n_j))
        for ai in range(3):
            for bj in range(3):
                y = resp[(ai, bj)][node_grid]  # [n_i, n_j]
                sel_d = (I % 3 == ai) & (J % 3 == bj)
                diag[sel_d] = y[sel_d]
                sel_s = (I % 3 == ai) & ((J - 1) % 3 == bj)  # neighbor j-1
                sub[sel_s] = y[sel_s]
                sel_u = (I % 3 == ai) & ((J + 1) % 3 == bj)  # neighbor j+1
                sup[sel_u] = y[sel_u]
        sub[:, 0] = 0.0
        sup[:, -1] = 0.0
        self._a = jnp.asarray(sub, dtype)
        self._b = jnp.asarray(diag, dtype)
        self._c = jnp.asarray(sup, dtype)

    def _line_solve(self, r: Array) -> Array:
        rg = r[self.grid]
        xg = tridiag_solve_batched(self._a, self._b, self._c,
                                   rg.astype(self._b.dtype))
        return jnp.zeros(self.n_dofs, xg.dtype).at[
            self.grid.reshape(-1)].set(xg.reshape(-1))

    def solve(self, r: Array) -> Array:
        """Approximate A^-1 r (use as the elliptic-block preconditioner)."""
        x = self._line_solve(r)
        for _ in range(self.n_iter - 1):
            x = x + self._line_solve(r - self.A(x).astype(r.dtype))
        return x
