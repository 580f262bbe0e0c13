"""z-line (block-tridiagonal) smoothing for anisotropic structured meshes.

Round-1 post-mortem (docs/STREAMER_STUDY.md): on the um-resolution
streamer corridor mesh (dz << dr, aspect ratios 10-100) point-smoothed
multigrid and point-Jacobi preconditioning both degrade — the strong
z-direction coupling (1/dz^2) dominates the operator and point methods
cannot damp z-oscillatory error. The textbook fix is LINE relaxation
along the strong direction: solve each z-line's tridiagonal system
exactly, batched over the r-columns.

TPU shape: two interchangeable batched tridiagonal solvers —

- `tridiag_solve_batched` (Thomas): a `lax.scan` along z carrying one
  scalar pair per r-column. Exact, but 2*n_z *sequential* steps whose
  per-step vector work is tiny — on TPU the VPU idles on scan-step
  latency (measured: the V-cycle built on it dominated the stiff-regime
  Newton-Krylov step cost).
- `tridiag_solve_pcr` (parallel cyclic reduction): ceil(log2(n_z))
  doubling steps, each one full-width [n_lines, n_z] vector op — the
  TPU-native shape. Stable for the diagonally-dominant lines a
  Laplacian-like operator produces. This is the default on all backends.

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


def tridiag_solve_pcr(a: Array, b: Array, c: Array, d: Array) -> Array:
    """Parallel cyclic reduction for per-line tridiagonal systems, batched
    over the leading axis. Same contract as `tridiag_solve_batched`, but
    ceil(log2(n_z)) vectorized elimination rounds instead of 2*n_z
    sequential scan steps — the TPU-friendly formulation.

    Each round eliminates the neighbors at distance `s` by row combination:
        alpha_i = -a_i / b_{i-s},  gamma_i = -c_i / b_{i+s}
        a'_i = alpha_i * a_{i-s}          (new sub-neighbor at 2s)
        c'_i = gamma_i * c_{i+s}
        b'_i = b_i + alpha_i * c_{i-s} + gamma_i * a_{i+s}
        d'_i = d_i + alpha_i * d_{i-s} + gamma_i * d_{i+s}
    Out-of-range rows act as identity rows (handled by zero-padded shifts).
    Stable for diagonally dominant lines (our masked Laplacian stencils).
    """
    n = a.shape[1]
    a = a.at[:, 0].set(0.0)
    c = c.at[:, -1].set(0.0)

    def shift_dn(x, s):  # x_{i-s}, zeros below
        return jnp.pad(x, ((0, 0), (s, 0)))[:, :n]

    def shift_up(x, s):  # x_{i+s}, zeros above
        return jnp.pad(x, ((0, 0), (0, s)))[:, s:]

    s = 1
    while s < n:
        bm, bp = shift_dn(b, s), shift_up(b, s)
        # out-of-range neighbor rows are identity rows (b=1): padding left
        # zeros in bm/bp, but the matching a/c are already zero there, so
        # guard only against 0/0
        alpha = -a / jnp.where(bm == 0, 1.0, bm)
        gamma = -c / jnp.where(bp == 0, 1.0, bp)
        b = b + alpha * shift_dn(c, s) + gamma * shift_up(a, s)
        d = d + alpha * shift_dn(d, s) + gamma * shift_up(d, s)
        a = alpha * shift_dn(a, s)
        c = gamma * shift_up(c, s)
        s *= 2
    return d / b


class ZLineSmoother:
    """Line-Jacobi preconditioner: tridiagonal solves along index-j lines
    of a structured dof grid, with optional Richardson iterations.

    A: the (masked) linear operator on flat [n_dofs] vectors.
    node_grid: [n_i, n_j] int array of dof ids; every dof must appear
        exactly once (structured 'right'/'left' meshes).
    n_iter: total line solves (1 = plain line-Jacobi; >1 adds damped
        Richardson refinement steps x += M(r - A x)).
    method: 'pcr' (parallel cyclic reduction, the default on ALL
        backends — log-depth vector rounds instead of Thomas's 2*n_j
        sequential steps; its UNPIVOTED reduction assumes diagonally
        dominant lines, which masked Laplacian z-lines are, and can
        degrade on indefinite/non-dominant systems) or 'thomas' (the
        sequential-scan exact elimination — use it when feeding lines
        that are not diagonally dominant).
    """

    def __init__(self, A: Callable, node_grid: np.ndarray, n_dofs: int,
                 n_iter: int = 2, dtype=None, method: str = "pcr"):
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
        self._solve = {"pcr": tridiag_solve_pcr,
                       "thomas": tridiag_solve_batched}[method]

    def _line_solve(self, r: Array) -> Array:
        rg = r[self.grid]
        xg = self._solve(self._a, self._b, self._c,
                         rg.astype(self._b.dtype))
        return jnp.zeros(self.n_dofs, xg.dtype).at[
            self.grid.reshape(-1)].set(xg.reshape(-1))

    def solve(self, r: Array) -> Array:
        """Approximate A^-1 r (use as the elliptic-block preconditioner)."""
        x = self._line_solve(r)
        for _ in range(self.n_iter - 1):
            x = x + self._line_solve(r - self.A(x).astype(r.dtype))
        return x
