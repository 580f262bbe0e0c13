"""Structured 9-point stencil form of a scalar operator on tensor-product
node grids — the TPU-native matvec.

Motivation (measured on the Bagheri bench mesh, TPU v5e): the masked
Poisson-block Laplacian applied through the unstructured
gather->einsum->scatter path costs ~5 ms for 55k dofs, ~100x above its
HBM speed-of-light, because the per-element index chasing defeats the
vector units. On a structured 'right' rectangle mesh the same operator
is exactly a 9-point stencil, and its matvec is nine shifted
multiply-adds on the [n_i, n_j] node grid — pure VPU work, no gathers.
The multigrid V-cycle built on this (plus PCR line smoothing,
`linesmoother.py`) drops from ~20 ms to ~2 ms per application.

Extraction mirrors the reference's separation of concerns: FEniCS
assembles the Poisson bilinear form into a sparse matrix once
(`/root/reference/fedm/functions.py:1154-1161` via `df.assemble`); here
the "assembled" form is the stencil tensor, read off any masked linear
operator by nine 3-coloring probe matvecs (a (i mod 3, j mod 3) coloring
uniquely attributes every response within the 9-neighborhood).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array


def canonical_node_grid(space):
    """[n_i, n_j] node-id grid of a P1 space on a tensor-product mesh in
    the canonical `id = j * n_i + i` layout, or None if the space is not
    of that form (P2, unstructured, reordered...)."""
    import numpy as np

    if getattr(space, "degree", 1) != 1:
        return None
    c = np.asarray(space.dof_coords)
    if c.shape[1] != 2:
        return None
    xs, zs = np.unique(c[:, 0]), np.unique(c[:, 1])
    if len(xs) * len(zs) != space.n_dofs:
        return None
    ix = np.searchsorted(xs, c[:, 0])
    iz = np.searchsorted(zs, c[:, 1])
    if not np.array_equal(iz * len(xs) + ix, np.arange(space.n_dofs)):
        return None
    I, J = np.meshgrid(np.arange(len(xs)), np.arange(len(zs)),
                       indexing="ij")
    return J * len(xs) + I


class StencilOp:
    """y = A x for a scalar operator whose sparsity lies within the
    (i±1, j±1) neighborhood of a tensor-product node grid.

    node_grid: [n_i, n_j] dof ids, each dof exactly once. When the grid is
    the canonical `id = j * n_i + i` layout (our structured rectangle
    meshes), grid<->flat conversion is a reshape+transpose (free); any
    other layout falls back to gather/scatter.

    Dirichlet masking is inherited from the probed operator: identity
    rows/zeroed columns come out as (diag=1, neighbors=0) stencils.
    """

    def __init__(self, A: Callable, node_grid: np.ndarray, n_dofs: int,
                 dtype=None, validate: bool = True):
        node_grid = np.asarray(node_grid)
        assert node_grid.size == n_dofs, (
            "node_grid must enumerate every dof exactly once")
        n_i, n_j = node_grid.shape
        self.n_i, self.n_j = n_i, n_j
        self.n_dofs = n_dofs
        dtype = jax.dtypes.canonicalize_dtype(jnp.float64 if dtype is None
                                              else dtype)
        self.dtype = dtype

        I, J = np.meshgrid(np.arange(n_i), np.arange(n_j), indexing="ij")
        canonical = J * n_i + I
        self._reshape_ok = bool(np.array_equal(node_grid, canonical))
        self._grid = None if self._reshape_ok else jnp.asarray(node_grid,
                                                               jnp.int32)

        # nine 3-coloring probes through ONE jitted A (a vmapped batch
        # compiles ~10x slower on CPU for gather-heavy operators, which
        # dominated test-suite setup time)
        probes = np.zeros((9, n_dofs))
        keys = []
        for ai in range(3):
            for bj in range(3):
                sel = (I % 3 == ai) & (J % 3 == bj)
                probes[len(keys), node_grid[sel]] = 1.0
                keys.append((ai, bj))
        A_jit = jax.jit(A)
        ys = np.stack([np.asarray(A_jit(jnp.asarray(p, dtype)))
                       for p in probes])
        resp = {k: ys[i][node_grid] for i, k in enumerate(keys)}

        # S[di+1][dj+1][i, j] multiplies x[i+di, j+dj]
        S = np.zeros((3, 3, n_i, n_j))
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                # neighbor (i+di, j+dj) was lit by the probe with
                # (i+di) % 3 == ai and (j+dj) % 3 == bj
                for ai in range(3):
                    for bj in range(3):
                        m = ((I + di) % 3 == ai) & ((J + dj) % 3 == bj)
                        S[di + 1, dj + 1][m] = resp[(ai, bj)][m]
        # out-of-range neighbors contribute nothing
        S[0, :, 0, :] = 0.0
        S[2, :, -1, :] = 0.0
        S[:, 0, :, 0] = 0.0
        S[:, 2, :, -1] = 0.0
        self._S = jnp.asarray(S, dtype)

        if validate:
            rng = np.random.default_rng(0)
            x = rng.standard_normal(n_dofs)
            y_ref = np.asarray(A_jit(jnp.asarray(x, dtype)), np.float64)
            y_st = np.asarray(self.apply(jnp.asarray(x, dtype)), np.float64)
            scale = max(np.abs(y_ref).max(), 1e-30)
            err = np.abs(y_st - y_ref).max() / scale
            tol = 1e-4 if dtype == jnp.float32 else 1e-9
            assert err < tol, (
                f"stencil extraction mismatch (rel {err:.2e}): operator "
                f"sparsity exceeds the 9-point neighborhood of node_grid")

    # -- layout -------------------------------------------------------------

    def to_grid(self, x: Array) -> Array:
        if self._reshape_ok:
            return x.reshape(self.n_j, self.n_i).T
        return x[self._grid]

    def to_flat(self, X: Array) -> Array:
        if self._reshape_ok:
            return X.T.reshape(-1)
        return jnp.zeros(self.n_dofs, X.dtype).at[
            self._grid.reshape(-1)].set(X.reshape(-1))

    # -- matvec -------------------------------------------------------------

    def apply_grid(self, X: Array) -> Array:
        """Stencil matvec in grid layout: X, result [n_i, n_j]."""
        n_i, n_j = self.n_i, self.n_j
        P = jnp.pad(X, 1)
        out = jnp.zeros_like(X)
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                out = out + self._S[di + 1, dj + 1] * jax.lax.dynamic_slice(
                    P, (1 + di, 1 + dj), (n_i, n_j))
        return out

    def apply(self, x: Array) -> Array:
        """Stencil matvec on flat [n_dofs] vectors."""
        return self.to_flat(self.apply_grid(self.to_grid(x)))

    def __call__(self, x: Array) -> Array:
        return self.apply(x)

    # -- z-line coefficients (for line smoothing) ----------------------------

    def line_coeffs(self):
        """(sub, diag, sup) [n_i, n_j] along the j axis — the tridiagonal
        in-line part, identical to ZLineSmoother's probe extraction but
        free here (sliced from the stencil tensor)."""
        return self._S[1, 0], self._S[1, 1], self._S[1, 2]
