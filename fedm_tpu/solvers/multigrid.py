"""Geometric multigrid V-cycle for the Poisson block.

The TPU-native answer to the reference's hypre BoomerAMG option
(`fedm-gd.py:413`, SURVEY.md 2.3 'AMG-lite'): a V-cycle over nested
structured meshes with Chebyshev smoothing (linear, fixed-degree — no
data-dependent control flow, so the whole preconditioner jits and remains
a FIXED linear operator, as BiCGStab requires), a precomputed dense
inverse on the coarsest level, and pure gather/segment-sum transfers.

Mesh-independent convergence: the composed Newton-Krylov outer iteration
count stops growing with resolution, which is what makes large meshes
affordable without a sparse direct solver.
"""

from __future__ import annotations

from typing import Callable, List

import numpy as np
import jax
import jax.numpy as jnp

from ..fem.assembly import CellBatch
from ..fem.interpolation import p1_transfer, prolong, restrict
from ..fem.space import FunctionSpace
from .chebyshev import chebyshev_solver, power_iteration_lmax

Array = jax.Array


class _Level:
    def __init__(self, space: FunctionSpace, batch: CellBatch,
                 mask: Array):
        self.space = space
        self.batch = batch
        self.mask = mask
        self.n = space.n_dofs

        g = batch.grads
        g2 = jnp.sum(g * g, axis=-1)
        if g2.shape[1] == 1:
            contrib = batch.scale.sum(axis=1)[:, None] * g2[:, 0]
        else:
            contrib = jnp.einsum("cq,cqa->ca", batch.scale, g2)
        diag = batch.scatter(contrib)
        self.dtilde = jnp.where(mask | (diag == 0), 1.0, diag)

    def A(self, x: Array) -> Array:
        b = self.batch
        x_in = jnp.where(self.mask, 0.0, x)
        Ax = b.scatter(b.stiffness(b.grad(b.gather(x_in))))
        return jnp.where(self.mask, x, Ax)

    def At(self, x: Array) -> Array:
        return self.A(x) / self.dtilde


class GeometricMultigrid:
    """Build from a fine-to-coarse list of (space, dirichlet_mask).

    `precond(r)` applies one V-cycle approximating A^-1 r for the masked
    fine-level Laplacian (Dirichlet rows act as identity).
    """

    def __init__(self, spaces: List[FunctionSpace], masks: List[np.ndarray],
                 axisymmetric: bool = False, quad_degree: int = 2,
                 dtype=None, smooth_degree: int = 3,
                 smooth_ratio: float = 15.0, power_iters: int = 30,
                 line_grids: List[np.ndarray] = None):
        """`line_grids` (optional): per-level [n_i, n_j] dof-id grids —
        switches the smoother from point-Chebyshev to z-line relaxation
        (solvers.linesmoother), the anisotropy-robust choice for
        dz << dr corridor meshes (docs/STREAMER_STUDY.md conclusion 3:
        point smoothing + anisotropic cells makes MG worse, not better)."""
        assert len(spaces) >= 2, "need at least two levels"
        self.levels: List[_Level] = []
        for space, mask in zip(spaces, masks):
            batch = CellBatch(space, quad_degree=quad_degree,
                              axisymmetric=axisymmetric, dtype=dtype)
            self.levels.append(_Level(space, batch, jnp.asarray(mask)))

        # smoothers per level: r -> z ~ A^-1 r (high-frequency part);
        # `self.ops` holds the per-level matvec used inside the V-cycle —
        # wherever a level is a canonical tensor-product grid (explicit
        # `line_grids` or auto-detected) the unstructured gather/scatter
        # matvec is replaced by its extracted 9-point stencil
        # (solvers/stencil.py), measured ~25x faster on TPU
        from .stencil import StencilOp, canonical_node_grid

        self._grids = []
        for k, lev in enumerate(self.levels):
            if line_grids is not None and k < len(line_grids):
                self._grids.append(np.asarray(line_grids[k]))
            else:
                self._grids.append(canonical_node_grid(lev.space))
        # the coarsest level only needs its dense inverse, not an op
        self.ops = [lev.A for lev in self.levels]
        for k, lev in enumerate(self.levels[:-1]):
            if self._grids[k] is not None:
                try:
                    self.ops[k] = StencilOp(lev.A, self._grids[k], lev.n,
                                            dtype=dtype)
                except AssertionError:
                    self._grids[k] = None

        # transfers between consecutive levels (fine k -> coarse k+1):
        # separable slice/pad transfers on nested canonical grids
        # (fem.interpolation.StructuredTransfer), generic gather/segment-sum
        # P1 transfers otherwise
        from ..fem.interpolation import StructuredTransfer

        def _canonical(grid):
            if grid is None:
                return False
            n_i, n_j = grid.shape
            I, J = np.meshgrid(np.arange(n_i), np.arange(n_j),
                               indexing="ij")
            return np.array_equal(np.asarray(grid), J * n_i + I)

        self.transfers = []
        for k in range(len(spaces) - 1):
            st = None
            if (isinstance(self.ops[k], StencilOp)
                    and self.ops[k]._reshape_ok
                    and _canonical(self._grids[k + 1])):
                try:
                    cf, cc = spaces[k].dof_coords, spaces[k + 1].dof_coords
                    st = StructuredTransfer(
                        np.unique(cc[:, 0]), np.unique(cc[:, 1]),
                        np.unique(cf[:, 0]), np.unique(cf[:, 1]),
                        dtype=dtype)
                except AssertionError:
                    st = None
            if st is not None:
                self.transfers.append(("st", st))
            else:
                idx, w = p1_transfer(spaces[k + 1], spaces[k], dtype=dtype)
                self.transfers.append(("p1", (idx, w)))

        self.smoothers = []
        for k, lev in enumerate(self.levels[:-1]):
            if (line_grids is not None and isinstance(self.ops[k], StencilOp)
                    and k < len(line_grids) and line_grids[k] is not None):
                from .linesmoother import tridiag_solve_pcr

                st = self.ops[k]
                a_l, b_l, c_l = st.line_coeffs()

                def line_smooth(r, st=st, a=a_l, b=b_l, c=c_l):
                    X = tridiag_solve_pcr(a, b, c,
                                          st.to_grid(r).astype(b.dtype))
                    return st.to_flat(X).astype(r.dtype)

                self.smoothers.append(line_smooth)
            elif (line_grids is not None and k < len(line_grids)
                    and line_grids[k] is not None):
                # stencil extraction failed for this level (ops[k] is the
                # generic matvec): fall back to the probe-extraction z-line
                # smoother rather than crashing construction
                from .linesmoother import ZLineSmoother

                sm = ZLineSmoother(lev.A, line_grids[k], lev.n, n_iter=1,
                                   dtype=lev.dtilde.dtype)
                self.smoothers.append(sm.solve)
            else:
                A_fast = self.ops[k]
                At = (lambda x, A=A_fast, lev=lev: A(x) / lev.dtilde)
                lmax = power_iteration_lmax(At, lev.n, iters=power_iters)
                cheb = chebyshev_solver(At, lmax / smooth_ratio,
                                        1.05 * lmax, smooth_degree)
                self.smoothers.append(
                    lambda r, cheb=cheb, lev=lev: cheb(r / lev.dtilde))

        # dense inverse on the coarsest level (setup-time, host)
        coarse = self.levels[-1]
        n_c = coarse.n
        eye = np.eye(n_c)
        cols = jax.vmap(coarse.A, in_axes=1, out_axes=1)(
            jnp.asarray(eye, coarse.dtilde.dtype))
        self._coarse_inv = jnp.asarray(
            np.linalg.inv(np.asarray(cols, np.float64)),
            coarse.dtilde.dtype)

    def _vcycle(self, k: int, r: Array) -> Array:
        if k == len(self.levels) - 1:
            return self._coarse_inv @ r
        lev = self.levels[k]
        A = self.ops[k]
        smooth = self.smoothers[k]
        # pre-smooth
        z = smooth(r)
        # coarse-grid correction of the residual
        res = r - A(z)
        kind, tr = self.transfers[k]
        if kind == "st":
            r_c = tr.restrict(res)
        else:
            idx, w = tr
            r_c = restrict(idx, w, res, self.levels[k + 1].n)
        r_c = jnp.where(self.levels[k + 1].mask, 0.0, r_c)
        e_c = self._vcycle(k + 1, r_c)
        e_f = tr.prolong(e_c) if kind == "st" else prolong(tr[0], tr[1], e_c)
        z = z + jnp.where(lev.mask, 0.0, e_f)
        # post-smooth
        z = z + smooth(r - A(z))
        return z

    def precond(self, r: Array) -> Array:
        return self._vcycle(0, r)


def structured_hierarchy(make_space: Callable[[int, int], FunctionSpace],
                         nx: int, ny: int, levels: int,
                         min_cells: int = 4):
    """Spaces [(nx, ny), (nx/2, ny/2), ...] from a structured generator
    closure `make_space(nx, ny)`."""
    spaces = []
    for _ in range(levels):
        spaces.append(make_space(nx, ny))
        if nx // 2 < min_cells or ny // 2 < min_cells:
            break
        nx //= 2
        ny //= 2
    return spaces
