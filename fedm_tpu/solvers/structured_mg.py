"""Structured-grid Poisson multigrid with geometry-as-arguments.

The production Poisson-block preconditioner for tensor-product corridor
meshes (the Bagheri streamer): a V-cycle with z-line (PCR tridiagonal)
smoothing, separable slice/pad transfers and a dense coarse inverse —
numerically the same cycle as `solvers.multigrid.GeometricMultigrid` with
`line_grids` (stencil ops + StructuredTransfer), with two differences that
make it the moving-window workhorse:

1. **Host-side stencil assembly.** The per-level 9-point stencils, the
   transfer weights and the coarse dense inverse are assembled in numpy
   directly from the coordinate lines — no jitted probe matvecs, no
   device compiles. A full hierarchy rebuild after a window move costs
   ~100 ms of host work instead of minutes of XLA compilation.
2. **Functional application.** `precond_with(geom, r)` reads every
   geometry-dependent array from the `geom` pytree argument, so the
   enclosing jitted step can thread geometry through as *arguments*
   (model/system.CoupledSystem.enable_geom_mode). Moving the window swaps
   arrays of identical shapes; the compiled executable is reused.

The stencil is the exact assembled P1 stiffness of the masked Laplacian
(Dirichlet rows identity, columns into Dirichlet nodes zeroed), matching
`CoupledSystem.masked_stiffness_op` semantics: the operator the reference
hands to hypre BoomerAMG (`/root/reference/examples/glow_discharge/
fedm-gd.py:413`, SURVEY.md section 2.3).
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import pi
from .linesmoother import tridiag_solve_pcr

Array = jax.Array


def p1_stiffness_stencil(xs: np.ndarray, zs: np.ndarray,
                         axisymmetric: bool = True) -> np.ndarray:
    """Assembled 9-point stiffness stencil S[di+1, dj+1, n_i, n_j] of the
    P1 Laplacian on the canonical `rectangle_mesh(..., 'right')` mesh with
    coordinate lines (xs, zs) — node id = j*n_i + i, grid layout [n_i, n_j].
    S[di+1, dj+1, i, j] multiplies x[i+di, j+dj]. Pure numpy (host, once
    per geometry update)."""
    n_i, n_j = len(xs), len(zs)
    nx, nz = n_i - 1, n_j - 1
    # quad corner coordinates [nx, nz]
    X0, Z0 = xs[:-1][:, None], zs[None, :-1]
    X1, Z1 = xs[1:][:, None], zs[None, 1:]
    hx, hz = (X1 - X0) * np.ones((1, nz)), np.ones((nx, 1)) * (Z1 - Z0)
    area = 0.5 * hx * hz  # both triangles of the 'right' split

    # 'right' split: lower tri (ll, lr, ur), upper tri (ll, ur, ul).
    # P1 gradients are constant per triangle; with vertices p0,p1,p2 the
    # basis gradients are rows of inv([p1-p0, p2-p0])^T acting on the
    # barycentric structure. For the axis-aligned right split they are
    # closed-form in (hx, hz).
    def tri_stencil(verts, grads):
        """verts: list of (di, dj) grid offsets of the 3 vertices relative
        to the quad's lower-left corner; grads: list of [2, nx, nz] basis
        gradients. Returns contributions into S."""
        if axisymmetric:
            # exact for linear r: \int 2*pi*r over the triangle
            r_cent = np.mean([xs[:-1][:, None] * np.ones((1, nz))
                              + dv[0] * hx for dv in verts], axis=0)
            w = 2.0 * pi * r_cent * area
        else:
            w = area
        out = []
        for a in range(3):
            for b in range(3):
                k = w * (grads[a][0] * grads[b][0]
                         + grads[a][1] * grads[b][1])
                out.append((verts[a], verts[b], k))
        return out

    # lower triangle: p0=ll(0,0), p1=lr(1,0), p2=ur(1,1)
    #   lambda0 = 1 - (x-x0)/hx ; lambda1 = (x-x0)/hx - (z-z0)/hz ;
    #   lambda2 = (z-z0)/hz
    zero = np.zeros_like(hx)
    lower = tri_stencil(
        [(0, 0), (1, 0), (1, 1)],
        [np.stack([-1.0 / hx, zero]),
         np.stack([1.0 / hx, -1.0 / hz]),
         np.stack([zero, 1.0 / hz])])
    # upper triangle: p0=ll(0,0), p1=ur(1,1), p2=ul(0,1)
    #   lambda0 = 1 - (z-z0)/hz ... derive: affine coords u=(x-x0)/hx,
    #   v=(z-z0)/hz; p0=(0,0), p1=(1,1), p2=(0,1):
    #   lambda1 = u ; lambda2 = v - u ; lambda0 = 1 - v
    upper = tri_stencil(
        [(0, 0), (1, 1), (0, 1)],
        [np.stack([zero, -1.0 / hz]),
         np.stack([1.0 / hx, zero]),
         np.stack([-1.0 / hx, 1.0 / hz])])

    S = np.zeros((3, 3, n_i, n_j))
    IX, IZ = np.meshgrid(np.arange(nx), np.arange(nz), indexing="ij")
    for (va, vb, k) in lower + upper:
        di, dj = vb[0] - va[0], vb[1] - va[1]
        np.add.at(S[di + 1, dj + 1], (IX + va[0], IZ + va[1]), k)
    return S


def apply_mask_to_stencil(S: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Dirichlet masking in stencil form: masked rows become identity rows,
    and couplings INTO masked nodes are zeroed (matches
    `CoupledSystem.masked_stiffness_op`)."""
    S = S.copy()
    n_i, n_j = mask.shape
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            # neighbor (i+di, j+dj) masked -> coefficient zeroed
            nb = np.zeros((n_i, n_j), dtype=bool)
            src = mask[max(di, 0):n_i + min(di, 0),
                       max(dj, 0):n_j + min(dj, 0)]
            nb[max(-di, 0):n_i - max(di, 0),
               max(-dj, 0):n_j - max(dj, 0)] = src
            S[di + 1, dj + 1][nb] = 0.0
            S[di + 1, dj + 1][mask] = 0.0
    S[1, 1][mask] = 1.0
    return S


def stencil_matvec(S: Array, X: Array) -> Array:
    """9-point stencil matvec in grid layout: X, result [n_i, n_j]."""
    n_i, n_j = X.shape
    P = jnp.pad(X, 1)
    out = jnp.zeros_like(X)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            out = out + S[di + 1, dj + 1] * jax.lax.dynamic_slice(
                P, (1 + di, 1 + dj), (n_i, n_j))
    return out


def _prolong_axis(U: Array, w: Array) -> Array:
    """Last axis [.., nc] -> [.., 2*nc-1] (linear, physical weights)."""
    odd = U[..., :-1] * (1.0 - w) + U[..., 1:] * w
    body = jnp.stack([U[..., :-1], odd], axis=-1)
    body = body.reshape(body.shape[:-2] + (-1,))
    return jnp.concatenate([body, U[..., -1:]], axis=-1)


def _restrict_axis(r: Array, w: Array) -> Array:
    """Exact transpose of `_prolong_axis`: [.., 2*nc-1] -> [.., nc]."""
    even = r[..., ::2]
    odd = r[..., 1::2]
    pad_lo = [(0, 0)] * (r.ndim - 1)
    lo = jnp.pad((1.0 - w) * odd, pad_lo + [(0, 1)])
    hi = jnp.pad(w * odd, pad_lo + [(1, 0)])
    return even + lo + hi


class StructuredPoissonMG:
    """V-cycle preconditioner for the masked P1 Laplacian on nested
    canonical tensor-product grids, with all geometry in a swappable pytree.

    Parameters
    ----------
    xs, zs : fine-level coordinate lines (cell counts divisible by
        2**(levels-1) for exact 2:1 slicing).
    mask_grid : [n_i, n_j] bool — Dirichlet nodes in GRID-INDEX space.
        Static across geometry updates (node indices, not coordinates).
    levels : hierarchy depth (>= 2).
    """

    def __init__(self, xs, zs, mask_grid: np.ndarray, levels: int,
                 axisymmetric: bool = True, dtype=None,
                 min_cells: int = 4):
        dtype = jax.dtypes.canonicalize_dtype(jnp.float64 if dtype is None
                                              else dtype)
        self.dtype = dtype
        self.axisymmetric = axisymmetric
        xs, zs = np.asarray(xs, np.float64), np.asarray(zs, np.float64)
        self._masks = [np.asarray(mask_grid, bool)]
        self._shapes = [(len(xs), len(zs))]
        n_lev = 1
        for _ in range(1, levels):
            nx, nz = self._shapes[-1][0] - 1, self._shapes[-1][1] - 1
            if nx % 2 or nz % 2 or nx // 2 < min_cells or nz // 2 < min_cells:
                break
            self._masks.append(self._masks[-1][::2, ::2])
            self._shapes.append((nx // 2 + 1, nz // 2 + 1))
            n_lev += 1
        assert n_lev >= 2, "need at least two levels (check divisibility)"
        self.n_levels = n_lev
        self.n_i, self.n_j = self._shapes[0]
        self.n_dofs = self.n_i * self.n_j
        self._geom = self.build_geom(xs, zs)

    # -- host-side geometry assembly -----------------------------------------

    def build_geom(self, xs, zs) -> dict:
        """Assemble the full hierarchy's geometry pytree for new coordinate
        lines (same counts). Pure host numpy — no device compiles."""
        xs, zs = np.asarray(xs, np.float64), np.asarray(zs, np.float64)
        assert (len(xs), len(zs)) == self._shapes[0], (
            "coordinate line counts must match the constructed hierarchy")
        S_list, wx_list, wz_list = [], [], []
        xs_k, zs_k = xs, zs
        for k in range(self.n_levels):
            S = p1_stiffness_stencil(xs_k, zs_k, self.axisymmetric)
            S = apply_mask_to_stencil(S, self._masks[k])
            S_list.append(jnp.asarray(S, self.dtype))
            if k < self.n_levels - 1:
                xc, zc = xs_k[::2], zs_k[::2]
                wx_list.append(jnp.asarray(
                    (xs_k[1::2] - xc[:-1]) / (xc[1:] - xc[:-1]), self.dtype))
                wz_list.append(jnp.asarray(
                    (zs_k[1::2] - zc[:-1]) / (zc[1:] - zc[:-1]), self.dtype))
                xs_k, zs_k = xc, zc
        # dense coarse inverse (f64 host inversion, stored in compute dtype)
        S_c = np.asarray(S_list[-1], np.float64)
        n_i, n_j = self._shapes[-1]
        n_c = n_i * n_j
        A = np.zeros((n_c, n_c))
        I, J = np.meshgrid(np.arange(n_i), np.arange(n_j), indexing="ij")
        rows = (J * n_i + I).ravel()
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                ok = ((I + di >= 0) & (I + di < n_i)
                      & (J + dj >= 0) & (J + dj < n_j)).ravel()
                cols = ((J + dj) * n_i + (I + di)).ravel()
                A[rows[ok], cols[ok]] += S_c[di + 1, dj + 1].ravel()[ok]
        cinv = np.linalg.inv(A)
        return {"S": tuple(S_list), "wx": tuple(wx_list),
                "wz": tuple(wz_list),
                "cinv": jnp.asarray(cinv, self.dtype)}

    def update_geometry(self, xs, zs) -> dict:
        """Rebuild and install new geometry; returns the new pytree (for
        callers threading geometry through jitted functions)."""
        self._geom = self.build_geom(xs, zs)
        return self._geom

    def geom(self) -> dict:
        return self._geom

    # -- functional application ----------------------------------------------

    def _smooth(self, S: Array, R: Array) -> Array:
        """One z-line (tridiagonal) solve in grid layout [n_i, n_j]."""
        a, b, c = S[1, 0], S[1, 1], S[1, 2]
        return tridiag_solve_pcr(a, b, c, R.astype(b.dtype))

    def _vcycle(self, geom: dict, k: int, R: Array) -> Array:
        if k == self.n_levels - 1:
            n_i, n_j = self._shapes[k]
            e = geom["cinv"] @ R.T.reshape(-1)
            return e.reshape(n_j, n_i).T
        S = geom["S"][k]
        Z = self._smooth(S, R)
        res = R - stencil_matvec(S, Z)
        # restrict (separable, exact transpose of prolongation)
        Rc = _restrict_axis(res.T, geom["wx"][k]).T
        Rc = _restrict_axis(Rc, geom["wz"][k])
        mask_c = jnp.asarray(self._masks[k + 1])
        Rc = jnp.where(mask_c, 0.0, Rc)
        Ec = self._vcycle(geom, k + 1, Rc)
        E = _prolong_axis(Ec.T, geom["wx"][k]).T
        E = _prolong_axis(E, geom["wz"][k])
        Z = Z + jnp.where(jnp.asarray(self._masks[k]), 0.0, E)
        Z = Z + self._smooth(S, R - stencil_matvec(S, Z))
        return Z

    def precond_with(self, geom: dict, r: Array) -> Array:
        """One V-cycle approximating A^-1 r; r flat [n_dofs] in canonical
        `id = j*n_i + i` layout."""
        X = r.reshape(self.n_j, self.n_i).T
        Z = self._vcycle(geom, 0, X.astype(self.dtype))
        return Z.T.reshape(-1).astype(r.dtype)

    def precond(self, r: Array) -> Array:
        return self.precond_with(self._geom, r)
