"""Geometric boundary marking.

Re-implements the reference's `Marking_boundaries` / `LineSubDomain` /
`CircleSubDomain` semantics (`/root/reference/fedm/functions.py:48-124`):
boundary facets matching a geometric predicate are assigned marker `idx+1`
for the idx-th entry of the boundary list, with later entries overriding
earlier ones (dolfin `SubDomain.mark` applies sequentially). A facet matches
when all of its vertices and its midpoint satisfy the predicate.

Boundary list entries follow the reference's on-script format
(`examples/glow_discharge/fedm-gd.py:138-141`):

  ['line', z1, z2, r1, r2]   with coordinates x[0]=r, x[1]=z
  ['circle', center_z, center_r, radius]
  ['point', z]               1D meshes (x[0]=z)
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .mesh import Mesh

_EPS = 3e-16  # DOLFIN_EPS, used to widen line ranges as the reference does


def _line_predicate(points: np.ndarray, z1, z2, r1, r2, tol) -> np.ndarray:
    r, z = points[:, 0], points[:, 1]
    in_r = (r >= r1 - tol) & (r <= r2 + tol)
    in_z = (z >= z1 - tol) & (z <= z2 + tol)
    return in_r & in_z


def _circle_predicate(points: np.ndarray, cz, cr, radius, gap_length, tol) -> np.ndarray:
    r, z = points[:, 0], points[:, 1]
    d2 = (r - cr) ** 2 + (z - cz) ** 2
    within = np.abs(d2 - radius**2) <= tol
    z_ok = (z <= 0) if cz <= 0 else (z >= gap_length)
    return within & z_ok


def mark_boundaries(
    mesh: Mesh,
    boundaries: Sequence[List],
    gap_length: float = 0.01,
    line_tol: float = None,
    circle_tol: float = 1e-8,
) -> np.ndarray:
    """Mark boundary facets of `mesh`; returns the marker array (also stored
    on the mesh as `facet_markers`). Marker value for boundaries[idx] is idx+1."""
    markers = np.zeros(len(mesh.boundary_facets), dtype=np.int32)
    if line_tol is None:
        # absolute epsilon like dolfin's `between` with DOLFIN_EPS widening,
        # plus a relative fudge so float64 grid coordinates always land inside
        extent = np.abs(mesh.coords).max() if mesh.n_verts else 1.0
        line_tol = max(_EPS, 1e-12 * extent)

    # facet test points: every vertex + the midpoint
    fpts = mesh.coords[mesh.boundary_facets]  # [n_bf, verts_per_facet, dim]
    mids = fpts.mean(axis=1, keepdims=True)
    test_pts = np.concatenate([fpts, mids], axis=1)  # [n_bf, vpf+1, dim]
    n_bf, n_test = test_pts.shape[0], test_pts.shape[1]
    flat = test_pts.reshape(-1, mesh.dim)

    for idx, boundary in enumerate(boundaries):
        btype = boundary[0]
        if btype == "line":
            z1, z2, r1, r2 = boundary[1:5]
            ok = _line_predicate(flat, z1, z2, r1, r2, line_tol)
        elif btype == "circle":
            cz, cr, radius = boundary[1:4]
            ok = _circle_predicate(flat, cz, cr, radius, gap_length, circle_tol)
        elif btype == "point":
            if mesh.dim != 1:
                raise ValueError("'point' boundaries are only valid on 1D meshes")
            z = boundary[1]
            ok = np.abs(flat[:, 0] - z) <= line_tol
        else:
            raise ValueError(
                f"Invalid boundary type '{btype}'. "
                "Possible values are 'circle', 'line', 'point'."
            )
        hit = ok.reshape(n_bf, n_test).all(axis=1)
        markers[hit] = idx + 1

    mesh.facet_markers = markers
    return markers
