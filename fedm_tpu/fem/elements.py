"""Lagrange element tabulation and quadrature rules (host-side, numpy).

The TPU-native replacement for FFC/UFC JIT-compiled element kernels
(SURVEY.md section 2.3): instead of generating C++ per weak form, we
tabulate reference shape functions once with numpy and express every
element integral as batched einsums over those tables (see assembly.py).

Supported: P1/P2 on intervals and triangles — the element menu the
reference workloads actually use (P2 intervals in
`examples/time_of_flight_1D/fedm-tof_1d.py:98`, P1 triangles everywhere
else).

Reference cells: interval [0,1]; triangle with vertices (0,0),(1,0),(0,1).
Local dof ordering: vertices first, then edge midpoints, with edge dof i
opposite vertex i (triangle P2: [v0,v1,v2, e0=(v1,v2), e1=(v0,v2),
e2=(v0,v1)]).
"""

from __future__ import annotations

import numpy as np


def n_local_dofs(cell: str, degree: int) -> int:
    if cell == "interval":
        return degree + 1
    if cell == "triangle":
        return {1: 3, 2: 6}[degree]
    raise ValueError(f"unknown cell type '{cell}'")


def tabulate(cell: str, degree: int, points: np.ndarray):
    """Evaluate shape functions and their reference gradients.

    points: [n_pts, dim] reference coordinates.
    Returns (N [n_pts, n_local], dN [n_pts, n_local, dim]).
    """
    points = np.atleast_2d(np.asarray(points, dtype=np.float64))
    if cell == "interval":
        x = points[:, 0]
        if degree == 1:
            N = np.stack([1.0 - x, x], axis=1)
            dN = np.broadcast_to(
                np.array([[-1.0], [1.0]]), (len(x), 2, 1)
            ).copy()
        elif degree == 2:
            N = np.stack(
                [(1 - x) * (1 - 2 * x), x * (2 * x - 1), 4 * x * (1 - x)], axis=1
            )
            dN = np.stack([4 * x - 3, 4 * x - 1, 4 - 8 * x], axis=1)[:, :, None]
        else:
            raise ValueError("interval degree must be 1 or 2")
        return N, dN

    if cell == "triangle":
        xi, eta = points[:, 0], points[:, 1]
        lam = np.stack([1.0 - xi - eta, xi, eta], axis=1)  # barycentric
        dlam = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])  # [3, 2]
        if degree == 1:
            N = lam
            dN = np.broadcast_to(dlam, (len(xi), 3, 2)).copy()
            return N, dN
        if degree == 2:
            l0, l1, l2 = lam[:, 0], lam[:, 1], lam[:, 2]
            N = np.stack(
                [
                    l0 * (2 * l0 - 1),
                    l1 * (2 * l1 - 1),
                    l2 * (2 * l2 - 1),
                    4 * l1 * l2,
                    4 * l0 * l2,
                    4 * l0 * l1,
                ],
                axis=1,
            )
            dN = np.zeros((len(xi), 6, 2))
            for d in range(2):
                g0, g1, g2 = dlam[0, d], dlam[1, d], dlam[2, d]
                dN[:, 0, d] = (4 * l0 - 1) * g0
                dN[:, 1, d] = (4 * l1 - 1) * g1
                dN[:, 2, d] = (4 * l2 - 1) * g2
                dN[:, 3, d] = 4 * (g1 * l2 + l1 * g2)
                dN[:, 4, d] = 4 * (g0 * l2 + l0 * g2)
                dN[:, 5, d] = 4 * (g0 * l1 + l0 * g1)
            return N, dN
        raise ValueError("triangle degree must be 1 or 2")

    raise ValueError(f"unknown cell type '{cell}'")


# -- quadrature -------------------------------------------------------------

# Dunavant symmetric triangle rules; weights sum to the reference area 1/2.
_TRI_RULES = {}

_TRI_RULES[1] = (np.array([[1 / 3, 1 / 3]]), np.array([0.5]))
_TRI_RULES[2] = (
    np.array([[1 / 6, 1 / 6], [2 / 3, 1 / 6], [1 / 6, 2 / 3]]),
    np.full(3, 1 / 6),
)


def _tri_rule_deg4():
    a1, w1 = 0.445948490915965, 0.223381589678011
    a2, w2 = 0.091576213509771, 0.109951743655322
    pts, wts = [], []
    for a, w in [(a1, w1), (a2, w2)]:
        b = 1.0 - 2.0 * a
        pts += [[a, a], [b, a], [a, b]]
        wts += [w / 2] * 3
    return np.array(pts), np.array(wts)


_TRI_RULES[3] = _tri_rule_deg4()
_TRI_RULES[4] = _tri_rule_deg4()


def _tri_rule_deg5():
    pts = [[1 / 3, 1 / 3]]
    wts = [0.225 / 2]
    a1, w1 = 0.470142064105115, 0.132394152788506
    a2, w2 = 0.101286507323456, 0.125939180544827
    for a, w in [(a1, w1), (a2, w2)]:
        b = 1.0 - 2.0 * a
        pts += [[a, a], [b, a], [a, b]]
        wts += [w / 2] * 3
    return np.array(pts), np.array(wts)


_TRI_RULES[5] = _tri_rule_deg5()


def _tri_rule_deg6():
    a1, w1 = 0.249286745170910, 0.116786275726379
    a2, w2 = 0.063089014491502, 0.050844906370207
    pts, wts = [], []
    for a, w in [(a1, w1), (a2, w2)]:
        b = 1.0 - 2.0 * a
        pts += [[a, a], [b, a], [a, b]]
        wts += [w / 2] * 3
    # 6 asymmetric points
    c, d, w3 = 0.310352451033785, 0.053145049844816, 0.082851075618374
    e = 1.0 - c - d
    for p in [[c, d], [d, c], [c, e], [e, c], [d, e], [e, d]]:
        pts.append(p)
        wts.append(w3 / 2)
    return np.array(pts), np.array(wts)


_TRI_RULES[6] = _tri_rule_deg6()


def _gauss_01(n: int):
    """n-point Gauss-Legendre on [0, 1]."""
    x, w = np.polynomial.legendre.leggauss(n)
    return 0.5 * (x + 1.0), 0.5 * w


def cell_quadrature(cell: str, degree: int):
    """Quadrature rule integrating polynomials of `degree` exactly.

    Returns (points [n_q, dim], weights [n_q]) on the reference cell.
    """
    if cell == "interval":
        n = max(1, (degree + 2) // 2)
        x, w = _gauss_01(n)
        return x[:, None], w
    if cell == "triangle":
        deg = min(max(degree, 1), 6)
        pts, wts = _TRI_RULES[deg]
        return pts.copy(), wts.copy()
    raise ValueError(f"unknown cell type '{cell}'")


def facet_quadrature(cell_dim: int, degree: int):
    """Quadrature on the reference facet: a point (1D cells) or the unit
    interval parameterising an edge (2D cells)."""
    if cell_dim == 1:
        return np.zeros((1, 0)), np.ones(1)
    n = max(1, (degree + 2) // 2)
    x, w = _gauss_01(n)
    return x[:, None], w
