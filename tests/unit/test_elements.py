import numpy as np
import pytest

from fedm_tpu.fem.elements import tabulate, cell_quadrature, n_local_dofs


@pytest.mark.parametrize("cell,degree", [
    ("interval", 1), ("interval", 2), ("triangle", 1), ("triangle", 2),
])
def test_partition_of_unity_and_kronecker(cell, degree):
    nl = n_local_dofs(cell, degree)
    # nodes of the element
    if cell == "interval":
        nodes = {1: [[0.0], [1.0]], 2: [[0.0], [1.0], [0.5]]}[degree]
    else:
        v = [[0, 0], [1, 0], [0, 1]]
        e = [[0.5, 0.5], [0, 0.5], [0.5, 0]]  # midpoints opposite v0,v1,v2
        nodes = {1: v, 2: v + e}[degree]
    nodes = np.array(nodes, dtype=float)
    N, dN = tabulate(cell, degree, nodes)
    assert N.shape == (nl, nl)
    np.testing.assert_allclose(N, np.eye(nl), atol=1e-14)
    # partition of unity at random points
    rng = np.random.default_rng(0)
    if cell == "interval":
        pts = rng.random((20, 1))
    else:
        p = rng.random((20, 2))
        pts = np.where((p.sum(1) > 1)[:, None], 1 - p, p)
    N, dN = tabulate(cell, degree, pts)
    np.testing.assert_allclose(N.sum(axis=1), 1.0, atol=1e-13)
    np.testing.assert_allclose(dN.sum(axis=1), 0.0, atol=1e-13)


@pytest.mark.parametrize("degree", [1, 2, 3, 4, 5, 6])
def test_triangle_quadrature_exactness(degree):
    pts, wts = cell_quadrature("triangle", degree)
    # exact integral of x^i y^j over reference triangle: i! j! / (i+j+2)!
    from math import factorial

    for i in range(degree + 1):
        for j in range(degree + 1 - i):
            exact = factorial(i) * factorial(j) / factorial(i + j + 2)
            approx = np.sum(wts * pts[:, 0] ** i * pts[:, 1] ** j)
            np.testing.assert_allclose(approx, exact, rtol=1e-12, atol=1e-15)


@pytest.mark.parametrize("degree", [1, 2, 3, 4, 5])
def test_interval_quadrature_exactness(degree):
    pts, wts = cell_quadrature("interval", degree)
    for i in range(degree + 1):
        np.testing.assert_allclose(
            np.sum(wts * pts[:, 0] ** i), 1.0 / (i + 1), rtol=1e-12
        )
