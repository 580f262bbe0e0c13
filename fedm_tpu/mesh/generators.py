"""Structured mesh generators.

Covers the generators the reference workloads use: `IntervalMesh(n, a, b)`
(`examples/time_of_flight_1D/fedm-tof_1d.py:87`) and
`RectangleMesh(Point..., nx, ny[, "crossed"])`
(`examples/glow_discharge/fedm-gd.py:157`,
`tests/integrated_tests/time_of_flight/fedm_tof.py:95`), with the three
standard diagonal patterns.
"""

from __future__ import annotations

import numpy as np

from .mesh import Mesh


def interval_mesh(n: int, a: float, b: float) -> Mesh:
    """Uniform 1D mesh with `n` cells on [a, b]."""
    coords = np.linspace(a, b, n + 1)[:, None]
    cells = np.stack([np.arange(n), np.arange(1, n + 1)], axis=1)
    return Mesh(coords, cells)


def rectangle_mesh(
    p0: tuple,
    p1: tuple,
    nx: int,
    ny: int,
    diagonal: str = "right",
) -> Mesh:
    """Structured triangle mesh of the rectangle [p0, p1] with nx-by-ny quads.

    diagonal:
      'right'   - split each quad lower-left to upper-right (dolfin default)
      'left'    - split each quad lower-right to upper-left
      'crossed' - add a centre vertex, 4 triangles per quad
    """
    x0, y0 = float(p0[0]), float(p0[1])
    x1, y1 = float(p1[0]), float(p1[1])
    xs = np.linspace(x0, x1, nx + 1)
    ys = np.linspace(y0, y1, ny + 1)
    X, Y = np.meshgrid(xs, ys, indexing="xy")
    grid_coords = np.stack([X.ravel(), Y.ravel()], axis=1)  # row-major by y

    def vid(ix, iy):
        return iy * (nx + 1) + ix

    ix = np.arange(nx)
    iy = np.arange(ny)
    IX, IY = np.meshgrid(ix, iy, indexing="xy")
    ll = vid(IX, IY).ravel()  # lower-left of each quad
    lr = vid(IX + 1, IY).ravel()
    ul = vid(IX, IY + 1).ravel()
    ur = vid(IX + 1, IY + 1).ravel()

    if diagonal == "right":
        tris = np.concatenate(
            [np.stack([ll, lr, ur], axis=1), np.stack([ll, ur, ul], axis=1)]
        )
        coords = grid_coords
    elif diagonal == "left":
        tris = np.concatenate(
            [np.stack([ll, lr, ul], axis=1), np.stack([lr, ur, ul], axis=1)]
        )
        coords = grid_coords
    elif diagonal == "crossed":
        n_grid = grid_coords.shape[0]
        centres = 0.25 * (
            grid_coords[ll] + grid_coords[lr] + grid_coords[ul] + grid_coords[ur]
        )
        cc = n_grid + np.arange(nx * ny)
        coords = np.concatenate([grid_coords, centres])
        tris = np.concatenate(
            [
                np.stack([ll, lr, cc], axis=1),
                np.stack([lr, ur, cc], axis=1),
                np.stack([ur, ul, cc], axis=1),
                np.stack([ul, ll, cc], axis=1),
            ]
        )
    else:
        raise ValueError(
            f"diagonal '{diagonal}' not recognised; options: 'right', 'left', 'crossed'"
        )

    return Mesh(coords, tris.astype(np.int32))
