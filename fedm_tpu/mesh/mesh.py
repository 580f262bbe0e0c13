"""Array-based simplicial mesh.

The TPU-native replacement for the DOLFIN C++ mesh object the reference
delegates to (SURVEY.md section 2.3): a mesh is just a pair of numpy arrays
``coords[n_verts, dim]`` / ``cells[n_cells, dim+1]`` plus derived boundary
connectivity. Construction and topology live on the host (numpy, done once);
everything the solver touches per step is exported as static device arrays by
the FEM layer.

Supports 1D interval meshes and 2D triangle meshes, matching the geometry
needs of the reference workloads (`IntervalMesh`, `RectangleMesh`,
`Mesh('mesh.xml')` in `/root/reference/examples/*/fedm-*.py`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from textwrap import dedent

import numpy as np

# Local facet -> vertex numbering for simplices: facet i is opposite vertex i.
_TRI_FACETS = np.array([[1, 2], [0, 2], [0, 1]], dtype=np.int32)


@dataclass
class Mesh:
    """A simplicial mesh (intervals in 1D, triangles in 2D).

    Attributes
    ----------
    coords : [n_verts, dim] float64
    cells : [n_cells, dim+1] int32, vertex ids per cell
    boundary_facets : [n_bf, dim] int32, vertex ids of each boundary facet
        (a single vertex in 1D, an edge in 2D)
    boundary_cells : [n_bf] int32, the unique cell adjacent to each facet
    facet_markers : [n_bf] int32, user-set marker per boundary facet
        (0 = unmarked; set via `mark_boundaries`)
    """

    coords: np.ndarray
    cells: np.ndarray
    boundary_facets: np.ndarray = field(default=None, repr=False)
    boundary_cells: np.ndarray = field(default=None, repr=False)
    facet_markers: np.ndarray = field(default=None, repr=False)

    def __post_init__(self):
        self.coords = np.ascontiguousarray(self.coords, dtype=np.float64)
        if self.coords.ndim == 1:
            self.coords = self.coords[:, None]
        self.cells = np.ascontiguousarray(self.cells, dtype=np.int32)
        if self.boundary_facets is None:
            self._build_boundary()
        if self.facet_markers is None:
            self.facet_markers = np.zeros(len(self.boundary_facets), dtype=np.int32)

    # -- topology -----------------------------------------------------------

    @property
    def dim(self) -> int:
        return self.coords.shape[1]

    @property
    def n_verts(self) -> int:
        return self.coords.shape[0]

    @property
    def n_cells(self) -> int:
        return self.cells.shape[0]

    def _build_boundary(self) -> None:
        if self.dim == 1:
            # Facets are vertices; boundary vertices appear in exactly one cell.
            verts = self.cells.ravel()
            counts = np.bincount(verts, minlength=self.n_verts)
            bverts = np.where(counts == 1)[0].astype(np.int32)
            # adjacent cell for each boundary vertex
            cell_of = np.full(self.n_verts, -1, dtype=np.int32)
            for local in range(2):
                cell_of[self.cells[:, local]] = np.arange(self.n_cells, dtype=np.int32)
            self.boundary_facets = bverts[:, None]
            self.boundary_cells = cell_of[bverts]
        elif self.dim == 2:
            # Edges shared by exactly one triangle are boundary facets.
            edges = self.cells[:, _TRI_FACETS]  # [n_cells, 3, 2]
            flat = edges.reshape(-1, 2)
            key = np.sort(flat, axis=1)
            uniq, inv, counts = np.unique(
                key, axis=0, return_inverse=True, return_counts=True
            )
            boundary_edge = counts[inv] == 1  # [n_cells*3]
            idx = np.where(boundary_edge)[0]
            self.boundary_facets = flat[idx].astype(np.int32)
            self.boundary_cells = (idx // 3).astype(np.int32)
        else:
            raise ValueError(f"Unsupported mesh dimension {self.dim}")

    # -- metrics ------------------------------------------------------------

    def cell_h(self) -> np.ndarray:
        """Greatest vertex-to-vertex distance within each cell (dolfin hmax
        convention, `/root/reference/fedm/utils.py:23-35`)."""
        x = self.coords[self.cells]  # [n_cells, nv, dim]
        nv = x.shape[1]
        h = np.zeros(self.n_cells)
        for i in range(nv):
            for j in range(i + 1, nv):
                d = np.linalg.norm(x[:, i] - x[:, j], axis=-1)
                h = np.maximum(h, d)
        return h

    def cell_extents(self) -> np.ndarray:
        """Per-cell bounding-box extents [n_cells, dim] — the directional
        cell sizes used by Peclet-limited upwind stabilisation
        (`fedm_tpu.ops.stabilization.directional_h`)."""
        x = self.coords[self.cells]  # [n_cells, nv, dim]
        return x.max(axis=1) - x.min(axis=1)

    def hmax(self) -> float:
        return float(self.cell_h().max())

    def hmin(self) -> float:
        return float(self.cell_h().min())

    # -- boundary geometry --------------------------------------------------

    def facet_midpoints(self) -> np.ndarray:
        return self.coords[self.boundary_facets].mean(axis=1)

    def facet_normals(self) -> np.ndarray:
        """Outward unit normal per boundary facet."""
        if self.dim == 1:
            xm = self.coords[self.boundary_facets[:, 0], 0]
            centroid = self.coords[self.cells[self.boundary_cells], 0].mean(axis=1)
            return np.sign(xm - centroid)[:, None]
        a = self.coords[self.boundary_facets[:, 0]]
        b = self.coords[self.boundary_facets[:, 1]]
        t = b - a
        n = np.stack([t[:, 1], -t[:, 0]], axis=1)
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        # orient away from the opposite vertex of the adjacent cell
        cell_verts = self.cells[self.boundary_cells]
        centroid = self.coords[cell_verts].mean(axis=1)
        mid = 0.5 * (a + b)
        flip = np.sum(n * (centroid - mid), axis=1) > 0
        n[flip] *= -1.0
        return n


def mesh_info(mesh: Mesh) -> str:
    """Mesh statistics string; same fields as the reference's `mesh_info`
    (`/root/reference/fedm/utils.py:23-35`)."""
    return dedent(
        f"""\
        Number of elements is: {mesh.n_cells}
        Maximum element edge length is: {mesh.hmax():.5g}
        Minimum element edge length is: {mesh.hmin():.5g}
        """
    )
