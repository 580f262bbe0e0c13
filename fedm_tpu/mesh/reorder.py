"""Mesh node reordering for memory locality.

TPU gathers/scatters run best when the (cell -> node) index stream is
bandwidth-local (SURVEY.md section 7 'unstructured gather/scatter
performance'). `rcm_reorder` renumbers vertices by reverse Cuthill-McKee on
the vertex adjacency (native C++ when available) and returns an
equivalently-numbered mesh plus the permutation for mapping fields.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .mesh import Mesh
from ..native import rcm_order


def vertex_adjacency_csr(mesh: Mesh) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric vertex-vertex adjacency (incl. self) in CSR."""
    nv = mesh.n_verts
    cells = mesh.cells
    k = cells.shape[1]
    pairs = []
    for i in range(k):
        for j in range(k):
            pairs.append(np.stack([cells[:, i], cells[:, j]], axis=1))
    e = np.unique(np.concatenate(pairs), axis=0)
    rowptr = np.zeros(nv + 1, dtype=np.int32)
    np.add.at(rowptr, e[:, 0] + 1, 1)
    rowptr = np.cumsum(rowptr).astype(np.int32)
    return rowptr, e[:, 1].astype(np.int32)


def bandwidth(mesh: Mesh) -> int:
    """Max |i - j| over cell-local vertex pairs."""
    c = mesh.cells
    return int(max(np.abs(c[:, i] - c[:, j]).max()
                   for i in range(c.shape[1]) for j in range(i)))


def rcm_reorder(mesh: Mesh) -> Tuple[Mesh, np.ndarray]:
    """Returns (reordered mesh, perm) with perm[new] = old; nodal fields
    map as f_new = f_old[perm]."""
    rowptr, colidx = vertex_adjacency_csr(mesh)
    perm = rcm_order(rowptr, colidx)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm), dtype=np.int32)
    new_mesh = Mesh(mesh.coords[perm], inv[mesh.cells])
    return new_mesh, perm
