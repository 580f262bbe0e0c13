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


def cell_adjacency_csr(mesh: Mesh) -> Tuple[np.ndarray, np.ndarray]:
    """Cell-cell adjacency (cells sharing a facet) in CSR — the dual graph
    DOLFIN hands to SCOTCH for mesh partitioning. Input to
    `native.partition_graph` for the shard_map domain decomposition."""
    cells = mesh.cells
    if mesh.dim == 1:
        facets = cells[:, :, None]  # each vertex is a facet
    else:
        local = np.array([[1, 2], [0, 2], [0, 1]])
        facets = np.sort(cells[:, local], axis=2)  # [n_cells, 3, 2]
    nf = facets.shape[1]
    flat = facets.reshape(-1, facets.shape[2])
    owner = np.repeat(np.arange(mesh.n_cells), nf)
    uniq, inv = np.unique(flat, axis=0, return_inverse=True)
    order = np.argsort(inv, kind="stable")
    inv_s, owner_s = inv[order], owner[order]
    # interior facets appear exactly twice -> one adjacency pair each
    is_pair = inv_s[:-1] == inv_s[1:]
    a, b = owner_s[:-1][is_pair], owner_s[1:][is_pair]
    e = np.concatenate([np.stack([a, b], 1), np.stack([b, a], 1)])
    e = e[np.lexsort((e[:, 1], e[:, 0]))]
    rowptr = np.zeros(mesh.n_cells + 1, dtype=np.int32)
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
