"""Native C++ runtime components (with fallbacks): RCM reordering and the
greedy graph-growing mesh partitioner that feeds the domain decomposition."""

import numpy as np

from fedm_tpu.native import native_available, partition_graph, rcm_order
from fedm_tpu.mesh import rectangle_mesh
from fedm_tpu.mesh.reorder import (bandwidth, cell_adjacency_csr, rcm_reorder,
                                   vertex_adjacency_csr)


def test_native_builds():
    # g++ is in the image; the native path must actually build
    assert native_available()


def test_rcm_reduces_bandwidth():
    mesh = rectangle_mesh((0, 0), (1, 1), 20, 20, "crossed")
    # scramble numbering to make it bad
    rng = np.random.default_rng(1)
    perm = rng.permutation(mesh.n_verts).astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm), dtype=np.int32)
    from fedm_tpu.mesh import Mesh

    scrambled = Mesh(mesh.coords[perm], inv[mesh.cells])
    bw0 = bandwidth(scrambled)
    reordered, p = rcm_reorder(scrambled)
    bw1 = bandwidth(reordered)
    assert bw1 < bw0 / 5
    # permutation is a bijection and geometry is preserved
    assert sorted(p.tolist()) == list(range(mesh.n_verts))
    x = scrambled.coords[:, 0]
    np.testing.assert_allclose(np.sort(reordered.coords[:, 0]), np.sort(x))
    # cell areas unchanged
    def areas(m):
        xx = m.coords[m.cells]
        v1, v2 = xx[:, 1] - xx[:, 0], xx[:, 2] - xx[:, 0]
        return np.sort(0.5 * np.abs(v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0]))
    np.testing.assert_allclose(areas(reordered), areas(scrambled))


def test_rcm_perm_valid_on_interval():
    from fedm_tpu.mesh import interval_mesh

    m = interval_mesh(10, 0, 1)
    rowptr, colidx = vertex_adjacency_csr(m)
    perm = rcm_order(rowptr, colidx)
    assert sorted(perm.tolist()) == list(range(11))


def _check_partition(mesh, part, n_parts):
    n = mesh.n_cells
    sizes = np.bincount(part, minlength=n_parts)
    assert sizes.sum() == n
    # balanced to within one cell
    assert sizes.max() - sizes.min() <= 1
    assert part.min() >= 0 and part.max() < n_parts


def _edge_cut(rowptr, colidx, part):
    cut = 0
    for i in range(len(rowptr) - 1):
        for k in range(rowptr[i], rowptr[i + 1]):
            j = colidx[k]
            if j > i and part[i] != part[j]:
                cut += 1
    return cut


def test_partition_balanced_and_local():
    mesh = rectangle_mesh((0, 0), (1, 1), 24, 24, "crossed")
    rowptr, colidx = cell_adjacency_csr(mesh)
    for n_parts in (2, 4, 8):
        part = partition_graph(rowptr, colidx, n_parts)
        _check_partition(mesh, part, n_parts)
        # locality: the edge cut must beat a random partition by a lot
        rng = np.random.default_rng(0)
        rand = rng.integers(0, n_parts, mesh.n_cells).astype(np.int32)
        assert (_edge_cut(rowptr, colidx, part)
                < 0.25 * _edge_cut(rowptr, colidx, rand))


def test_partition_single_part():
    mesh = rectangle_mesh((0, 0), (1, 1), 4, 4)
    rowptr, colidx = cell_adjacency_csr(mesh)
    part = partition_graph(rowptr, colidx, 1)
    assert (part == 0).all()


def test_partition_fallback_matches_contract():
    # the pure-python fallback (RCM slabs) obeys the same balance contract
    from fedm_tpu import native

    mesh = rectangle_mesh((0, 0), (1, 1), 10, 10)
    rowptr, colidx = cell_adjacency_csr(mesh)
    lib, native._lib, native._build_failed = native._lib, None, True
    try:
        part = partition_graph(rowptr, colidx, 4)
    finally:
        native._lib, native._build_failed = lib, False
    _check_partition(mesh, part, 4)
