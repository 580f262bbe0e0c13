"""Native C++ runtime components (with fallbacks) and RCM reordering."""

import base64

import numpy as np
import pytest

from fedm_tpu.native import (b64encode, b64encode_native, ilu0, ilu0_solve,
                             native_available, rcm_order)
from fedm_tpu.mesh import rectangle_mesh
from fedm_tpu.mesh.reorder import bandwidth, rcm_reorder, vertex_adjacency_csr


def test_native_builds():
    # g++ is in the image; the native path must actually build
    assert native_available()


def _csr_from_dense(A):
    n = A.shape[0]
    rowptr = [0]
    colidx, vals = [], []
    for i in range(n):
        for j in range(n):
            if A[i, j] != 0:
                colidx.append(j)
                vals.append(A[i, j])
        rowptr.append(len(colidx))
    return (np.asarray(rowptr, np.int32), np.asarray(colidx, np.int32),
            np.asarray(vals, float))


def test_ilu0_exact_for_full_pattern():
    # with a dense pattern ILU(0) == exact LU -> solve is exact
    rng = np.random.default_rng(0)
    A = rng.standard_normal((8, 8)) + 8 * np.eye(8)
    rowptr, colidx, vals = _csr_from_dense(A)
    fact = ilu0(rowptr, colidx, vals)
    b = rng.standard_normal(8)
    x = ilu0_solve(rowptr, colidx, fact, b)
    np.testing.assert_allclose(A @ x, b, atol=1e-10)


def test_ilu0_preconditioner_quality_sparse():
    # 1D Laplacian: ILU(0) == exact Cholesky-like factorisation
    n = 50
    A = np.zeros((n, n))
    for i in range(n):
        A[i, i] = 2.0
        if i > 0:
            A[i, i - 1] = -1.0
        if i < n - 1:
            A[i, i + 1] = -1.0
    rowptr, colidx, vals = _csr_from_dense(A)
    fact = ilu0(rowptr, colidx, vals)
    b = np.ones(n)
    x = ilu0_solve(rowptr, colidx, fact, b)
    np.testing.assert_allclose(A @ x, b, atol=1e-9)


def test_ilu0_zero_pivot_raises():
    A = np.array([[0.0, 1.0], [1.0, 0.0]])
    rowptr, colidx, vals = _csr_from_dense(A)
    with pytest.raises(ZeroDivisionError):
        ilu0(rowptr, colidx, vals)


def test_b64_matches_stdlib():
    for payload in [b"", b"a", b"ab", b"abc", bytes(range(256)) * 7]:
        assert b64encode(payload) == base64.b64encode(payload)
        assert b64encode_native(payload) == base64.b64encode(payload)


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
