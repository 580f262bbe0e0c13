"""Native runtime components (C++ via ctypes) with pure-Python fallbacks.

Builds `fedm_native.cpp` on first use (g++ -O3 -shared); if no compiler is
available every entry point falls back to a numpy/scipy implementation, so
the package works everywhere and gets faster where it can. The shared
object is never committed — it is always compiled from source on the host
that runs it.

Components (both wired into product paths):
- `rcm_order` — reverse Cuthill-McKee, used for dof-locality renumbering
  (`fedm_tpu.mesh.reorder`) and as the seed ordering for partitioning;
- `partition_graph` — greedy graph-growing mesh partitioner, the
  setup-time counterpart of DOLFIN's native SCOTCH partitioning (the
  reference's `mpirun -np N` launch distributes the mesh inside DOLFIN
  C++; SURVEY.md section 2.3). Used by `fedm_tpu.parallel.dd` to build
  the shard_map domain decomposition.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "fedm_native.cpp"
_SO = _DIR / "fedm_native.so"

_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(_SO)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_SO))
        ip = ctypes.POINTER(ctypes.c_int)
        lib.rcm_order.argtypes = [ctypes.c_int, ip, ip, ip]
        lib.partition_graph.argtypes = [ctypes.c_int, ip, ip, ctypes.c_int,
                                        ip]
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def native_available() -> bool:
    return _load() is not None


def rcm_order(rowptr: np.ndarray, colidx: np.ndarray) -> np.ndarray:
    """Reverse Cuthill-McKee permutation of a CSR adjacency; returns perm
    with perm[new] = old."""
    n = len(rowptr) - 1
    rowptr = np.ascontiguousarray(rowptr, dtype=np.int32)
    colidx = np.ascontiguousarray(colidx, dtype=np.int32)
    lib = _load()
    if lib is not None:
        perm = np.empty(n, dtype=np.int32)
        lib.rcm_order(n, _iptr(rowptr), _iptr(colidx), _iptr(perm))
        return perm
    # fallback: scipy
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    A = csr_matrix((np.ones(len(colidx)), colidx, rowptr), shape=(n, n))
    return np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True),
                      dtype=np.int32)


def partition_graph(rowptr: np.ndarray, colidx: np.ndarray,
                    n_parts: int) -> np.ndarray:
    """Balanced greedy graph-growing partition of a CSR graph.

    Returns part[n] in [0, n_parts) with part sizes differing by at most
    one; parts are grown breadth-first with a max-gain frontier so
    boundaries (the halo traffic of the domain decomposition) stay short.
    """
    n = len(rowptr) - 1
    if n_parts <= 1:
        return np.zeros(n, dtype=np.int32)
    rowptr = np.ascontiguousarray(rowptr, dtype=np.int32)
    colidx = np.ascontiguousarray(colidx, dtype=np.int32)
    lib = _load()
    if lib is not None:
        part = np.empty(n, dtype=np.int32)
        lib.partition_graph(n, _iptr(rowptr), _iptr(colidx), n_parts,
                            _iptr(part))
        return part
    # fallback: contiguous slabs of the RCM ordering (connected, balanced,
    # slightly longer boundaries than the gain-driven C++ growth)
    perm = rcm_order(rowptr, colidx)  # perm[new] = old
    part = np.empty(n, dtype=np.int32)
    sizes = np.full(n_parts, n // n_parts, dtype=np.int64)
    sizes[: n % n_parts] += 1
    bounds = np.concatenate([[0], np.cumsum(sizes)])
    for p in range(n_parts):
        part[perm[bounds[p]:bounds[p + 1]]] = p
    return part
