"""Native runtime components (C++ via ctypes) with pure-Python fallbacks.

Builds `fedm_native.cpp` on first use (g++ -O3 -shared); if no compiler is
available every entry point falls back to a numpy/scipy implementation, so
the package works everywhere and gets faster where it can.
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
        dp = ctypes.POINTER(ctypes.c_double)
        up = ctypes.POINTER(ctypes.c_uint8)
        lib.rcm_order.argtypes = [ctypes.c_int, ip, ip, ip]
        lib.ilu0.argtypes = [ctypes.c_int, ip, ip, dp]
        lib.ilu0.restype = ctypes.c_int
        lib.ilu0_solve.argtypes = [ctypes.c_int, ip, ip, dp, dp, dp]
        lib.b64_encode.argtypes = [up, ctypes.c_long,
                                   ctypes.POINTER(ctypes.c_char)]
        lib.b64_encode.restype = ctypes.c_long
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


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


def ilu0(rowptr, colidx, vals) -> np.ndarray:
    """ILU(0) factorisation of a CSR matrix (sorted columns, diagonal
    present); returns the factored values array (L unit-lower in the strict
    lower part, U in the upper incl. diagonal)."""
    n = len(rowptr) - 1
    rowptr = np.ascontiguousarray(rowptr, dtype=np.int32)
    colidx = np.ascontiguousarray(colidx, dtype=np.int32)
    vals = np.array(vals, dtype=np.float64)
    lib = _load()
    if lib is not None:
        rc = lib.ilu0(n, _iptr(rowptr), _iptr(colidx), _dptr(vals))
        if rc != 0:
            raise ZeroDivisionError(f"ILU(0): zero pivot in row {rc - 1}")
        return vals
    # fallback: pure python (slow; fine for tests)
    diag = {}
    for i in range(n):
        for k in range(rowptr[i], rowptr[i + 1]):
            if colidx[k] == i:
                diag[i] = k
    for i in range(n):
        pos = {colidx[k]: k for k in range(rowptr[i], rowptr[i + 1])}
        for k in range(rowptr[i], rowptr[i + 1]):
            j = colidx[k]
            if j >= i:
                break
            piv = vals[diag[j]]
            if piv == 0.0:
                raise ZeroDivisionError(f"ILU(0): zero pivot in row {j}")
            lij = vals[k] / piv
            vals[k] = lij
            for kk in range(diag[j] + 1, rowptr[j + 1]):
                p = pos.get(colidx[kk])
                if p is not None:
                    vals[p] -= lij * vals[kk]
    return vals


def ilu0_solve(rowptr, colidx, vals, b) -> np.ndarray:
    """Apply the ILU(0) preconditioner: solve (L+I) U x = b."""
    n = len(rowptr) - 1
    rowptr = np.ascontiguousarray(rowptr, dtype=np.int32)
    colidx = np.ascontiguousarray(colidx, dtype=np.int32)
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    lib = _load()
    x = np.empty_like(b)
    if lib is not None:
        lib.ilu0_solve(n, _iptr(rowptr), _iptr(colidx), _dptr(vals),
                       _dptr(b), _dptr(x))
        return x
    diag = np.zeros(n, dtype=np.int64)
    for i in range(n):
        for k in range(rowptr[i], rowptr[i + 1]):
            if colidx[k] == i:
                diag[i] = k
    for i in range(n):
        s = b[i]
        for k in range(rowptr[i], diag[i]):
            s -= vals[k] * x[colidx[k]]
        x[i] = s
    for i in range(n - 1, -1, -1):
        s = x[i]
        for k in range(diag[i] + 1, rowptr[i + 1]):
            s -= vals[k] * x[colidx[k]]
        x[i] = s / vals[diag[i]]
    return x


def b64encode(data: bytes) -> bytes:
    """base64. Measured on this image the stdlib (SIMD C) encoder beats the
    scalar native one ~2x, so it is the default; `b64encode_native`
    remains for testing the C path."""
    import base64

    return base64.b64encode(data)


def b64encode_native(data: bytes) -> bytes:
    lib = _load()
    if lib is None:
        return b64encode(data)
    arr = np.frombuffer(data, dtype=np.uint8)
    out = ctypes.create_string_buffer(4 * ((len(arr) + 2) // 3) + 1)
    length = lib.b64_encode(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(arr), out)
    return out.raw[:length]
