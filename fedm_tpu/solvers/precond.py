"""Small-block inversion utilities for the node-block Jacobi preconditioner.

`jnp.linalg.inv` lowers to LuDecomposition, which the TPU compiler only
implements for f32/c64; the coupled plasma system wants f64 blocks. The
species block per node is tiny (n_eq <= ~8), so closed-form adjugates
(k <= 3) and an unrolled Gauss-Jordan with partial pivoting (k > 3) are
both faster and fully portable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def invert_blocks(A: Array, reg: float = 0.0) -> Array:
    """Invert a batch of small matrices A [n, k, k] elementwise-vectorised.

    reg: optional Tikhonov diagonal added before inversion (guards against
    exactly singular blocks on untouched dofs).
    """
    k = A.shape[-1]
    if reg:
        A = A + reg * jnp.eye(k, dtype=A.dtype)
    # per-block magnitude normalisation: cofactors/determinants form
    # products of 2-3 entries, and block entries of the stiff log-form
    # system reach ~1e13+ — products overflow TPU's range-limited f64
    # emulation (see solvers.linear._dot). inv(A) = inv(A/s)/s is exact.
    s = jnp.max(jnp.abs(A), axis=(-2, -1), keepdims=True)
    s = jnp.where((s > 0) & jnp.isfinite(s), s, 1.0)
    A = A / s
    if k == 1:
        return (1.0 / A) / s
    if k == 2:
        a, b = A[:, 0, 0], A[:, 0, 1]
        c, d = A[:, 1, 0], A[:, 1, 1]
        det = a * d - b * c
        inv = jnp.stack(
            [jnp.stack([d, -b], -1), jnp.stack([-c, a], -1)], -2
        )
        return inv / det[:, None, None] / s
    if k == 3:
        a = A
        c00 = a[:, 1, 1] * a[:, 2, 2] - a[:, 1, 2] * a[:, 2, 1]
        c01 = a[:, 1, 2] * a[:, 2, 0] - a[:, 1, 0] * a[:, 2, 2]
        c02 = a[:, 1, 0] * a[:, 2, 1] - a[:, 1, 1] * a[:, 2, 0]
        c10 = a[:, 0, 2] * a[:, 2, 1] - a[:, 0, 1] * a[:, 2, 2]
        c11 = a[:, 0, 0] * a[:, 2, 2] - a[:, 0, 2] * a[:, 2, 0]
        c12 = a[:, 0, 1] * a[:, 2, 0] - a[:, 0, 0] * a[:, 2, 1]
        c20 = a[:, 0, 1] * a[:, 1, 2] - a[:, 0, 2] * a[:, 1, 1]
        c21 = a[:, 0, 2] * a[:, 1, 0] - a[:, 0, 0] * a[:, 1, 2]
        c22 = a[:, 0, 0] * a[:, 1, 1] - a[:, 0, 1] * a[:, 1, 0]
        det = a[:, 0, 0] * c00 + a[:, 0, 1] * c01 + a[:, 0, 2] * c02
        adj = jnp.stack(
            [
                jnp.stack([c00, c10, c20], -1),
                jnp.stack([c01, c11, c21], -1),
                jnp.stack([c02, c12, c22], -1),
            ],
            -2,
        )
        return adj / det[:, None, None] / s

    # general small k: Gauss-Jordan with partial pivoting, unrolled over k
    n = A.shape[0]
    M = jnp.concatenate(
        [A, jnp.broadcast_to(jnp.eye(k, dtype=A.dtype), A.shape)], axis=-1
    )  # [n, k, 2k]
    rows = jnp.arange(n)
    for col in range(k):
        sub = jnp.abs(M[:, col:, col])
        p = col + jnp.argmax(sub, axis=1)  # [n] pivot row per batch
        pivot_row = M[rows, p]  # [n, 2k]
        M = M.at[rows, p].set(M[:, col])
        M = M.at[:, col].set(pivot_row / pivot_row[:, col : col + 1])
        factors = M[:, :, col].at[:, col].set(0.0)  # [n, k]
        M = M - factors[:, :, None] * M[:, col][:, None, :]
    return M[:, :, k:] / s


def block_apply(inv_blocks: Array, r: Array) -> Array:
    """Apply M^-1 r for block-diagonal M: [n, k, k] x [n, k] -> [n, k]."""
    return jnp.einsum("nij,nj->ni", inv_blocks, r)
