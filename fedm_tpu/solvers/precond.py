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


def invert_blocks(A: Array, reg: float = 0.0, with_count: bool = False):
    """Invert a batch of small matrices A [n, k, k] elementwise-vectorised.

    reg: optional Tikhonov diagonal added before inversion (guards against
    exactly singular blocks on untouched dofs).
    with_count: also return the number of blocks whose inverse came out
    non-finite and was replaced by the Jacobi fallback (see `_guard`) —
    the expected steady state is 0-to-a-handful (underflowed far-field
    nodes); a systematic count is an assembly-defect signal that the
    silent fallback would otherwise mask (round-2 advisor finding).
    Exposed to runs via `CoupledSystem.guarded_block_count`.
    """
    k = A.shape[-1]
    if reg:
        A = A + reg * jnp.eye(k, dtype=A.dtype)
    A_orig = A

    def _guard(inv):
        # Structurally singular blocks (a zero COLUMN: e.g. a log-density
        # dof whose e^u underflowed to exactly 0 — no equation determines
        # its increment) yield det = 0 and a NaN adjugate/elimination
        # result, which then poisons every Krylov vector (measured as the
        # linres=NaN dt_min death at t = 1.597 ns in the Bagheri run).
        # Fall back to the diagonal (Jacobi) pseudo-inverse for those
        # blocks, with unit action on dead rows.
        ok = jnp.isfinite(inv).all(axis=(-2, -1), keepdims=True)
        d = jnp.diagonal(A_orig, axis1=-2, axis2=-1)
        dinv = jnp.where((jnp.abs(d) > 0) & jnp.isfinite(d), 1.0 / d, 1.0)
        fb = dinv[..., :, None] * jnp.eye(k, dtype=A_orig.dtype)
        out = jnp.where(ok, inv, fb)
        if with_count:
            return out, (~ok).sum()
        return out
    # Per-ROW equilibration (then the adjugate/Gauss-Jordan below runs on
    # O(1) entries): the coupled blocks mix rows of wildly different
    # physical scale — a density row is vol*n/dt ~ 1e19..1e30 at a
    # developed streamer front while the Poisson row is O(1) stiffness.
    # A single whole-block normalisation (the round-3 code) leaves the
    # small rows ~1e-20..1e-30 after division, and the 2-3-entry cofactor
    # products underflow/overflow TPU's range-limited arithmetic (f32 AND
    # the f32-pair "f64" emulation share ~1e+-38) — the preconditioner
    # silently turns singular/NaN exactly where the physics stiffens,
    # which is the measured t = 1.13 ns Bagheri wall (linres=NaN in both
    # precisions; docs/STREAMER_STUDY.md). Row equilibration is exact:
    # inv(D^-1 A) = inv(A) D, so inv(A) = inv(D^-1 A) D^-1 — applied as a
    # column scaling of the computed inverse.
    s = jnp.max(jnp.abs(A), axis=-1, keepdims=True)  # [n, k, 1] row maxes
    s = jnp.where((s > 0) & jnp.isfinite(s), s, 1.0)
    A = A / s
    s = jnp.swapaxes(s, -2, -1)  # inv columns j scale by 1/row_max_j
    if k == 1:
        return _guard((1.0 / A) / s)
    if k == 2:
        a, b = A[:, 0, 0], A[:, 0, 1]
        c, d = A[:, 1, 0], A[:, 1, 1]
        det = a * d - b * c
        inv = jnp.stack(
            [jnp.stack([d, -b], -1), jnp.stack([-c, a], -1)], -2
        )
        return _guard(inv / det[:, None, None] / s)
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
        return _guard(adj / det[:, None, None] / s)

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
    return _guard(M[:, :, k:] / s)


def block_apply(inv_blocks: Array, r: Array) -> Array:
    """Apply M^-1 r for block-diagonal M: [n, k, k] x [n, k] -> [n, k]."""
    return jnp.einsum("nij,nj->ni", inv_blocks, r)
