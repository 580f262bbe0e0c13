"""Matrix-free preconditioned Krylov solvers (jittable).

TPU has no sparse direct solver, so these replace the reference's default
MUMPS/PETSc-KSP path (`examples/glow_discharge/fedm-gd.py:32`,
`fedm/functions.py:1154-1161`, SURVEY.md "hard parts"). All solvers:

- operate matrix-free on arrays of any shape (dot products flatten),
- run under `jit` via `lax.while_loop` (dt-robust: a failed solve surfaces
  as a flag, never an exception — the adaptive driver reacts by shrinking
  dt, which is exactly the reference's failure semantics,
  `fedm/functions.py:1080-1100`),
- return `(x, relres, iters)`.

Under `shard_map` the dot products reduce over locally-sharded arrays;
with the round-1 replicated-state layout they need no explicit psum.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def _dot(a: Array, b: Array) -> Array:
    # accumulate inner products in f64 even for f32 fields (mixed-precision
    # design: f32 compute, f64 reductions — SURVEY.md 'hard parts').
    #
    # RANGE-SCALED (LAPACK dnrm2-style): on TPU, XLA emulates f64 as a
    # float32 pair, so its precision is ~2^-48 but its RANGE is still
    # float32's (~1e38). The raw log-form residuals legitimately reach
    # ~1e19-1e30 per entry; squaring them inside an unscaled reduction
    # overflows the emulation and returns NaN — measured as the hard
    # res0=NaN wall at ||F|| ~ 1.8e19 (= sqrt(f32 max)) that killed the
    # Bagheri bench at t = 1.045 ns. Normalising by the max magnitudes
    # keeps every intermediate O(n) regardless of field scale.
    acc = jnp.float64 if jax.config.jax_enable_x64 else a.dtype
    af = a.reshape(-1).astype(acc)
    bf = b.reshape(-1).astype(acc)
    sa = jnp.max(jnp.abs(af))
    sb = jnp.max(jnp.abs(bf))
    sa = jnp.where((sa > 0) & jnp.isfinite(sa), sa, 1.0)
    sb = jnp.where((sb > 0) & jnp.isfinite(sb), sb, 1.0)
    # ordering: never form sa*sb (can overflow the range even when the
    # result is representable), and multiply the SMALLER scale into the
    # O(n) normalised dot first — `vdot*s_max` could itself overflow when
    # s_max is near range-max and the other scale is tiny, even though the
    # final product is representable. With s_min first the intermediate is
    # at most n*s_min (s_max<1 case) or |result|/s_max <= |result|
    # (s_max>=1 case): never more than n above the true result.
    s_min = jnp.minimum(sa, sb)
    s_max = jnp.maximum(sa, sb)
    return s_max * (jnp.vdot(af / sa, bf / sb) * s_min)


def _norm(a: Array) -> Array:
    # NOT sqrt(_dot(a, a)): the intermediate sum-of-squares (~||a||^2) can
    # exceed the f32-pair range even when ||a|| itself is representable.
    acc = jnp.float64 if jax.config.jax_enable_x64 else a.dtype
    af = a.reshape(-1).astype(acc)
    sa = jnp.max(jnp.abs(af))
    sa = jnp.where((sa > 0) & jnp.isfinite(sa), sa, 1.0)
    an = af / sa
    return sa * jnp.sqrt(jnp.vdot(an, an))


def _acc_dtype(b: Array):
    return jnp.float64 if jax.config.jax_enable_x64 else b.dtype


def _tiny(acc) -> Array:
    """Breakdown threshold for rho/omega/denominator guards.

    On TPU the nominal f64 is an f32-pair emulation whose RANGE is still
    f32's (~1e+-38): a 1e-290 threshold silently underflows to 0.0 and
    breakdown detection NEVER fires — near-stagnation rho/omega then
    underflow and their ratios go 0/0 = NaN. This was the t = 1.125 ns
    Bagheri `linres=nan` (docs/STREAMER_STUDY.md): not the physics, a
    platform-blind constant. Pick the threshold by the backend's actual
    range floor.
    """
    if acc == jnp.float64 and jax.default_backend() not in ("tpu", "axon"):
        return jnp.asarray(1e-290, acc)
    return jnp.asarray(1e-32, acc)


def _identity(x: Array) -> Array:
    return x


def cg(matvec: Callable, b: Array, x0: Optional[Array] = None,
       precond: Optional[Callable] = None, tol: float = 1e-10,
       atol: float = 0.0, maxiter: int = 1000):
    """Preconditioned conjugate gradients for SPD operators.

    Returns (x, relative_residual, iterations).
    """
    M = precond or _identity
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    z = M(r)
    p = z
    rz = _dot(r, z)
    bnorm = jnp.maximum(_norm(b), 1e-300)
    target = jnp.maximum(tol * bnorm, atol)

    def cond(state):
        x, r, p, rz, k = state
        return (_norm(r) > target) & (k < maxiter)

    def body(state):
        x, r, p, rz, k = state
        Ap = matvec(p)
        alpha = (rz / _dot(p, Ap)).astype(x.dtype)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = _dot(r, z)
        beta = (rz_new / rz).astype(x.dtype)
        p = z + beta * p
        return x, r, p, rz_new, k + 1

    x, r, p, rz, k = lax.while_loop(cond, body, (x, r, p, rz, jnp.int32(0)))
    return x, _norm(r) / bnorm, k


def bicgstab(matvec: Callable, b: Array, x0: Optional[Array] = None,
             precond: Optional[Callable] = None, tol: float = 1e-8,
             atol: float = 0.0, maxiter: int = 1000,
             stall_window: int = 0, stall_factor: float = 0.99):
    """Right-preconditioned BiCGStab for general operators.

    Returns (x, relative_residual, iterations). Breakdown (rho or omega
    underflow) exits early; the caller checks `relres` for success.

    `stall_window > 0` enables plateau early-exit: if the residual norm
    fails to drop below `stall_factor * best_so_far` for `stall_window`
    consecutive iterations, the solve exits with the best relres seen.
    The reference's PETSc KSP keeps stalled solves cheap via bounded
    per-solve iterations; at 547k unknowns one stalled full-budget
    BiCGStab here costs ~23 s vs 2.2 s healthy (tools/fullgap_micro.py),
    so this cap is what keeps the sheath-phase s/step flat.
    """
    M = precond or _identity
    acc = _acc_dtype(b)
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    rhat = r
    rho = alpha = omega = jnp.asarray(1.0, acc)
    v = p = jnp.zeros_like(b)
    bnorm = jnp.maximum(_norm(b), 1e-300)
    target = jnp.maximum(tol * bnorm, atol)
    tiny = _tiny(acc)
    r0norm = _norm(r)
    window = jnp.int32(stall_window if stall_window > 0 else maxiter + 1)

    def cond(state):
        x, r, rnorm, rhat, rho, alpha, omega, v, p, k, broke, best, since \
            = state
        return ((rnorm > target) & (k < maxiter) & (~broke)
                & (since < window))

    def body(state):
        x, r, rnorm, rhat, rho, alpha, omega, v, p, k, broke, best, since \
            = state
        rho_new = _dot(rhat, r)
        breakdown = jnp.abs(rho_new) < tiny
        beta = (rho_new / jnp.where(breakdown, 1.0, rho)) * (
            alpha / jnp.where(jnp.abs(omega) < tiny, 1.0, omega)
        )
        p = r + beta.astype(x.dtype) * (p - omega.astype(x.dtype) * v)
        phat = M(p)
        v = matvec(phat)
        denom = _dot(rhat, v)
        breakdown |= jnp.abs(denom) < tiny
        alpha = rho_new / jnp.where(breakdown, 1.0, denom)
        s = r - alpha.astype(x.dtype) * v
        shat = M(s)
        t = matvec(shat)
        tt = _dot(t, t)
        omega = _dot(t, s) / jnp.where(tt < tiny, 1.0, tt)
        x = x + alpha.astype(x.dtype) * phat + omega.astype(x.dtype) * shat
        r = s - omega.astype(x.dtype) * t
        rnorm = _norm(r)
        improved = rnorm < stall_factor * best
        best = jnp.minimum(best, jnp.where(jnp.isfinite(rnorm), rnorm, best))
        since = jnp.where(improved, 0, since + 1)
        return (x, r, rnorm, rhat, rho_new, alpha, omega, v, p, k + 1,
                breakdown, best, since)

    init = (x, r, r0norm, rhat, rho, alpha, omega, v, p, jnp.int32(0),
            jnp.asarray(False), r0norm, jnp.int32(0))
    out = lax.while_loop(cond, body, init)
    x, rnorm, k = out[0], out[2], out[9]
    return x, rnorm / bnorm, k


def gmres(matvec: Callable, b: Array, x0: Optional[Array] = None,
          precond: Optional[Callable] = None, tol: float = 1e-8,
          atol: float = 0.0, maxiter: int = 1000, restart: int = 30,
          stall_window: int = 0, stall_factor: float = 0.99):
    """Restarted GMRES(m) with right preconditioning and Givens rotations.

    The reference's Krylov alternative to MUMPS is gmres+AMG
    (`examples/glow_discharge/fedm-gd.py:413`,
    `fedm/functions.py:1206`); here it is the robustness fallback when
    BiCGStab breaks down on nonsymmetric stiff systems. Right
    preconditioning keeps the monitored residual the TRUE residual, so
    the returned `relres` is directly comparable across solvers.

    Returns (x, relative_residual, iterations).

    `stall_window`/`stall_factor`: plateau early-exit (see `bicgstab`) —
    applied to the inner Arnoldi residual recurrence, plus a cycle-level
    stagnation exit (a full restart cycle improving the residual by less
    than 1 - stall_factor terminates the outer loop).
    """
    M = precond or _identity
    acc = _acc_dtype(b)
    m = restart
    window = jnp.int32(stall_window if stall_window > 0 else maxiter + 1)
    shape, n = b.shape, b.size
    x = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.maximum(_norm(b), 1e-300)
    target = jnp.maximum(tol * bnorm, atol)
    tiny = _tiny(acc)

    def arnoldi_cycle(x):
        r = b - matvec(x)
        beta = _norm(r)
        V = jnp.zeros((m + 1, n), b.dtype)
        V = V.at[0].set((r / jnp.maximum(beta, tiny).astype(r.dtype))
                        .reshape(-1))
        g = jnp.zeros(m + 1, acc).at[0].set(beta)
        H = jnp.zeros((m + 1, m), acc)
        cs = jnp.zeros(m, acc)
        sn = jnp.zeros(m, acc)

        def inner_cond(st):
            _, _, _, _, _, j, res, best, since = st
            return (j < m) & (res > target) & (since < window)

        def inner_body(st):
            V, H, g, cs, sn, j, _, best, since = st
            w = matvec(M(V[j].reshape(shape))).reshape(-1)

            # modified Gram-Schmidt against V[0..j] (masked full loop)
            def mgs(k, wh):
                w, hcol = wh
                hk = jnp.where(k <= j, _dot(V[k], w), 0.0)
                return w - hk.astype(w.dtype) * V[k], hcol.at[k].set(hk)

            w, hcol = lax.fori_loop(0, m + 1, mgs,
                                    (w, jnp.zeros(m + 1, acc)))
            hj1 = _norm(w)
            V = V.at[j + 1].set((w / jnp.maximum(hj1, tiny).astype(w.dtype)))
            hcol = hcol.at[j + 1].set(hj1)

            # previously accumulated Givens rotations
            def rot(k, hc):
                apply = k < j
                a0, a1 = hc[k], hc[k + 1]
                n0 = jnp.where(apply, cs[k] * a0 + sn[k] * a1, a0)
                n1 = jnp.where(apply, -sn[k] * a0 + cs[k] * a1, a1)
                return hc.at[k].set(n0).at[k + 1].set(n1)

            hcol = lax.fori_loop(0, m, rot, hcol)
            # new rotation zeroing hcol[j+1]
            denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
            safe = jnp.maximum(denom, tiny)
            c, s = hcol[j] / safe, hcol[j + 1] / safe
            cs, sn = cs.at[j].set(c), sn.at[j].set(s)
            hcol = hcol.at[j].set(denom).at[j + 1].set(0.0)
            H = H.at[:, j].set(hcol)
            g = g.at[j + 1].set(-s * g[j]).at[j].set(c * g[j])
            res = jnp.abs(g[j + 1])
            improved = res < stall_factor * best
            best = jnp.minimum(best, jnp.where(jnp.isfinite(res), res, best))
            since = jnp.where(improved, 0, since + 1)
            return V, H, g, cs, sn, j + 1, res, best, since

        V, H, g, cs, sn, j, res, _, _ = lax.while_loop(
            inner_cond, inner_body,
            (V, H, g, cs, sn, jnp.int32(0), beta, beta, jnp.int32(0)))

        # back substitution on the j x j system (masked to full m)
        Hd = H[:m, :m]
        diag = jnp.abs(jnp.diagonal(Hd))

        def back(i, y):
            k = m - 1 - i
            val = (g[k] - jnp.dot(Hd[k], y)) / jnp.where(
                diag[k] < tiny, 1.0, Hd[k, k])
            return y.at[k].set(jnp.where(k < j, val, 0.0))

        y = lax.fori_loop(0, m, back, jnp.zeros(m, acc))
        z = jnp.tensordot(y.astype(b.dtype), V[:m], axes=1).reshape(shape)
        return x + M(z), res, j

    check_cycles = stall_window > 0

    def cond(state):
        _, res, k, stagnant = state
        return (res > target) & (k < maxiter) & (~stagnant)

    def body(state):
        x, res_prev, k, _ = state
        x, res, j = arnoldi_cycle(x)
        stagnant = (jnp.asarray(check_cycles)
                    & (res >= stall_factor * res_prev))
        return x, res, k + j, stagnant

    r0 = _norm(b - matvec(x))
    x, res, k, _ = lax.while_loop(
        cond, body, (x, r0, jnp.int32(0), jnp.asarray(False)))
    return x, res / bnorm, k
