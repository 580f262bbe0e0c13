import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fedm_tpu.solvers.linear import cg, bicgstab
from fedm_tpu.solvers.newton import newton_krylov, NewtonConfig
from fedm_tpu.solvers.precond import invert_blocks, block_apply


def _spd_system(n=50, seed=0):
    rng = np.random.default_rng(seed)
    B = rng.standard_normal((n, n))
    A = B @ B.T + n * np.eye(n)
    b = rng.standard_normal(n)
    return jnp.asarray(A), jnp.asarray(b)


def test_cg_solves_spd():
    A, b = _spd_system()
    x, relres, iters = cg(lambda v: A @ v, b, tol=1e-12)
    assert float(relres) < 1e-11
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), rtol=1e-9)


def test_bicgstab_solves_nonsymmetric():
    rng = np.random.default_rng(1)
    n = 40
    A = jnp.asarray(rng.standard_normal((n, n)) + n * np.eye(n))
    b = jnp.asarray(rng.standard_normal(n))
    x, relres, iters = bicgstab(lambda v: A @ v, b, tol=1e-12)
    assert float(relres) < 1e-10


def test_preconditioner_reduces_iterations():
    rng = np.random.default_rng(2)
    n = 200
    d = jnp.asarray(10.0 ** rng.uniform(-3, 3, n))  # badly scaled diagonal
    A = jnp.diag(d) + 0.01 * jnp.asarray(rng.standard_normal((n, n)))
    b = jnp.ones(n)
    _, r0, k0 = bicgstab(lambda v: A @ v, b, tol=1e-10, maxiter=5000)
    _, r1, k1 = bicgstab(lambda v: A @ v, b, precond=lambda r: r / d,
                         tol=1e-10, maxiter=5000)
    assert int(k1) < int(k0)


@pytest.mark.parametrize("k", [1, 2, 3, 5])
def test_invert_blocks(k):
    rng = np.random.default_rng(3)
    A = rng.standard_normal((30, k, k)) + 3 * np.eye(k)
    inv = invert_blocks(jnp.asarray(A))
    prod = np.einsum("nij,njk->nik", np.asarray(inv), A)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(k), prod.shape),
                               atol=1e-10)
    r = rng.standard_normal((30, k))
    np.testing.assert_allclose(
        np.asarray(block_apply(inv, jnp.asarray(r))),
        np.einsum("nij,nj->ni", np.asarray(inv), r), atol=1e-12)


def test_newton_krylov_scalar_roots():
    # F(u) = u^2 - a elementwise; root sqrt(a)
    a = jnp.asarray([[4.0], [9.0], [2.0]])

    def F(u):
        return u * u - a

    u0 = jnp.ones_like(a) * 3.0
    u, info = newton_krylov(F, u0, NewtonConfig(rtol=1e-12, linear_tol=1e-12))
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(u), np.sqrt(np.asarray(a)), rtol=1e-8)


def test_newton_reports_failure_as_flag():
    # F(u) = exp(u) + 1 has no root; must flag, not raise
    def F(u):
        return jnp.exp(u) + 1.0

    u0 = jnp.zeros((4, 1))
    u, info = newton_krylov(F, u0, NewtonConfig(rtol=1e-12, max_iter=8))
    assert not bool(info.converged)
    assert np.isfinite(float(info.res_norm)) or True  # no exception raised


def test_gmres_nonsymmetric_dense():
    # nonsymmetric well-conditioned system: GMRES must hit the tolerance
    rng = np.random.default_rng(3)
    n = 40
    A = np.eye(n) * 4.0 + 0.5 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    from fedm_tpu.solvers.linear import gmres

    x, relres, k = gmres(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                         tol=1e-10, maxiter=200, restart=15)
    assert float(relres) < 1e-9
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                               rtol=1e-7)


def test_gmres_restart_smaller_than_n_converges():
    # 1D advection-diffusion (nonsymmetric tridiagonal), restart << n
    n = 120
    A = (np.diag(np.full(n, 2.5)) + np.diag(np.full(n - 1, -1.5), -1)
         + np.diag(np.full(n - 1, -0.5), 1))
    b = np.ones(n)
    from fedm_tpu.solvers.linear import gmres

    x, relres, k = gmres(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                         tol=1e-9, maxiter=600, restart=20)
    assert float(relres) < 1e-8
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                               rtol=1e-6)


def test_gmres_right_preconditioning_reduces_iterations():
    rng = np.random.default_rng(5)
    n = 80
    d = np.linspace(1.0, 1e4, n)  # badly scaled diagonal
    A = np.diag(d) + rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    from fedm_tpu.solvers.linear import gmres

    mv = lambda v: jnp.asarray(A) @ v
    dj = jnp.asarray(d)
    _, r_plain, k_plain = gmres(mv, jnp.asarray(b), tol=1e-8,
                                maxiter=400, restart=25)
    x, r_pc, k_pc = gmres(mv, jnp.asarray(b), precond=lambda v: v / dj,
                          tol=1e-8, maxiter=400, restart=25)
    assert float(r_pc) < 1e-7
    assert int(k_pc) < int(k_plain)
    # right preconditioning: relres is the TRUE residual
    res = np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b)
    np.testing.assert_allclose(res, float(r_pc), rtol=1e-3, atol=1e-12)


def test_bicgstab_breakdown_falls_back_to_gmres():
    # the 2x2 rotation is a textbook BiCGStab hard breakdown:
    # rhat.(A p) = 0 on the first iteration
    A = jnp.asarray([[0.0, 1.0], [-1.0, 0.0]])
    b = jnp.asarray([1.0, 0.0])
    from fedm_tpu.solvers.linear import bicgstab, gmres

    _, relres_b, _ = bicgstab(lambda v: A @ v, b, tol=1e-10, maxiter=50)
    assert float(relres_b) > 1e-3  # BiCGStab really does break down here
    _, relres_g, _ = gmres(lambda v: A @ v, b, tol=1e-10, maxiter=50,
                           restart=2)
    assert float(relres_g) < 1e-9

    # Newton on the linear residual with the default bicgstab solver must
    # still converge via the lax.cond GMRES fallback
    def F(u):
        return A @ u - b

    u, info = newton_krylov(
        F, jnp.zeros(2),
        NewtonConfig(rtol=1e-10, linear_tol=1e-10, gmres_fallback=True),
        precond_builder=lambda u: (lambda r: r))
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(u), [0.0, 1.0], atol=1e-8)


def test_newton_gmres_solver_option():
    a = jnp.asarray([[4.0], [9.0], [2.0]])

    def F(u):
        return u * u - a

    u, info = newton_krylov(
        F, jnp.ones_like(a) * 3.0,
        NewtonConfig(rtol=1e-12, linear_tol=1e-12, linear_solver="gmres"))
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(u), np.sqrt(np.asarray(a)),
                               rtol=1e-8)


def test_dot_and_norm_are_range_scaled():
    """TPU emulates f64 as a float32 pair: same precision, f32 RANGE.
    _dot/_norm must therefore never square raw magnitudes (the log-form
    residuals legitimately reach 1e19-1e30 per entry). The scaled forms
    must agree with numpy's true-f64 result for huge and tiny fields."""
    import numpy as np
    import jax.numpy as jnp
    from fedm_tpu.solvers.linear import _dot, _norm

    rng = np.random.default_rng(0)
    for scale in (1e30, 1e19, 1.0, 1e-30, 0.0):
        a = (rng.standard_normal(512) * scale).astype(np.float32)
        b = (rng.standard_normal(512) * scale).astype(np.float32)
        np.testing.assert_allclose(float(_dot(jnp.asarray(a), jnp.asarray(b))),
                                   np.vdot(a.astype(np.float64),
                                           b.astype(np.float64)),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(_norm(jnp.asarray(a))),
                                   np.linalg.norm(a.astype(np.float64)),
                                   rtol=1e-6)


def test_invert_blocks_is_scale_invariant():
    """Determinants/cofactors must not overflow for ~1e13-scale stiff
    blocks (products of 3 entries exceed the TPU f64-emulation range)."""
    import numpy as np
    import jax.numpy as jnp
    from fedm_tpu.solvers.precond import invert_blocks

    rng = np.random.default_rng(1)
    for k in (1, 2, 3, 5):
        base = rng.standard_normal((7, k, k)) + 3.0 * np.eye(k)
        for scale in (1e13, 1.0, 1e-13):
            A = jnp.asarray(base * scale)
            inv = np.asarray(invert_blocks(A))
            for i in range(7):
                np.testing.assert_allclose(
                    inv[i] @ (base[i] * scale), np.eye(k),
                    rtol=1e-8, atol=1e-8)


def test_invert_blocks_mixed_row_scales_f32():
    """Streamer-front node blocks mix density rows ~1e21 with O(1)
    Poisson rows; whole-block normalisation left cofactor products
    underflowing f32 range (the t=1.13 ns wall). Per-row equilibration
    must keep the f32 inverse accurate."""
    from fedm_tpu.solvers.precond import invert_blocks

    rng = np.random.default_rng(7)
    n = 64
    base = rng.standard_normal((n, 3, 3)) + 3.0 * np.eye(3)
    # row scales spanning 21 orders of magnitude (density, density, phi)
    scales = np.array([1e21, 5e20, 1.0])
    A = base * scales[None, :, None]
    inv_f32 = np.asarray(invert_blocks(jnp.asarray(A, jnp.float32)),
                         np.float64)
    inv_ref = np.linalg.inv(A)
    assert np.isfinite(inv_f32).all()
    # elementwise relative error vs the f64 inverse, scale-aware
    err = np.abs(inv_f32 - inv_ref) / (np.abs(inv_ref) + 1e-300)
    assert np.median(err) < 1e-5
    assert err.max() < 1e-2


def test_invert_blocks_extreme_rows_finite_f32():
    """At 55 e-folds of electron density the row scales reach ~1e30;
    the inverse must stay finite and usable in f32."""
    from fedm_tpu.solvers.precond import block_apply, invert_blocks

    rng = np.random.default_rng(11)
    n = 16
    base = rng.standard_normal((n, 3, 3)) + 3.0 * np.eye(3)
    scales = np.array([1e30, 1e28, 1.0])
    A = base * scales[None, :, None]
    inv = invert_blocks(jnp.asarray(A, jnp.float32))
    assert np.isfinite(np.asarray(inv)).all()
    r = rng.standard_normal((n, 3)) * np.array([1e30, 1e28, 1.0])
    y = np.asarray(block_apply(inv, jnp.asarray(r, jnp.float32)),
                   np.float64)
    # A y ~= r to f32 accuracy, row-relative
    res = np.abs(np.einsum("nij,nj->ni", A, y) - r) / np.abs(r).max(1)[:, None]
    assert res.max() < 1e-4


def test_newton_stall_acceptance_noise_floor():
    """accept_reduction: a residual with an irreducible floor (the model of
    f32 assembly cancellation noise, which is MESH-dependent — res0/800 at
    dz=2e-5 vs res0/224 at dz=1e-5 on the Bagheri corridor meshes) stalls
    Newton; strict rtol then flags failure, while accept_reduction accepts
    the stalled-at-floor iterate once it has reduced ||F|| enough."""
    floor = 1e-4

    def F(u):
        # |F| >= floor everywhere; autodiff sees only the smooth part
        bias = jnp.where(u >= 0, floor, -floor)
        return u + jax.lax.stop_gradient(bias)

    u0 = jnp.full((4, 1), 2.0)
    u, info = newton_krylov(F, u0, NewtonConfig(rtol=1e-10, max_iter=20))
    assert not bool(info.converged)  # strict rtol dead-stalls at the floor
    u, info = newton_krylov(
        F, u0, NewtonConfig(rtol=1e-10, max_iter=20, accept_reduction=1e-2))
    assert bool(info.converged)
    assert float(info.res_norm) <= 1e-2 * float(info.res0_norm)


def test_invert_blocks_singular_guard():
    """A structurally singular block (zero column — e.g. a log-density dof
    whose e^u underflowed to exactly 0) must not produce NaN: the guard
    falls back to the diagonal pseudo-inverse for that block with unit
    action on the dead row, leaving healthy blocks exact."""
    rng = np.random.default_rng(7)
    A = rng.standard_normal((4, 3, 3)) + 3 * np.eye(3)
    A[2, :, 0] = 0.0  # dead column: no equation determines dof 0
    inv = np.asarray(invert_blocks(jnp.asarray(A)))
    assert np.isfinite(inv).all()
    for i in (0, 1, 3):
        np.testing.assert_allclose(inv[i] @ A[i], np.eye(3), atol=1e-10)
    # the singular block's fallback is diag(A)^-1 (dead diag -> 1.0)
    d = np.diag(A[2]).copy()
    expect = np.diag(np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 1.0))
    np.testing.assert_allclose(inv[2], expect, atol=1e-12)


def test_krylov_stall_window_early_exit():
    """Stall-aware inner budget (NewtonConfig.linear_stall_window): a
    plateaued Krylov solve exits within ~stall_window iterations of the
    plateau instead of burning the full maxiter — the reference's PETSc
    KSP keeps stalled-solve cost flat the same way (bounded per-solve
    iterations). Singular operator with b outside the range => the
    residual cannot reach tol, so without the window both solvers grind
    to maxiter."""
    from fedm_tpu.solvers.linear import gmres

    rng = np.random.default_rng(3)
    n = 60
    d = np.ones(n)
    d[-1] = 0.0  # null space: last equation is 0 = b[-1] != 0
    B = rng.standard_normal((n, n))
    A = jnp.asarray(np.diag(d) @ (B @ B.T + n * np.eye(n)))
    b = jnp.asarray(rng.standard_normal(n))
    _, r0, k0 = bicgstab(lambda v: A @ v, b, tol=1e-12, maxiter=2000)
    assert int(k0) == 2000  # burns the whole budget
    _, r1, k1 = bicgstab(lambda v: A @ v, b, tol=1e-12, maxiter=2000,
                         stall_window=20)
    assert int(k1) < 60  # exits shortly after the plateau is detected
    # the early exit must not degrade the achieved residual materially
    assert float(r1) < max(2.0 * float(r0), 0.5)
    _, g0, j0 = gmres(lambda v: A @ v, b, tol=1e-12, maxiter=2000,
                      restart=30)
    _, g1, j1 = gmres(lambda v: A @ v, b, tol=1e-12, maxiter=2000,
                      restart=30, stall_window=20)
    assert int(j0) >= 2000 and int(j1) < 90


def test_krylov_stall_window_inactive_on_healthy_solve():
    """With the window enabled, a converging solve is bit-identical to
    the window-off solver (the guard only observes)."""
    rng = np.random.default_rng(3)
    n = 60
    B = rng.standard_normal((n, n))
    A = jnp.asarray(B @ B.T + n * np.eye(n))
    b = jnp.asarray(rng.standard_normal(n))
    x0, r0, k0 = bicgstab(lambda v: A @ v, b, tol=1e-10, stall_window=0)
    x1, r1, k1 = bicgstab(lambda v: A @ v, b, tol=1e-10, stall_window=20)
    assert int(k0) == int(k1)
    np.testing.assert_array_equal(np.asarray(x0), np.asarray(x1))


def test_delta_clip_rescues_overflowing_log_update():
    """Per-component trust clamp (NewtonConfig.delta_clip): the 13.67 ns
    band mechanism (docs/BAGHERI14_RUN.md) in miniature. A NEAR-EMPTY
    log-density row contributes almost nothing to ||F|| (|e^x - e^-5| ~
    7e-3 against the healthy row's 300) but its exp-Jacobian diagonal is
    e^-50, so its Newton direction component is ~e^45: every global
    damping overflows exp() and the line search refuses the ENTIRE step
    — unclamped Newton stalls without descent even though the healthy
    row's direction is perfect. Clamping the log column to 15 log-units
    per iteration keeps the empty row finite (it merely walks) and the
    dominant row converges at lam=1."""
    def F(u):
        x, y = u[0, 0], u[0, 1]
        return jnp.stack([jnp.exp(x) - jnp.exp(-5.0),
                          100.0 * (y - 3.0)]).reshape(1, 2)

    # node-block Jacobi (production preconditioner): the empty row's
    # huge direction component enters through the exact block inverse
    # (1/e^-50 = e^50), not through Krylov resolution — an unpreconditioned
    # inexact solve would simply never resolve the 7e-3 row at tol 1e-4
    def pb(u):
        diag = jnp.stack([jnp.exp(u[0, 0]), jnp.asarray(100.0, u.dtype)])
        return lambda r: r / diag[None]

    u0 = jnp.asarray([[-50.0, 0.0]])
    u, info = newton_krylov(F, u0, NewtonConfig(rtol=1e-4, max_iter=12),
                            precond_builder=pb)
    assert not bool(info.converged)  # global line search refuses every lam
    assert float(info.res_norm) == float(info.res0_norm)  # zero descent
    u, info = newton_krylov(
        F, u0, NewtonConfig(rtol=1e-4, max_iter=12,
                            delta_clip=(15.0, float("inf"))),
        precond_builder=pb)
    assert bool(info.converged)
    np.testing.assert_allclose(float(u[0, 1]), 3.0, rtol=1e-8)
    # the empty row walked (finite, clamped) instead of exploding
    assert np.isfinite(float(u[0, 0])) and float(u[0, 0]) > -50.0


def test_accept_reduction_applies_at_iteration_cap():
    """The accept_reduction clause must fire on a max_iter exit too, not
    only a stall exit (round 5): a 20-iteration solve reducing ||F|| 22x
    on the post-band sheath state was discarded because it was still
    improving when the budget ran out; the capped-dt retries then
    achieved less and the march walked down. "Solver did its best" =
    stalled OR out of budget, both audited via stall_accepted."""
    from fedm_tpu.solvers.newton import (newton_converged,
                                         newton_stall_accepted)

    cfg = NewtonConfig(rtol=1e-3, max_iter=20, accept_reduction=0.1)
    # improving at the cap (stalls=0), reduced 22x: accept + audit bit
    assert bool(newton_converged(0.046, 1.0, 1e-3, 0, False, cfg,
                                 iter_capped=True))
    assert bool(newton_stall_accepted(0.046, 1.0, 1e-3, 0, False, cfg,
                                      iter_capped=True))
    # at the cap but NOT reduced enough: still a failure
    assert not bool(newton_converged(0.5, 1.0, 1e-3, 0, False, cfg,
                                     iter_capped=True))
    # not capped, not stalled: mid-progress exits never stall-accept
    assert not bool(newton_converged(0.046, 1.0, 1e-3, 0, False, cfg,
                                     iter_capped=False))
