"""Transport z-line preconditioning (CoupledSystem.enable_transport_zline):

1. the sub/super z-couplings extracted from the element Jacobians equal
   the TRUE Jacobian entries J[(row),(row -/+ n_r)][eq,eq] (JVP probe);
2. a preconditioned streamer step solves the same nonlinear problem —
   the accepted state matches the baseline preconditioner's to Newton
   tolerance — in no more Krylov iterations.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import fedm_tpu  # noqa: F401  (enables x64)
from fedm_tpu.model.system import StepParams
from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
from fedm_tpu.solvers.newton import NewtonConfig


def _model(**kw):
    nc = NewtonConfig(rtol=1e-6, max_iter=12, linear_tol=1e-8,
                      linear_maxiter=400)
    return StreamerModel(StreamerConfig(nx=8, ny=12, mg_levels=0,
                                        newton=nc, **kw))


def test_zline_couplings_match_true_jacobian():
    m = _model(transport_zline=True)
    sys_ = m.system
    st = m.initial_state()
    p = StepParams(jnp.asarray(5e-12), jnp.asarray(5e-12),
                   jnp.asarray(1e30))
    delta0, u_old_c, d_hist, aux_c, params_c, bc_shift = sys_._cast_inputs(
        st.u, st.u, st.u, {}, p)
    blocks, (sub, sup) = sys_._jacobian_blocks_zline(
        delta0, u_old_c, d_hist, aux_c, params_c)
    R = sys_.make_delta_residual_fn(u_old_c, d_hist, aux_c, params_c,
                                    bc_shift)

    eq = 1  # electrons
    n_r = sys_._tzline[2]
    rng = np.random.default_rng(0)
    for d in rng.integers(2 * n_r, sys_.n_dofs - 2 * n_r, size=6):
        d = int(d)
        # J[:, (d - n_r, eq)] column via JVP: sub[d] couples row d to its
        # -z neighbor
        tan = jnp.zeros_like(delta0).at[d - n_r, eq].set(1.0)
        col = jax.jvp(R, (delta0,), (tan,))[1]
        np.testing.assert_allclose(float(sub[d, 0]), float(col[d, eq]),
                                   rtol=1e-10, atol=1e-30)
        tan = jnp.zeros_like(delta0).at[d + n_r, eq].set(1.0)
        col = jax.jvp(R, (delta0,), (tan,))[1]
        np.testing.assert_allclose(float(sup[d, 0]), float(col[d, eq]),
                                   rtol=1e-10, atol=1e-30)
        # and the diagonal from the node blocks
        tan = jnp.zeros_like(delta0).at[d, eq].set(1.0)
        col = jax.jvp(R, (delta0,), (tan,))[1]
        np.testing.assert_allclose(float(blocks[d, eq, eq]),
                                   float(col[d, eq]), rtol=1e-10)


def test_zline_preconditioned_step_matches_baseline():
    p = StepParams(jnp.asarray(5e-12), jnp.asarray(5e-12),
                   jnp.asarray(1e30))

    m0 = _model(transport_zline=False)
    st = m0.initial_state()
    u0, i0 = m0.system.step(st.u, st.u, st.u, {}, p)
    assert bool(i0.converged)

    m1 = _model(transport_zline=True)
    u1, i1 = m1.system.step(st.u, st.u, st.u, {}, p)
    assert bool(i1.converged)
    # same nonlinear problem, tight Newton tolerance -> same solution
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0),
                               rtol=1e-7, atol=1e-9)
    # the line solve must not be WORSE than node-block Jacobi
    assert int(i1.iters) <= int(i0.iters)


def test_zline_window_geom_mode_production_miniature():
    """The production moving-window path (geom mode, host-loop hi-residual
    Newton, mg-zline Poisson V-cycle) with transport_zline enabled: a
    window move must not retrace, and the trajectory across the move must
    match the baseline preconditioner's (tools/bagheri_run.py --tzline).

    The move keeps the seed/front INSIDE the window, as the production
    window-tracking invariant guarantees (60% ahead / 40% behind the
    front). A move that strands the active region in the coarse tail is
    out of contract — and measurably breaks the tzline preconditioner's
    left-preconditioned convergence metric (see the tzline caveat in
    docs/DESIGN.md)."""
    SPAN, DZ = 1.5e-3, 5e-5

    def run(tzline):
        nc = NewtonConfig(rtol=1e-3, max_iter=20, linear_tol=1e-4,
                          linear_maxiter=200, accept_reduction=3e-2,
                          host_loop=True, hi_residual=True)
        cfg = StreamerConfig(z_corridor=(9.1e-3, 9.1e-3 + SPAN, DZ),
                             newton=nc, r_corridor=(2e-3, 2e-4),
                             z_tail_cells=(12, 12), mg_levels=3,
                             poisson_precond="mg-zline", dtype=jnp.float32,
                             density_floor=1e13, transport_zline=tzline)
        m = StreamerModel(cfg)
        m.system.use_gather_scatter()
        m.system.enable_geom_mode()
        st = m.initial_state()
        drv = m.make_driver()
        st = drv.advance(st, {})
        iter_jit = m.system._host_iter_jit
        st = m.move_window((8.9e-3, 8.9e-3 + SPAN, DZ), st)
        assert m.system._host_iter_jit is iter_jit, (
            "window move must not invalidate the compiled step")
        st = drv.advance(st, {})
        return st

    st0 = run(False)
    st1 = run(True)
    assert st1.n_accepted == st0.n_accepted == 2
    assert np.isfinite(np.asarray(st1.u)).all()
    np.testing.assert_allclose(np.asarray(st1.u), np.asarray(st0.u),
                               rtol=5e-5, atol=1e-7)
