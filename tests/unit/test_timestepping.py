import numpy as np
import jax.numpy as jnp
import pytest

from fedm_tpu.timestepping.controllers import (
    adaptive_timestep, adaptive_timestep_PI34, adaptive_timestep_H211b)
from fedm_tpu.timestepping.driver import step_error_norm
from fedm_tpu.model.forms import bdf2_history_part
from fedm_tpu.constants import DOLFIN_EPS


def test_pid_controller_formula():
    # formula from fedm/functions.py:915-927
    dt, err, tol = 1e-12, [1e-5, 2e-5, 3e-5], 5e-4
    expected = dt * ((err[1] / err[0]) ** 0.075 * (tol / err[0]) ** 0.175
                     * (err[1] ** 2 / (err[0] * err[2])) ** 0.01)
    got = adaptive_timestep(dt, err, tol, 1e-15, 1e-8)
    assert got == pytest.approx(expected, rel=1e-14)


def test_controllers_clamp():
    err = [1e-12, 1e-12, 1e-12]  # tiny errors -> huge growth, must clamp
    assert adaptive_timestep(1e-10, err, 1e-4, 1e-13, 1e-9) == 1e-9
    err = [1e12, 1e12, 1e12]  # huge errors -> shrink, clamp at dt_min
    assert adaptive_timestep(1e-12, err, 1e-4, 1e-13, 1e-9) == 1e-13
    assert adaptive_timestep_PI34(1e-12, err, 1e-4, 1e-13, 1e-9) == 1e-13
    assert adaptive_timestep_H211b(1e-12, err, 1e-4, 1e-13, 1e-9,
                                   dt_old=1e-12) == 1e-13


def test_h211b_formula_and_driver_protocol():
    # formula from fedm/functions.py:940-951 with the dt/dt_old ratio term
    dt, dt_old, err, tol = 1e-12, 2e-12, [1e-5, 2e-5, 3e-5], 5e-4
    expected = dt * ((0.8 * tol / err[0]) ** (1 / 12)
                     * (0.8 * tol / err[1]) ** (1 / 12)
                     * (dt / dt_old) ** (-1 / 4))
    got = adaptive_timestep_H211b(dt, err, tol, 1e-15, 1e-8, dt_old=dt_old)
    assert got == pytest.approx(expected, rel=1e-14)
    # first step: the reference's 1e30 sentinel must not blow up the ratio
    got0 = adaptive_timestep_H211b(dt, err, tol, 1e-15, 1e-8, dt_old=1e30)
    ref0 = adaptive_timestep_H211b(dt, err, tol, 1e-15, 1e-8, dt_old=dt)
    assert got0 == ref0
    # all three controllers accept the uniform driver call signature
    for ctrl in (adaptive_timestep, adaptive_timestep_PI34,
                 adaptive_timestep_H211b):
        out = ctrl(dt, err, tol, 1e-15, 1e-8, dt_old=dt_old)
        assert 1e-15 <= out <= 1e-8


def test_bdf2_history_part_limits():
    u, uo, uo1 = 3.0, 2.0, 1.5
    # dt_old -> inf degrades to BDF1 difference (functions.py:349-357)
    bdf1 = bdf2_history_part(u, uo, uo1, 1e-12, 1e30)
    assert float(bdf1) == pytest.approx(u - uo, rel=1e-12)
    # equal steps: (3u - 4 u_old + u_old1)/2
    bdf2 = bdf2_history_part(u, uo, uo1, 1e-12, 1e-12)
    assert float(bdf2) == pytest.approx((3 * u - 4 * uo + uo1) / 2, rel=1e-12)


def test_bdf2_exactness_on_quadratic():
    # BDF2 with unequal steps must differentiate t^2 exactly
    dt, dt_old = 2e-3, 1e-3
    t2, t1, t0 = 1.0, 1.0 - dt, 1.0 - dt - dt_old
    vals = bdf2_history_part(t2**2, t1**2, t0**2, dt, dt_old) / dt
    assert float(vals) == pytest.approx(2.0 * t2, rel=1e-9)


def test_step_error_norm_matches_reference_formula():
    a = jnp.asarray([1.0, 2.0, 3.0])
    b = jnp.asarray([1.1, 2.1, 3.1])
    expected = (np.linalg.norm(np.asarray(b - a) + DOLFIN_EPS)
                / np.linalg.norm(np.asarray(a) + DOLFIN_EPS))
    assert float(step_error_norm(b, a)) == pytest.approx(expected, rel=1e-12)


def test_host_loop_newton_matches_jitted_step():
    """NewtonConfig.host_loop (one XLA execution per Newton iteration — the
    tunneled-TPU single-execution-deadline workaround, solvers/newton.py
    module docstring) must advance identically to the whole-step jit."""
    from dataclasses import replace

    from fedm_tpu.models.streamer import StreamerModel, StreamerConfig

    cfg = StreamerConfig(nx=8, ny=12, dtype=jnp.float32, mg_levels=0)
    assert cfg.newton.host_loop  # f32 production default
    m_host = StreamerModel(cfg)
    m_jit = StreamerModel(StreamerConfig(
        nx=8, ny=12, dtype=jnp.float32, mg_levels=0,
        newton=replace(cfg.newton, host_loop=False)))
    s1, s2 = m_host.initial_state(), m_jit.initial_state()
    d1, d2 = m_host.make_driver(), m_jit.make_driver()
    for _ in range(2):
        s1 = d1.advance(s1, {})
        s2 = d2.advance(s2, {})
    assert s1.n_accepted == s2.n_accepted == 2
    np.testing.assert_allclose(np.asarray(s1.u), np.asarray(s2.u),
                               rtol=0, atol=2e-4)


def test_hi_residual_newton_tracks_f64():
    """NewtonConfig.hi_residual (f64 defect + f32 Krylov correction — the
    mixed-precision refinement structure that removes the f32 assembly
    cancellation-noise floor, docs/STREAMER_STUDY.md round 6) must
    converge past the plain-f32 floor and land far closer to the full-f64
    solve of the same step."""
    from dataclasses import replace

    from fedm_tpu.model.system import StepParams
    from fedm_tpu.models.streamer import StreamerModel, StreamerConfig

    common = dict(nx=8, ny=12, mg_levels=0)
    base = StreamerConfig(dtype=jnp.float32, **common).newton
    # rtol 1e-6: far below the plain-f32 noise floor (measured ~res0/800
    # at best on these meshes) yet above the hi-residual scheme's own
    # floor, the f32 CORRECTION significance limit (measured ~2e-8*res0
    # on this config)
    nc = replace(base, rtol=1e-6, max_iter=12, linear_tol=1e-4,
                 linear_maxiter=400, accept_reduction=0.0)
    m32 = StreamerModel(StreamerConfig(
        dtype=jnp.float32, newton=replace(nc, hi_residual=False), **common))
    mhi = StreamerModel(StreamerConfig(
        dtype=jnp.float32, newton=replace(nc, hi_residual=True), **common))
    m64 = StreamerModel(StreamerConfig(
        newton=replace(nc, host_loop=False), **common), mesh=m32.mesh)

    s = m64.initial_state()
    dt = m64.cfg.dt_init
    params = StepParams(jnp.asarray(s.t + dt), jnp.asarray(dt),
                        jnp.asarray(1e30))
    u64, info64 = m64.system.step(s.u, s.u, s.u_old1, {}, params)
    assert bool(info64.converged)
    u32, info32 = m32.system.step(s.u, s.u, s.u_old1, {}, params)
    uhi, info_hi = mhi.system.step(s.u, s.u, s.u_old1, {}, params)
    # the hi-defect iteration must reach the 1e-6 target (measured floor of
    # this scheme ~2e-8*res0: the f32 CORRECTION significance limit)...
    assert bool(info_hi.converged)
    red_hi = float(info_hi.res_norm) / float(info_hi.res0_norm)
    assert red_hi <= 1e-6, red_hi
    assert np.isfinite(np.asarray(uhi)).all()
    # ...which must be far beyond the plain-f32 assembly noise floor
    # (measured res0/130 on this config: the f32 norm cannot even SEE
    # reductions past its own cancellation noise)
    red32 = float(info32.res_norm) / float(info32.res0_norm)
    assert red_hi < 1e-2 * red32, (red_hi, red32)
    # and the TRUE residual (f64-evaluated at the returned states) must be
    # genuinely lower, not just lower in the solver's own norm
    F_true = m64.system.make_residual_fn(s.u, s.u_old1, {}, params)
    from fedm_tpu.solvers.linear import _norm as _n
    true32 = float(_n(F_true(u32.astype(jnp.float64))))
    true_hi = float(_n(F_true(uhi.astype(jnp.float64))))
    assert true_hi < 0.2 * true32, (true_hi, true32)


def test_remap_state_moving_window():
    """StreamerModel.remap_state (the moving-window remesh primitive):
    z-linear per-r-line interpolation between meshes sharing radial
    lines. Exact on z-linear fields; nodes shared by both grids copy
    exactly; smooth fields interpolate at O(dz^2)."""
    import dataclasses

    from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
    from fedm_tpu.timestepping import TimeState

    common = dict(r_corridor=(2e-3, 5e-4), mg_levels=0)
    m1 = StreamerModel(StreamerConfig(z_corridor=(8.0e-3, 1.00e-2, 1e-4),
                                      **common))
    m2 = StreamerModel(StreamerConfig(z_corridor=(7.0e-3, 0.90e-2, 1e-4),
                                      **common))
    c1 = np.asarray(m1.space.dof_coords)
    c2 = np.asarray(m2.space.dof_coords)

    def fields(c):
        lin = 3.0 * c[:, 1] * 1e2 + 0.5 * c[:, 0] * 1e2 + 1.0
        smooth = np.sin(c[:, 1] * 600.0) + 0.1 * c[:, 0] * 1e2
        return np.stack([lin, smooth, lin], axis=-1)

    u1 = fields(c1)
    st = TimeState(u=jnp.asarray(u1), u_old=jnp.asarray(u1),
                   u_old1=jnp.asarray(u1), t=1e-9, dt=2e-12, dt_old=1e-12,
                   max_error=[1e-4, 2e-4, 3e-4], n_accepted=7, n_rejected=1)
    out = m1.remap_state(m2, st)
    u2 = np.asarray(out.u)
    ref = fields(c2)
    # z-linear column: exact up to roundoff
    np.testing.assert_allclose(u2[:, 0], ref[:, 0], rtol=0, atol=1e-9)
    # smooth column: second-order in the coarse-tail spacing
    assert np.abs(u2[:, 1] - ref[:, 1]).max() < 5e-2
    # shared z-planes copy exactly
    shared = np.isin(np.round(c2[:, 1], 12), np.round(c1[:, 1], 12))
    np.testing.assert_allclose(u2[shared, 1], ref[shared, 1],
                               rtol=0, atol=1e-9)
    # controller/history state carries over
    assert out.t == st.t and out.dt == st.dt and out.dt_old == st.dt_old
    assert out.n_accepted == 7 and out.max_error == st.max_error


def test_window_remesh_advance_continues():
    """Moving-window sequence: adaptive steps on window A, remap_state to
    a re-centered window B, adaptive steps continue (finite state, BDF2
    history carried over, no rejection storm)."""
    from fedm_tpu.models.streamer import StreamerModel, StreamerConfig

    common = dict(r_corridor=(2e-3, 4e-4), mg_levels=0,
                  density_floor=1e13, dtype=jnp.float32)
    mA = StreamerModel(StreamerConfig(z_corridor=(9.1e-3, 1.06e-2, 1.5e-4),
                                      **common))
    dA = mA.make_driver()
    s = mA.initial_state()
    for _ in range(2):
        s = dA.advance(s, {})
    assert s.n_accepted == 2
    mB = StreamerModel(StreamerConfig(z_corridor=(8.8e-3, 1.03e-2, 1.5e-4),
                                      **common))
    s = mA.remap_state(mB, s)
    dB = mB.make_driver()
    for _ in range(2):
        s = dB.advance(s, {})
    u = np.asarray(s.u)
    assert s.n_accepted == 4 and np.isfinite(u).all()
    # the remapped run keeps physical fields: seed ion peak preserved
    assert 40.0 < u[:, 0].max() < 46.0


def test_restart_bdf_history_semantics():
    """restart_bdf_history: history <- u, dt_old <- first-step sentinel, so
    the ratio-weighted BDF2 combination degrades to the backward-Euler
    difference u - u_old (the reference's own bootstrap)."""
    from fedm_tpu.model.forms import bdf2_history_part
    from fedm_tpu.timestepping import TimeState
    from fedm_tpu.timestepping.driver import restart_bdf_history

    u = jnp.asarray(np.random.default_rng(0).normal(size=(12, 3)))
    st = TimeState(u=u, u_old=2.0 * u, u_old1=-u, t=1e-9,
                   dt=2e-12, dt_old=1e-12, n_accepted=5)
    out = restart_bdf_history(st, dt=5e-12)
    assert out is st  # in place
    assert out.dt == 5e-12 and out.dt_old == 1e30
    np.testing.assert_array_equal(np.asarray(out.u_old), np.asarray(u))
    np.testing.assert_array_equal(np.asarray(out.u_old1), np.asarray(u))
    # controller bookkeeping untouched
    assert out.t == 1e-9 and out.n_accepted == 5
    # with the sentinel, the BDF2 history part is the BDF1 difference
    v = jnp.asarray(np.random.default_rng(1).normal(size=(12, 3)))
    h = bdf2_history_part(v, out.u_old, out.u_old1, out.dt, out.dt_old)
    np.testing.assert_allclose(np.asarray(h), np.asarray(v - u),
                               rtol=0, atol=1e-22)
    # dt=None keeps the checkpoint dt
    st2 = TimeState(u=u, u_old=u, u_old1=u, dt=3e-12)
    assert restart_bdf_history(st2).dt == 3e-12


def test_cross_resolution_remap_restart_advances():
    """Fine -> coarse corridor-dz remap with a BDF-history restart: the
    driver must accept steps on the coarse mesh (the raw carried-over
    history from independently-restricted u_old/u_old1 is what the
    coarse-tail study measured refusing Newton at every dt)."""
    from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
    from fedm_tpu.timestepping.driver import restart_bdf_history

    common = dict(r_corridor=(2e-3, 4e-4), mg_levels=0,
                  density_floor=1e13, dtype=jnp.float32)
    mF = StreamerModel(StreamerConfig(z_corridor=(9.1e-3, 1.06e-2, 7.5e-5),
                                      **common))
    dF = mF.make_driver()
    s = mF.initial_state()
    for _ in range(2):
        s = dF.advance(s, {})
    assert s.n_accepted == 2
    mC = StreamerModel(StreamerConfig(z_corridor=(9.1e-3, 1.06e-2, 1.5e-4),
                                      **common))
    s = mF.remap_state(mC, s)
    s = restart_bdf_history(s)
    dC = mC.make_driver()
    for _ in range(2):
        s = dC.advance(s, {})
    u = np.asarray(s.u)
    assert s.n_accepted == 4 and np.isfinite(u).all()


def test_z_remap_weights_restriction():
    """_z_remap_weights: pointwise (identity) on matching grids; exact on
    linear fields under 4:1 coarsening; anti-aliases oscillations that
    pointwise sampling would fold into the coarse grid."""
    from fedm_tpu.models.streamer import _z_remap_weights

    zs = np.linspace(0.0, 1.0, 201)          # fine: dz = 5e-3
    # matching grids -> exact identity
    W = _z_remap_weights(zs, zs)
    np.testing.assert_allclose(W, np.eye(201), rtol=0, atol=1e-12)
    # 4:1 coarsening
    zd = np.linspace(0.0, 1.0, 51)           # coarse: dz = 2e-2
    W = _z_remap_weights(zs, zd)
    # partition of unity (constants reproduced)
    np.testing.assert_allclose(W.sum(axis=1), 1.0, rtol=0, atol=1e-12)
    # linear fields reproduced exactly (symmetric top-hat window)
    lin = 3.0 * zs + 0.7
    np.testing.assert_allclose(W @ lin, 3.0 * zd + 0.7, rtol=0, atol=1e-12)
    # a grid-frequency oscillation on the fine mesh must be averaged out,
    # not point-sampled: pointwise would return +-1 at every coarse node
    osc = np.where(np.arange(201) % 2 == 0, 1.0, -1.0)
    restricted = (W @ osc)[1:-1]             # interior nodes restrict
    assert np.abs(restricted).max() < 0.1, restricted
    # boundary nodes stay pointwise interpolation
    assert W[0, 0] == 1.0 and W[-1, -1] == 1.0
    # prolongation direction (dst finer than src) stays pure interpolation
    Wp = _z_remap_weights(zd, zs)
    assert ((Wp > 0).sum(axis=1) <= 2).all()


def test_z_remap_weights_nonuniform_junction():
    """Restriction engages only where the destination locally coarsens:
    a destination grid matching the source in a 'tail' region and 4x
    coarser in a 'corridor' keeps the tail identity while averaging the
    corridor."""
    from fedm_tpu.models.streamer import _z_remap_weights

    tail = np.linspace(0.0, 0.1, 41)         # both grids share this
    zs = np.concatenate([tail, np.arange(1, 361) * 2.5e-3 + 0.1])
    zd = np.concatenate([tail, np.arange(1, 91) * 1e-2 + 0.1])
    W = _z_remap_weights(zs, zd)
    # tail rows: identity (up to the last-but-one tail node; its neighbor
    # gap already spans into the corridor)
    sub = W[:39, :39]
    np.testing.assert_allclose(sub, np.eye(39), rtol=0, atol=1e-12)
    np.testing.assert_allclose(W.sum(axis=1), 1.0, rtol=0, atol=1e-12)
    # corridor interior rows average >2 source nodes
    assert ((W[45:-1] > 0).sum(axis=1) >= 3).all()
    lin = -2.0 * zs + 5.0
    np.testing.assert_allclose(W @ lin, -2.0 * zd + 5.0, rtol=0, atol=1e-12)


def test_true_res_rescue_deepens_f32_newton():
    """NewtonConfig.true_res_rescue: the left-preconditioned BiCGStab
    convergence metric is the M^-1-scaled norm, which can accept
    directions that are poor in the TRUE norm. With the rescue enabled
    (threshold 1.0 = rerun right-preconditioned GMRES only for provably
    useless directions; here 0.5 to also trigger on merely-poor ones) the
    plain-f32 Newton on the streamer step must converge at least as deep
    as without it (measured ~2.5x deeper on this toy config; the real
    trigger case — M-norm 4.2e-3 vs true-norm 14.6 on the coarse-corridor
    resume state — is documented in docs/BAGHERI14_RUN.md)."""
    from dataclasses import replace

    from fedm_tpu.model.system import StepParams
    from fedm_tpu.models.streamer import StreamerModel, StreamerConfig

    common = dict(nx=8, ny=12, mg_levels=0)
    base = StreamerConfig(dtype=jnp.float32, **common).newton
    nc = replace(base, rtol=1e-6, max_iter=12, linear_tol=1e-4,
                 linear_maxiter=400, accept_reduction=0.0)
    m_off = StreamerModel(StreamerConfig(
        dtype=jnp.float32, newton=replace(nc, true_res_rescue=0.0),
        **common))
    m_on = StreamerModel(StreamerConfig(
        dtype=jnp.float32, newton=replace(nc, true_res_rescue=0.5),
        **common), mesh=m_off.mesh)

    s = m_off.initial_state()
    dt = m_off.cfg.dt_init
    params = StepParams(jnp.asarray(s.t + dt), jnp.asarray(dt),
                        jnp.asarray(1e30))
    u_off, info_off = m_off.system.step(s.u, s.u, s.u_old1, {}, params)
    u_on, info_on = m_on.system.step(s.u, s.u, s.u_old1, {}, params)
    red_off = float(info_off.res_norm) / float(info_off.res0_norm)
    red_on = float(info_on.res_norm) / float(info_on.res0_norm)
    assert np.isfinite(np.asarray(u_on)).all()
    # the rescued iteration must not be worse, and on this config it is
    # measurably deeper (2.5x measured; assert half that as margin)
    assert red_on <= red_off, (red_on, red_off)
    assert red_on < 0.8 * red_off, (red_on, red_off)


def test_crash_checkpoint_carries_meta(tmp_path):
    """A dt_min death must write a crash checkpoint with the SAME meta
    as the run's periodic checkpoints (AdaptiveDriver.crash_meta).
    Measured failure (2026-08-19, Bagheri finish segment): crash.npz
    lacked the moving-window corridor/tail topology, so a --resume would
    have z-remapped the state from the legacy (48,48) topology onto
    wrong nodes; the state had to be repacked by hand."""
    from fedm_tpu.io.checkpoint import load_checkpoint
    from fedm_tpu.solvers.newton import NewtonInfo
    from fedm_tpu.timestepping import AdaptiveDriver, TimeState

    class _AlwaysFails:
        def step(self, u_guess, u_old, u_old1, aux, params):
            z = jnp.asarray(0.0)
            return u_old, NewtonInfo(
                jnp.asarray(False), jnp.int32(1), z, z, z)

    corridor = (1e-4, 1.6e-3, 1e-5)
    drv = AdaptiveDriver(
        _AlwaysFails(), monitor_idx=1, ttol=1e-3, dt_min=1e-14,
        dt_max=5e-12, crash_checkpoint=tmp_path / "crash.npz",
        crash_meta=lambda: {"z_corridor": corridor,
                            "z_tail_cells": (10, 48)})
    u = jnp.asarray(np.full((5, 3), 1.0))
    s = TimeState(u=u, u_old=u, u_old1=u, t=0.0, dt=1e-12, dt_old=1e30)
    with pytest.raises(SystemExit):
        drv.advance(s, {})
    _, meta = load_checkpoint(tmp_path / "crash.npz", with_meta=True)
    assert tuple(float(v) for v in meta["z_corridor"]) == corridor
    assert tuple(int(v) for v in meta["z_tail_cells"]) == (10, 48)


def test_floor_atol_dynamic_target():
    """AdaptiveDriver.floor_atol: the driver hands the system a dynamic
    absolute Newton target C * (last accepted step's final ||F||) and
    updates the floor only from ttol-accepted steps. Post-band-crossing
    regime of the Bagheri finish segment (docs/BAGHERI14_RUN.md round 5):
    attempts starting AT the f32 floor must exit converged instead of
    spuriously failing every reduction-based criterion."""
    from fedm_tpu.solvers.newton import NewtonInfo
    from fedm_tpu.timestepping import AdaptiveDriver

    seen = []

    class StubSystem:
        newton = None
        # per-call (iters, res0, res) script
        script = [(3, 3.0e18, 2.0e16),   # genuine solve: sets the floor
                  (0, 2.5e16, 2.5e16),   # atol exit: floor must NOT move
                  (0, 3.4e16, 3.4e16)]   # atol exit again

        def step(self, u_guess, u_old, u_old1, aux, params):
            seen.append(getattr(self, "dyn_atol", None))
            it, r0, rn = self.script[len(seen) - 1]
            info = NewtonInfo(converged=jnp.asarray(True),
                              iters=jnp.asarray(it),
                              res_norm=jnp.asarray(rn),
                              res0_norm=jnp.asarray(r0),
                              lin_relres=jnp.asarray(1e-3))
            return u_old + 1e-9, info

    sys_ = StubSystem()
    d = AdaptiveDriver(sys_, 0, ttol=1e30, dt_min=1e-20, dt_max=1e-9,
                       floor_atol=1.5)
    import jax.numpy as jnp2
    from fedm_tpu.timestepping.driver import TimeState
    st = TimeState(u=jnp2.ones((4, 1)), u_old=jnp2.ones((4, 1)),
                   u_old1=jnp2.ones((4, 1)), t=0.0, dt=1e-12,
                   dt_old=1e-12, max_error=[1e30, 1e30, 1e30],
                   n_accepted=0, n_rejected=0)
    st = d.advance(st, {})
    # first attempt: no floor yet -> dyn_atol 0
    assert seen[0] == 0.0
    dt_after_solve = st.dt
    st = d.advance(st, {})
    # second attempt: floor = genuinely-solved res_norm, target = 1.5x
    assert seen[1] == pytest.approx(1.5 * 2.0e16)
    # the 0-iteration atol exit must NOT grow dt (extrapolation-only
    # steps say nothing about solvability at larger dt)
    assert st.dt <= dt_after_solve
    st = d.advance(st, {})
    # and must NOT ratchet the floor (res_norm == res0 there; the
    # measured runaway fed these back and walked the floor to 7.4e18)
    assert seen[2] == pytest.approx(1.5 * 2.0e16)

    # floor_atol=0 (default): the driver never touches dyn_atol
    seen2 = []

    class Stub2:
        newton = None

        def step(self, u_guess, u_old, u_old1, aux, params):
            seen2.append(hasattr(self, "dyn_atol"))
            info = NewtonInfo(converged=jnp.asarray(True),
                              iters=jnp.asarray(3),
                              res_norm=jnp.asarray(2.0e16),
                              res0_norm=jnp.asarray(3.0e18),
                              lin_relres=jnp.asarray(1e-3))
            return u_old + 1e-9, info

    d2 = AdaptiveDriver(Stub2(), 0, ttol=1e30, dt_min=1e-20, dt_max=1e-9)
    st2 = TimeState(u=jnp2.ones((4, 1)), u_old=jnp2.ones((4, 1)),
                    u_old1=jnp2.ones((4, 1)), t=0.0, dt=1e-12,
                    dt_old=1e-12, max_error=[1e30, 1e30, 1e30],
                    n_accepted=0, n_rejected=0)
    d2.advance(st2, {})
    assert seen2 == [False]


def test_floor_atol_reanchors_from_failed_halving_solve():
    """A FAILED solve that cut ||F|| >= 2x re-anchors the floor (fresh
    measurement; noise cannot be halved so this cannot ratchet), healing
    the stale-anchor dead zone of the densifying sheath."""
    from fedm_tpu.solvers.newton import NewtonInfo
    from fedm_tpu.timestepping import AdaptiveDriver
    from fedm_tpu.timestepping.driver import TimeState

    seen = []

    class Stub:
        newton = None
        # call 1: accepted solve (floor = 2e16); call 2: FAILED solve
        # that halved 1.8e18 -> 4.3e17; call 3: observe refreshed atol
        script = [(True, 3, 3.0e18, 2.0e16),
                  (False, 14, 1.8e18, 4.3e17),
                  (True, 2, 5.0e17, 3.0e17)]

        def step(self, u_guess, u_old, u_old1, aux, params):
            seen.append(getattr(self, "dyn_atol", None))
            ok, it, r0, rn = self.script[len(seen) - 1]
            info = NewtonInfo(converged=jnp.asarray(ok),
                              iters=jnp.asarray(it),
                              res_norm=jnp.asarray(rn),
                              res0_norm=jnp.asarray(r0),
                              lin_relres=jnp.asarray(1e-3))
            return u_old + 1e-9, info

    d = AdaptiveDriver(Stub(), 0, ttol=1e30, dt_min=1e-20, dt_max=1e-9,
                       floor_atol=2.0)
    st = TimeState(u=jnp.ones((4, 1)), u_old=jnp.ones((4, 1)),
                   u_old1=jnp.ones((4, 1)), t=0.0, dt=1e-12,
                   dt_old=1e-12, max_error=[1e30, 1e30, 1e30],
                   n_accepted=0, n_rejected=0)
    st = d.advance(st, {})      # call 1 accepted
    st = d.advance(st, {})      # call 2 fails -> call 3 retries
    assert seen[1] == pytest.approx(2.0 * 2.0e16)
    # retry sees the re-anchored floor from the failed solve's result
    assert seen[2] == pytest.approx(2.0 * 4.3e17)
