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
