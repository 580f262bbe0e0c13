"""Newton initial-guess predictor (AdaptiveDriver.predictor).

The reference starts every nonlinear solve from u_old
(`/root/reference/fedm/functions.py:1103`). A BDF linear extrapolation
u_old + (dt/dt_old)*(u_old - u_old1) is a strictly better guess on
smooth trajectories — the round-2 attempt failed only because the
SNES-style rtol target was anchored to the guess's own (already small)
residual; `CoupledSystem._step_host` now anchors it to the unpredicted
||R(0)|| whenever a guess is supplied, and falls back to u_old when the
prediction does not reduce the residual.
"""

import numpy as np
import jax.numpy as jnp

import fedm_tpu  # noqa: F401
from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
from fedm_tpu.solvers.newton import NewtonConfig
from fedm_tpu.timestepping import AdaptiveDriver


class _CountingSystem:
    """Pass-through wrapper counting total Newton iterations."""

    def __init__(self, system):
        self._sys = system
        self.total_iters = 0

    def __getattr__(self, name):
        return getattr(self._sys, name)

    def step(self, u_guess, u_old, u_old1, aux, params):
        u_new, info = self._sys.step(u_guess, u_old, u_old1, aux, params)
        self.total_iters += int(info.iters)
        return u_new, info


def _run(predictor, n_steps=8):
    nc = NewtonConfig(rtol=1e-4, max_iter=20, linear_tol=1e-4,
                      linear_maxiter=300, host_loop=True)
    m = StreamerModel(StreamerConfig(nx=16, ny=24, newton=nc))
    sys_ = _CountingSystem(m.system)
    drv = AdaptiveDriver(sys_, monitor_idx=1, ttol=m.cfg.ttol,
                         dt_min=m.cfg.dt_min, dt_max=m.cfg.dt_max,
                         predictor=predictor)
    st = m.initial_state()
    for _ in range(n_steps):
        st = drv.advance(st, {})
    return st, sys_


def test_predictor_cuts_newton_iterations_same_physics():
    s0, sys0 = _run(predictor=0.0)
    s1, sys1 = _run(predictor=1.0)
    assert s0.n_accepted == s1.n_accepted == 8
    # same accepted trajectory to well within the ttol error control
    assert s1.t == s0.t or abs(s1.t - s0.t) < 1e-3 * s0.t
    u0, u1 = np.asarray(s0.u), np.asarray(s1.u)
    for k in range(u0.shape[1]):
        scale = np.max(np.abs(u0[:, k])) or 1.0
        assert np.max(np.abs(u1[:, k] - u0[:, k])) / scale < 1e-3
    # the predictor must not cost MORE iterations; on this smooth
    # dt_max-pinned trajectory it should save some
    assert sys1.total_iters <= sys0.total_iters
    assert sys1.total_iters < sys0.total_iters, (
        f"predictor saved nothing: {sys1.total_iters} vs "
        f"{sys0.total_iters} Newton iterations")


def test_predictor_first_step_has_no_history():
    # dt_old = 1e30 sentinel on the first step: the predictor must not
    # fire (no u_old1 history) and the step must accept normally
    nc = NewtonConfig(rtol=1e-4, max_iter=20, host_loop=True)
    m = StreamerModel(StreamerConfig(nx=16, ny=24, newton=nc))
    drv = AdaptiveDriver(m.system, monitor_idx=1, ttol=m.cfg.ttol,
                         dt_min=m.cfg.dt_min, dt_max=m.cfg.dt_max,
                         predictor=1.0)
    st = drv.advance(m.initial_state(), {})
    assert st.n_accepted == 1 and np.isfinite(np.asarray(st.u)).all()
