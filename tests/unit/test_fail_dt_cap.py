"""Solver-aware dt limiting (AdaptiveDriver.fail_dt_cap).

The reference's controller is blind to WHY a step was rejected
(`/root/reference/fedm/functions.py:1080-1100`: exception -> dt*0.5,
then the PID regrows dt from accepted-error history alone). When the
nonlinear solver has a hard dt ceiling — measured on the Bagheri
post-arrival cathode sheath (runs/bagheri14, t > 13.07 ns) — this
produces a strict period-2 limit cycle: the PID walks dt back above the
ceiling every other step, Newton fails twice at full max_iter cost, dt
collapses 4x, repeat; half of all attempts are full-cost failures.

`fail_dt_cap` remembers the failing dt and keeps controller proposals
below `fail_dt_cap * dt_failed`, relaxing by `fail_cap_recovery` per
acceptance so larger dt is re-probed gradually (the same safeguard
PETSc's TSAdapt layer applies after SNES failures).
"""

import numpy as np
import jax.numpy as jnp

import fedm_tpu  # noqa: F401
from fedm_tpu.solvers.newton import NewtonInfo
from fedm_tpu.timestepping import AdaptiveDriver, TimeState


class _CeilingSystem:
    """Newton 'fails' above a hard dt ceiling, converges below it with a
    small smooth step error — the measured sheath-regime shape."""

    CEILING = 1.0e-12

    def __init__(self):
        self.n_attempts = 0
        self.n_failures = 0

    def step(self, u_guess, u_old, u_old1, aux, params):
        self.n_attempts += 1
        dt = float(params.dt)
        ok = dt <= self.CEILING
        if not ok:
            self.n_failures += 1
        u_new = u_old + 1e-5 * (dt / self.CEILING)
        z = jnp.asarray(0.0)
        return u_new, NewtonInfo(jnp.asarray(ok), jnp.int32(1), z, z, z)


def _march(drv, sys_, n_steps=40):
    u = jnp.asarray(np.full((20, 3), 30.0))
    s = TimeState(u=u, u_old=u, u_old1=u, t=0.0, dt=5e-13, dt_old=1e30)
    for _ in range(n_steps):
        s = drv.advance(s, {})
    return s, sys_


def test_uncapped_limit_cycle_wastes_attempts():
    sys_ = _CeilingSystem()
    drv = AdaptiveDriver(sys_, monitor_idx=1, ttol=1e-3,
                         dt_min=1e-16, dt_max=5e-12)
    s, sys_ = _march(drv, sys_)
    # reference semantics: the PID keeps re-probing the failing dt
    assert sys_.n_failures >= s.n_accepted // 3, (
        f"expected the limit cycle ({sys_.n_failures} failures / "
        f"{sys_.n_attempts} attempts)")


def test_fail_dt_cap_breaks_the_cycle():
    ref = _CeilingSystem()
    _march(AdaptiveDriver(ref, monitor_idx=1, ttol=1e-3,
                          dt_min=1e-16, dt_max=5e-12), ref)
    sys_ = _CeilingSystem()
    drv = AdaptiveDriver(sys_, monitor_idx=1, ttol=1e-3,
                         dt_min=1e-16, dt_max=5e-12, fail_dt_cap=0.7)
    s, sys_ = _march(drv, sys_)
    # the cap re-probes the ceiling only every ~7 acceptances (1.05x
    # recovery from 0.7x): far fewer full-cost failures than the
    # uncapped controller's limit cycle
    assert sys_.n_failures <= 2 + s.n_accepted // 5, (
        f"cap failed to hold ({sys_.n_failures} failures / "
        f"{sys_.n_attempts} attempts)")
    assert 2 * sys_.n_failures <= ref.n_failures, (
        f"capped ({sys_.n_failures}) must waste far fewer attempts than "
        f"uncapped ({ref.n_failures})")
    # and dt still rides close under the ceiling (not permanently stuck)
    assert s.dt_old > 0.4 * _CeilingSystem.CEILING
    # same physics progress guarantees: all steps accepted below ceiling
    assert s.n_accepted == 40


def test_cap_fully_relaxes_when_regime_eases():
    sys_ = _CeilingSystem()
    drv = AdaptiveDriver(sys_, monitor_idx=1, ttol=1e-3,
                         dt_min=1e-16, dt_max=5e-12, fail_dt_cap=0.7,
                         fail_cap_recovery=1.3)
    _march(drv, sys_, n_steps=5)
    sys_.CEILING = 1.0  # ceiling gone (regime eased)
    s, _ = _march(drv, sys_, n_steps=60)
    assert drv._dt_cap == float("inf"), "cap must fully relax"
    assert s.dt == 5e-12, "dt must return to dt_max"
