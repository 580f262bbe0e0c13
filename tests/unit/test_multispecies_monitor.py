"""Multi-species error monitoring (round-2 verdict item 7).

The reference's adaptive driver watches ONE variable
(`/root/reference/fedm/functions.py:1056-1064`: LMEA -> energy density,
LFA -> electron density), so a wild excursion in any other species is
silently ACCEPTED — exactly the measured round-6 production failure
(docs/STREAMER_STUDY.md: u_ion = -909 at one annular-rim node while the
monitored electrons stayed smooth; e^u underflowed, the node block went
structurally singular, dt walked to dt_min). `AdaptiveDriver.monitor_idx`
now also accepts a tuple of components; the controlled error is the max
over them — the excursion is rejected by CONTROL, not cleaned up by
guards.
"""

import numpy as np
import jax.numpy as jnp

import fedm_tpu  # noqa: F401
from fedm_tpu.solvers.newton import NewtonInfo
from fedm_tpu.timestepping import AdaptiveDriver, TimeState


class _SpikySystem:
    """Fake system reproducing the failure shape: the monitored component
    (index 1) moves smoothly with dt, while component 0 takes a huge
    single-node excursion whenever dt exceeds a threshold — i.e. the
    excursion IS dt-controllable, the single-variable monitor just cannot
    see it."""

    THRESHOLD = 2e-12

    def step(self, u_guess, u_old, u_old1, aux, params):
        dt = float(params.dt)
        u_new = u_old + 1e-4 * (dt / 5e-12)
        if dt > self.THRESHOLD:
            u_new = u_new.at[0, 0].add(-900.0)  # the u_ion = -909 shape
        ok = jnp.asarray(True)
        z = jnp.asarray(0.0)
        return u_new, NewtonInfo(ok, jnp.int32(1), z, z, z)


def _state():
    u = jnp.asarray(np.full((50, 3), 30.0))
    return TimeState(u=u, u_old=u, u_old1=u, t=0.0, dt=5e-12, dt_old=1e30)


def test_single_monitor_accepts_the_excursion():
    drv = AdaptiveDriver(_SpikySystem(), monitor_idx=1, ttol=1e-3,
                         dt_min=1e-16, dt_max=5e-12)
    s = drv.advance(_state(), {})
    assert s.n_accepted == 1 and s.n_rejected == 0
    # the unmonitored excursion is INSIDE the accepted state
    assert float(np.asarray(s.u)[0, 0]) < -800.0


def test_multi_monitor_rejects_and_controls_it():
    drv = AdaptiveDriver(_SpikySystem(), monitor_idx=(0, 1), ttol=1e-3,
                         dt_min=1e-16, dt_max=5e-12)
    s = drv.advance(_state(), {})
    assert s.n_accepted == 1
    assert s.n_rejected >= 1, "excursion must be rejected by error control"
    assert s.dt_old <= _SpikySystem.THRESHOLD, "dt must shrink below the trigger"
    u = np.asarray(s.u)
    assert u.min() > 0.0, "accepted state must be excursion-free"
