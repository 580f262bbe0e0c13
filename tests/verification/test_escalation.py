"""Precision-escalation driver: f32 primary + f64 fallback.

Motivated by the measured f32 failure mode at sharp ionisation fronts
(the assembly noise floor overtakes the achievable Newton reduction; see
timestepping/driver.py). Here the f32 system is given an unreachable
Newton tolerance to force the trigger."""

import jax.numpy as jnp

from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
from fedm_tpu.solvers.newton import NewtonConfig
from fedm_tpu.timestepping import AdaptiveDriver


def test_escalation_rescues_failed_steps():
    bad32 = NewtonConfig(rtol=1e-9, max_iter=8, linear_tol=1e-5,
                         linear_maxiter=300)
    m32 = StreamerModel(StreamerConfig(nx=12, ny=16, dtype=jnp.float32,
                                       newton=bad32, mg_levels=0))
    m64 = StreamerModel(StreamerConfig(
        nx=12, ny=16, mg_levels=0,
        newton=NewtonConfig(rtol=1e-9, max_iter=12, linear_tol=1e-8,
                            linear_maxiter=800)))
    st = m32.initial_state()
    d = AdaptiveDriver(m32.system, 1, 1e-3, 1e-15, 5e-12,
                       fallback_system=m64.system)
    for _ in range(2):
        st = d.advance(st, {})
    assert st.n_accepted == 2
    assert st.n_rejected == 0      # escalation, not rejection
    assert d.n_escalated == 2
    assert st.u.dtype == jnp.float64  # the state is always stored f64


def test_no_escalation_when_primary_converges():
    m32 = StreamerModel(StreamerConfig(nx=12, ny=16, dtype=jnp.float32,
                                       mg_levels=0))
    m64 = StreamerModel(StreamerConfig(nx=12, ny=16, mg_levels=0))
    st = m32.initial_state()
    d = AdaptiveDriver(m32.system, 1, 1e-3, 1e-15, 5e-12,
                       fallback_system=m64.system)
    st = d.advance(st, {})
    assert d.n_escalated == 0 and st.n_accepted == 1


def test_rejection_rate_triggers_escalation():
    """After `escalate_after_rejects` rejected attempts within one advance,
    the driver switches the REMAINING attempts to the fallback system while
    the state is still healthy (docs/STREAMER_STUDY.md round-2 plan)."""

    class CountingSystem:
        """Primary that converges but yields too-large step errors."""

        def __init__(self, inner):
            self.inner = inner
            self.calls = 0

        def step(self, *args):
            self.calls += 1
            u, info = self.inner.step(*args)
            # corrupt the step: error above ttol -> rejection
            return u + 1.0, info

    m = StreamerModel(StreamerConfig(nx=8, ny=12, mg_levels=0))
    good = m.system
    bad = CountingSystem(good)
    st = m.initial_state()
    d = AdaptiveDriver(bad, 1, 1e-3, 1e-18, 5e-12,
                       fallback_system=good, escalate_after_rejects=2)
    st = d.advance(st, {})
    assert st.n_accepted == 1
    # exactly 2 rejected attempts on the corrupted primary, then escalation
    assert bad.calls == 2
    assert st.n_rejected == 2
    assert d.n_escalated >= 1
