"""Batched parameter sweeps (DP over independent simulations)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
from fedm_tpu.parallel import BatchedSweep


def _states_with_amplitudes(model, amplitudes):
    states = []
    base_cfg = model.cfg
    for amp in amplitudes:
        cfg = StreamerConfig(nx=base_cfg.nx, ny=base_cfg.ny,
                             seed_amplitude=amp)
        states.append(StreamerModel(cfg).initial_state())
    return states


def test_batched_sweep_matches_single_runs():
    cfg = StreamerConfig(nx=10, ny=14)
    model = StreamerModel(cfg)
    amps = [2e18, 5e18, 1e19]
    states = _states_with_amplitudes(model, amps)

    sweep = BatchedSweep(model.system, monitor_idx=1, ttol=cfg.ttol,
                         dt_min=cfg.dt_min, dt_max=cfg.dt_max)
    st = sweep.from_states(states)
    for _ in range(3):
        st = sweep.attempt(st, {})
    assert (st.n_accepted == 3).all()
    assert (st.n_rejected == 0).all()
    # errors differ across seeds (independent physics)
    errs = st.max_error[:, 0]
    assert len(np.unique(np.round(errs, 12))) == 3

    # batched result equals the single-simulation driver for one member
    single_model = StreamerModel(StreamerConfig(nx=10, ny=14,
                                                seed_amplitude=amps[1]))
    d = single_model.make_driver()
    s1 = single_model.initial_state()
    for _ in range(3):
        s1 = d.advance(s1, {})
    # vmapped execution reorders the Newton iterations, so the converged
    # iterates agree to the Newton tolerance band, not to roundoff
    np.testing.assert_allclose(np.asarray(st.u[1]), np.asarray(s1.u),
                               atol=5e-2)
    np.testing.assert_allclose(st.t[1], s1.t, rtol=1e-12)
    # the step-error estimate is itself of the order of the Newton
    # tolerance band, so only its magnitude is comparable
    assert 0.3 < st.max_error[1, 0] / s1.max_error[0] < 3.0


def test_batched_sweep_sharded_over_devices():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:4]), ("batch",))
    sharding = NamedSharding(mesh, P("batch"))
    cfg = StreamerConfig(nx=8, ny=10)
    model = StreamerModel(cfg)
    amps = [1e18, 3e18, 6e18, 1e19]
    states = _states_with_amplitudes(model, amps)
    sweep = BatchedSweep(model.system, monitor_idx=1, ttol=cfg.ttol,
                         dt_min=cfg.dt_min, dt_max=cfg.dt_max,
                         batch_sharding=sharding)
    st = sweep.from_states(states)
    st = sweep.attempt(st, {})
    assert (st.n_accepted == 1).all()
    assert np.isfinite(np.asarray(st.u)).all()
