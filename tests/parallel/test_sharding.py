"""Multi-device domain decomposition: correctness of the shard_map path
on a virtual 8-device CPU mesh — distributed testing the reference lacks
entirely (SURVEY.md section 4 item 3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
from fedm_tpu.models.tof import TimeOfFlight2D, TofConfig
from fedm_tpu.model.system import StepParams


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), ("space",))


def test_sharded_residual_matches_single_device():
    m = StreamerModel(StreamerConfig(nx=12, ny=16))
    st = m.initial_state()
    params = StepParams(jnp.asarray(5e-12), jnp.asarray(5e-12),
                        jnp.asarray(1e30))
    zero = jnp.zeros_like(st.u)
    F_ref = m.system.make_residual_fn(st.u, st.u, {}, params)(st.u)
    blocks_ref = m.system._jacobian_blocks(zero, st.u, zero, {}, params)

    m.system.shard(_mesh(8), "space")
    F_sh = m.system.make_residual_fn(st.u, st.u, {}, params)(st.u)
    blocks_sh = m.system._jacobian_blocks(zero, st.u, zero, {}, params)

    # shard-count-dependent summation order changes roundoff, nothing more
    F_ref, F_sh = np.asarray(F_ref), np.asarray(F_sh)
    blocks_ref, blocks_sh = np.asarray(blocks_ref), np.asarray(blocks_sh)
    np.testing.assert_allclose(F_sh, F_ref, rtol=1e-8,
                               atol=1e-10 * np.abs(F_ref).max())
    np.testing.assert_allclose(blocks_sh, blocks_ref, rtol=1e-8,
                               atol=1e-10 * np.abs(blocks_ref).max())


def test_sharded_full_step_matches_single_device():
    cfg = StreamerConfig(nx=12, ny=16)
    m1 = StreamerModel(cfg)
    st = m1.initial_state()
    params = StepParams(jnp.asarray(5e-12), jnp.asarray(5e-12),
                        jnp.asarray(1e30))
    u1, info1 = m1.system.step(st.u, st.u, st.u, {}, params)
    assert bool(info1.converged)

    m2 = StreamerModel(cfg)
    m2.system.shard(_mesh(8), "space")
    u2, info2 = m2.system.step(st.u, st.u, st.u, {}, params)
    assert bool(info2.converged)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1),
                               rtol=1e-6, atol=1e-12)


def test_sharded_tof_full_run():
    # whole verification workload through the sharded path: same pinned
    # accuracy as single-device (ToF 2D parity gate)
    cfg = TofConfig(t0=2.5e-9, T_final=2.52e-9, dt=1e-12)
    m = TimeOfFlight2D(cfg, nx=20, ny=20)
    m.system.shard(_mesh(4), "space")
    _, errs = m.run(output_times=[2.52e-9])
    assert np.isfinite(errs[0][1])
    assert errs[0][1] < 0.5


def test_padding_is_exact():
    # pad_to must not change assembly results
    m = StreamerModel(StreamerConfig(nx=7, ny=9))  # odd sizes
    st = m.initial_state()
    params = StepParams(jnp.asarray(5e-12), jnp.asarray(5e-12),
                        jnp.asarray(1e30))
    F_ref = np.asarray(m.system.make_residual_fn(st.u, st.u, {}, params)(st.u))
    for batch, _ in m.system._batches():
        batch.pad_to(16)
    F_pad = np.asarray(m.system.make_residual_fn(st.u, st.u, {}, params)(st.u))
    np.testing.assert_allclose(F_pad, F_ref, rtol=1e-12, atol=1e-20)
