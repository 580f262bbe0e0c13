"""GSPMD z-slab sharding of the STRUCTURED assembly path.

The corridor meshes' hot path is pure slice/pad/reshape array code
(structured gather/scatter, stencil matvecs, PCR line solves, separable
MG transfers). `CoupledSystem.use_gspmd` shards the nodal arrays over
z-slabs and lets XLA's GSPMD partitioner place the halo collectives —
the scaling-book recipe — instead of dropping to ELL assembly on shards
(round-1 weak item 5). These tests check the sharded step is numerically
identical to the single-device structured step and that the state stays
sharded.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
from fedm_tpu.model.system import StepParams


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), ("space",))


def _model():
    # (nx+1)*(ny+1) = 16*16 = 256 dofs: divisible by 8 so the z-slab
    # NamedSharding places evenly (GSPMD's device_put requires it);
    # 'zline' exercises the PCR line solves under sharding
    cfg = StreamerConfig(nx=15, ny=15, mg_levels=0,
                         poisson_precond="zline")
    m = StreamerModel(cfg)
    m.system.use_gather_scatter()  # engages structured slice/pad assembly
    assert m.system.cell_batch._structured is not None
    return m


def test_gspmd_step_matches_single_device():
    m_ref = _model()
    st = m_ref.initial_state()
    params = StepParams(jnp.asarray(5e-12), jnp.asarray(5e-12),
                        jnp.asarray(1e30))
    u1, info1 = m_ref.system.step(st.u, st.u, st.u, {}, params)
    assert bool(info1.converged)

    m = _model()
    sh = m.system.use_gspmd(_mesh(8))
    # structured assembly must survive: that is the point of this mode
    assert m.system.cell_batch._structured is not None
    u0 = jax.device_put(st.u, sh)
    u2, info2 = m.system.step(u0, u0, u0, {}, params)
    assert bool(info2.converged)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1),
                               rtol=1e-10, atol=1e-12)


def test_gspmd_adaptive_driver_keeps_sharding():
    m = _model()
    sh = m.system.use_gspmd(_mesh(8))
    st = m.initial_state()
    st.u = jax.device_put(st.u, sh)
    st.u_old = jax.device_put(st.u_old, sh)
    st.u_old1 = jax.device_put(st.u_old1, sh)
    driver = m.make_driver()
    st = driver.advance(st, {})
    st = driver.advance(st, {})
    assert st.n_accepted == 2
    assert np.isfinite(np.asarray(st.u)).all()
    # the accepted state is still sharded over the mesh (GSPMD kept the
    # layout through Newton-Krylov, MG and the error control)
    assert len(st.u.sharding.device_set) == 8
