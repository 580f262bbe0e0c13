"""DOF-partitioned domain decomposition (fedm_tpu.parallel.dd): parity of
the halo-exchange path vs the single-device system, 1/N per-device state,
and partition sanity.

This is the real distributed-memory counterpart of the reference's MPI
mesh partitioning + ghost exchange (`fedm/functions.py:621-637`); the
replicated-state `CoupledSystem.shard` path is covered separately in
test_sharding.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
from fedm_tpu.model.system import StepParams
from fedm_tpu.parallel.dd import distribute


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), ("space",))


_PARAMS = lambda: StepParams(jnp.asarray(5e-12), jnp.asarray(5e-12),
                             jnp.asarray(1e30))


def _models(nx=12, ny=16, n_dev=8):
    cfg = StreamerConfig(nx=nx, ny=ny)
    m_ref = StreamerModel(cfg)
    m_dd = StreamerModel(cfg)
    dsys = m_dd.distribute(_mesh(n_dev))
    return m_ref, m_dd, dsys


def test_dd_layout_is_one_over_n():
    m_ref, m_dd, d = _models()
    n_dofs = m_ref.system.n_dofs
    # per-device state rows ~ n_dofs / 8 (plus balance/padding slack)
    assert d.n_own_max <= -(-n_dofs // 8) + 16
    st = m_dd.initial_state()
    assert st.u.shape[0] == 8 * d.n_own_max
    # the state is genuinely sharded over the 8 devices
    assert len(st.u.sharding.device_set) == 8
    # round trip is exact
    u0 = np.asarray(m_ref.initial_state().u)
    np.testing.assert_array_equal(d.from_dist(d.to_dist(u0)), u0)
    # halo exchange only touches near neighbours for this partition
    for perm_fwd, _ in d._shifts:
        deltas = {(dst - src) % 8 for src, dst in perm_fwd}
        assert deltas <= {1, 7}


def test_dd_residual_and_blocks_match_single_device():
    m_ref, m_dd, d = _models()
    st = m_ref.initial_state()
    params = _PARAMS()
    zero = jnp.zeros_like(st.u)

    F_ref = np.asarray(m_ref.system.residual(st.u, st.u, st.u, {}, params))
    B_ref = np.asarray(m_ref.system._jacobian_blocks(
        zero, st.u, zero, {}, params))

    ud = d.to_dist(st.u)
    zd = jnp.zeros_like(ud)
    F_dd = d.from_dist(d.residual(ud, ud, ud, {}, params))
    B_dd = d.from_dist(d._jacobian_blocks(zd, ud, zd, {}, params))

    np.testing.assert_allclose(F_dd, F_ref, rtol=1e-10,
                               atol=1e-12 * np.abs(F_ref).max())
    np.testing.assert_allclose(B_dd, B_ref, rtol=1e-10,
                               atol=1e-12 * np.abs(B_ref).max())


def test_dd_full_step_matches_single_device():
    m_ref, m_dd, d = _models()
    st = m_ref.initial_state()
    params = _PARAMS()
    u1, info1 = m_ref.system.step(st.u, st.u, st.u, {}, params)
    assert bool(info1.converged)

    ud = d.to_dist(st.u)
    u2, info2 = d.step(ud, ud, ud, {}, params)
    assert bool(info2.converged)
    np.testing.assert_allclose(d.from_dist(u2), np.asarray(u1),
                               rtol=1e-6, atol=1e-10)


def test_dd_ell_gather_scatter_matches():
    m_ref, m_dd, d = _models()
    d.use_gather_scatter()
    st = m_ref.initial_state()
    params = _PARAMS()
    F_ref = np.asarray(m_ref.system.residual(st.u, st.u, st.u, {}, params))
    ud = d.to_dist(st.u)
    F_dd = d.from_dist(d.residual(ud, ud, ud, {}, params))
    np.testing.assert_allclose(F_dd, F_ref, rtol=1e-10,
                               atol=1e-12 * np.abs(F_ref).max())


def test_dd_adaptive_driver_advances():
    _, m_dd, d = _models()
    driver = m_dd.make_driver()
    st = m_dd.initial_state()
    st = driver.advance(st, {})
    st = driver.advance(st, {})
    assert st.n_accepted == 2
    u = d.from_dist(st.u)
    assert np.isfinite(u).all()


def test_dd_odd_sizes_and_four_devices():
    # exercise unbalanced parts / padding with a non-multiple mesh on 4 devs
    cfg = StreamerConfig(nx=7, ny=9)
    m_ref = StreamerModel(cfg)
    m_dd = StreamerModel(cfg)
    d = m_dd.distribute(_mesh(4))
    st = m_ref.initial_state()
    params = _PARAMS()
    F_ref = np.asarray(m_ref.system.residual(st.u, st.u, st.u, {}, params))
    ud = d.to_dist(st.u)
    F_dd = d.from_dist(d.residual(ud, ud, ud, {}, params))
    np.testing.assert_allclose(F_dd, F_ref, rtol=1e-10,
                               atol=1e-12 * np.abs(F_ref).max())


def test_dd_glow_full_step_matches(tmp_path):
    """The maximal LMEA workload (chemistry aux fields, semi-implicit
    coefficients, facet kernels) through the distributed system."""
    from fedm_tpu.models.argon_synth import generate_argon_input
    from fedm_tpu.models.glow import GlowDischargeModel, GlowConfig

    generate_argon_input(tmp_path)
    cfg = GlowConfig(file_input=tmp_path, nx=10, ny=10, ttol=2e-3,
                     mg_levels=0)
    m_ref = GlowDischargeModel(cfg)
    st = m_ref.initial_state()
    aux = m_ref._update_aux_jit(st.u)
    params = StepParams(jnp.asarray(1e-13), jnp.asarray(1e-13),
                        jnp.asarray(1e30))
    u1, info1 = m_ref.system.step(st.u, st.u, jnp.zeros_like(st.u),
                                  aux, params)
    assert bool(info1.converged)

    m_dd = GlowDischargeModel(GlowConfig(file_input=tmp_path, nx=10, ny=10,
                                         ttol=2e-3, mg_levels=0))
    d = m_dd.distribute(_mesh(8))
    st_d = m_dd.initial_state()
    aux_d = m_dd._update_aux_jit(st_d.u)
    u2, info2 = d.step(st_d.u, st_d.u, jnp.zeros_like(st_d.u),
                       aux_d, params)
    assert bool(info2.converged)
    np.testing.assert_allclose(d.from_dist(u2), np.asarray(u1),
                               rtol=1e-6, atol=1e-10)


def test_dd_distributed_stiffness_op_matches():
    """The halo-exchanged masked Laplacian (`_dist_stiffness_op`) equals
    the single-device `masked_stiffness_op` in the original numbering."""
    m_ref, m_dd, d = _models()
    A_ref = m_ref.system.masked_stiffness_op(2)
    A_dd = d._dist_stiffness_op(2)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(m_ref.system.n_dofs)
    y_ref = np.asarray(A_ref(jnp.asarray(x)))
    xd = d.to_dist(jnp.asarray(x))
    y_dd = d.from_dist(A_dd(xd))
    np.testing.assert_allclose(y_dd, y_ref, rtol=1e-10,
                               atol=1e-12 * np.abs(y_ref).max())


def test_dd_distributed_elliptic_step():
    """With `enable_distributed_elliptic` the dd step converges to the
    same accepted state with no replicated elliptic solve in the loop."""
    m_ref, m_dd, d = _models()
    st = m_ref.initial_state()
    params = _PARAMS()
    u1, info1 = m_ref.system.step(st.u, st.u, st.u, {}, params)
    assert bool(info1.converged)

    d.enable_distributed_elliptic(2, degree=10)
    assert d._dist_ell is not None
    ud = d.to_dist(st.u)
    u2, info2 = d.step(ud, ud, ud, {}, params)
    assert bool(info2.converged)
    np.testing.assert_allclose(d.from_dist(u2), np.asarray(u1),
                               rtol=1e-6, atol=1e-10)
