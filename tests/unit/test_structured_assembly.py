"""Structured slice/pad assembly (CellBatch.set_structured): exact
equivalence with the unstructured gather/segment-sum and ELL paths, and
through a full coupled residual."""

import numpy as np
import jax.numpy as jnp

from fedm_tpu.fem import CellBatch, FunctionSpace
from fedm_tpu.mesh import rectangle_mesh


def _batch(nx=7, ny=5, diagonal="right"):
    mesh = rectangle_mesh((0, 0), (1.0, 0.7), nx, ny, diagonal)
    space = FunctionSpace(mesh, 1)
    return CellBatch(space, quad_degree=2, axisymmetric=True)


def test_try_structured_engages_on_canonical_mesh():
    b = _batch()
    assert b.try_structured()
    assert b._structured == (7, 5)


def test_try_structured_rejects_left_diagonal():
    b = _batch(diagonal="left")
    assert not b.try_structured()
    assert b._structured is None


def test_gather_matches_unstructured():
    rng = np.random.default_rng(0)
    b = _batch()
    u = jnp.asarray(rng.standard_normal((b.n_dofs, 3)))
    ref = np.asarray(u[b.dofs])
    assert b.try_structured()
    got = np.asarray(b.gather(u))
    np.testing.assert_array_equal(got, ref)
    # 1-component fields too
    u1 = u[:, 0]
    np.testing.assert_array_equal(np.asarray(b.gather(u1)),
                                  np.asarray(u1[b.dofs]))


def test_scatter_matches_segment_sum_and_ell():
    rng = np.random.default_rng(1)
    b_seg = _batch()
    n_cells = b_seg.dofs.shape[0]
    contrib = jnp.asarray(rng.standard_normal((n_cells, 3, 2)))
    ref = np.asarray(b_seg.scatter(contrib))

    b_ell = _batch()
    b_ell.build_scatter_meta(1)
    np.testing.assert_allclose(np.asarray(b_ell.scatter(contrib)), ref,
                               rtol=1e-13, atol=1e-13)

    b_st = _batch()
    assert b_st.try_structured()
    np.testing.assert_allclose(np.asarray(b_st.scatter(contrib)), ref,
                               rtol=1e-13, atol=1e-13)
    # scalar trailing shape
    c1 = contrib[:, :, 0]
    np.testing.assert_allclose(np.asarray(b_st.scatter(c1)),
                               np.asarray(b_seg.scatter(c1)),
                               rtol=1e-13, atol=1e-13)


def test_full_streamer_residual_identical_across_assembly_modes():
    from fedm_tpu.model.system import StepParams
    from fedm_tpu.models.streamer import StreamerModel, StreamerConfig

    cfg = dict(nx=10, ny=14, stab_mode="peclet")
    m_ref = StreamerModel(StreamerConfig(**cfg))
    m_st = StreamerModel(StreamerConfig(**cfg))
    m_st.system.use_gather_scatter()
    assert m_st.system.cell_batch._structured is not None

    st = m_ref.initial_state()
    params = StepParams(jnp.asarray(st.t + st.dt), jnp.asarray(st.dt),
                        jnp.asarray(st.dt_old))
    rng = np.random.default_rng(2)
    delta = jnp.asarray(rng.standard_normal(st.u.shape) * 1e-3)
    r_ref = np.asarray(m_ref.system.residual(st.u + delta, st.u, st.u,
                                             {}, params))
    r_st = np.asarray(m_st.system.residual(st.u + delta, st.u, st.u,
                                           {}, params))
    # summation order differs between the pad+add and segment-sum paths;
    # the Poisson component cancels ~1e12-scale space-charge terms down to
    # ~1e-5 residuals, so compare with a column-magnitude-scaled atol
    for c in range(3):
        scale = np.abs(r_ref[:, c]).max()
        np.testing.assert_allclose(r_st[:, c], r_ref[:, c],
                                   rtol=1e-7, atol=1e-8 * scale)
