"""Host sparse-direct Newton rescue (solvers/direct.py) — the MUMPS role.

The reference solves every Newton system with the MUMPS direct solver
(`/root/reference/examples/streamer_discharge/fedm-streamer.py:26`);
`DirectNewton` restores that robustness as an AdaptiveDriver escalation:
exact Jacobian by colored JVP probing on device, SuperLU factorization on
host. Correctness gates here: (1) the distance-2 coloring is valid on the
real mesh adjacency, (2) the probed sparse Jacobian equals the dense
autodiff Jacobian exactly, (3) a full DirectNewton step converges on the
production streamer residual and agrees with the Krylov path, (4) the
driver escalation accepts a step the primary solver refuses."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import fedm_tpu  # noqa: F401
from fedm_tpu.model.system import StepParams
from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
from fedm_tpu.solvers.direct import (
    DirectNewton, build_adjacency_pairs, greedy_distance2_coloring)


@pytest.fixture(scope="module")
def small_model():
    return StreamerModel(StreamerConfig(dtype=jnp.float32, nx=6, ny=8,
                                        mg_levels=0))


def _params(model, scale=1.0):
    dt = model.cfg.dt_init * scale
    return StepParams(jnp.asarray(dt), jnp.asarray(dt), jnp.asarray(1e30))


def test_distance2_coloring_is_valid(small_model):
    sys_ = small_model.system
    mm, nn = build_adjacency_pairs(np.asarray(sys_.cell_batch.dofs),
                                   sys_.n_dofs)
    colors = greedy_distance2_coloring(mm, nn, sys_.n_dofs)
    assert colors.min() >= 0
    # distance-2 property: for every row m, all adjacent columns n have
    # distinct colors (the collision-freedom JVP probing needs)
    from collections import defaultdict

    cols_of_row = defaultdict(list)
    for m, n in zip(mm, nn):
        cols_of_row[m].append(colors[n])
    for m, cs in cols_of_row.items():
        assert len(cs) == len(set(cs)), f"color collision in row {m}"
    # and it should be economical on a P1 triangulation
    assert colors.max() + 1 <= 16


def test_probed_jacobian_matches_dense_autodiff(small_model):
    model = small_model
    sys_ = model.system
    s = model.initial_state()
    params = _params(model)
    dn = DirectNewton(sys_)
    dn.prepare()
    dn._build_jits()
    rng = np.random.default_rng(0)
    delta = jnp.asarray(
        0.01 * rng.standard_normal((sys_.n_dofs, sys_.n_eq)), sys_.dtype)
    J = dn._assemble(delta, s.u, s.u_old1, {}, params, ()).toarray()

    (_, u_old_c, d_hist, aux_c, params_c,
     bc_shift) = sys_._cast_inputs(s.u, s.u, s.u_old1, {}, params)
    R = sys_.make_delta_residual_fn(u_old_c, d_hist, aux_c, params_c,
                                    bc_shift)
    n = sys_.n_dofs * sys_.n_eq
    Rf = lambda x: R(x.reshape(sys_.n_dofs, sys_.n_eq)).reshape(-1)
    J_dense = np.asarray(jax.jacfwd(Rf)(delta.reshape(-1)))
    # identical arithmetic path (jvp columns), so agreement is exact up
    # to f32 evaluation-order noise
    scale = np.abs(J_dense).max()
    assert np.allclose(J, J_dense, atol=1e-5 * scale), (
        np.abs(J - J_dense).max(), scale)


def test_direct_step_converges_and_matches_krylov(small_model):
    model = small_model
    s = model.initial_state()
    params = _params(model)
    u_krylov, info_k = model.system.step(s.u, s.u, s.u_old1, {}, params)
    dn = DirectNewton(model.system)
    u_direct, info_d = dn.step(s.u, s.u, s.u_old1, {}, params)
    assert bool(info_d.converged)
    assert dn.n_factorizations >= 1
    assert bool(info_k.converged)
    # same nonlinear system, both converged to rtol: states agree to the
    # Newton tolerance scale
    du = np.abs(np.asarray(u_direct) - np.asarray(u_krylov))
    ref = np.abs(np.asarray(u_krylov) - np.asarray(s.u)).max() + 1e-12
    assert du.max() <= 2e-2 * max(ref, 1.0), (du.max(), ref)


def test_driver_escalates_to_direct_rescue(small_model):
    """A primary solver too weak to converge (1 Newton iter, 1 Krylov
    iter) must NOT cost the run: the driver escalates to the direct
    fallback at the same dt and accepts."""
    from dataclasses import replace

    from fedm_tpu.timestepping import AdaptiveDriver

    model = small_model
    weak = StreamerModel(StreamerConfig(
        dtype=jnp.float32,
        newton=replace(model.cfg.newton, max_iter=1, linear_maxiter=1,
                       rtol=1e-10, accept_reduction=0.0, max_stalls=1),
        nx=6, ny=8, mg_levels=0), mesh=model.mesh)
    drv = AdaptiveDriver(
        weak.system, monitor_idx=1, ttol=model.cfg.ttol,
        dt_min=1e-16, dt_max=5e-12,
        fallback_system=DirectNewton(weak.system, rtol=1e-3))
    s0 = model.initial_state()
    s1 = drv.advance(s0, {})
    assert s1.n_accepted == 1
    assert drv.n_escalated >= 1
    assert s1.t > s0.t
