"""Zero-recompile moving-window machinery:

- fixed-topology corridor generator (`StreamerConfig.z_tail_cells`):
  identical node counts for every window position;
- `StructuredPoissonMG`: host-assembled stencil hierarchy matches the
  operator and preconditions it well;
- geom mode (`CoupledSystem.enable_geom_mode` + `move_window`): stepping
  after a window move on the SAME compiled system reproduces a freshly
  built model at the new window, with zero retraces of the step fns.

Reference tie-in: the reference has no moving mesh at all — its flagship
streamer (`/root/reference/examples/streamer_discharge/fedm-streamer.py:67`,
T=14 ns) relies on an externally supplied globally-fine `mesh.xml`; the
window is how the TPU build reaches the same horizon at a constant DOF
count.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import fedm_tpu  # noqa: F401
from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
from fedm_tpu.solvers.newton import NewtonConfig

SPAN = 1.5e-3
DZ = 5e-5
BASE = dict(r_corridor=(2e-3, 2e-4), z_tail_cells=(12, 12), mg_levels=3,
            poisson_precond="mg-zline", dtype=jnp.float32,
            density_floor=1e13)


def _cfg(z0, **kw):
    nc = NewtonConfig(rtol=1e-3, max_iter=20, linear_tol=1e-4,
                      linear_maxiter=200, accept_reduction=3e-2,
                      host_loop=True, hi_residual=True)
    return StreamerConfig(z_corridor=(z0, z0 + SPAN, DZ), newton=nc,
                          **{**BASE, **kw})


def test_fixed_topology_generator():
    zs = {}
    for z0 in (8.5e-3, 6.0e-3, 3.3e-3, 1e-4):
        zs[z0] = StreamerModel._z_coords(_cfg(z0))
        assert zs[z0][0] == 0.0
        assert zs[z0][-1] == pytest.approx(0.0125)
        assert np.all(np.diff(zs[z0]) > 0)
    counts = {len(v) for v in zs.values()}
    assert len(counts) == 1, "node count must be window-position-invariant"
    # the corridor carries at least span/dz consecutive cells of exactly dz
    z = zs[6.0e-3]
    n_dz = np.isclose(np.diff(z), DZ).sum()
    assert n_dz >= int(round(SPAN / DZ))


def test_structured_mg_matches_operator():
    """The host-assembled stencil IS the masked Laplacian: one V-cycle
    must precondition A to a contraction (relres << 1)."""
    m = StreamerModel(_cfg(7e-3))
    assert m._smg is not None, "StructuredPoissonMG should engage on mg-zline"
    A = m.system.masked_stiffness_op(2)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(m.space.n_dofs), m.batch.dtype)
    x = m._smg.precond(b)
    relres = float(jnp.linalg.norm(b - A(x)) / jnp.linalg.norm(b))
    assert relres < 0.35, relres


def test_move_window_zero_recompile_equivalence():
    """Step, move the window, step again on the SAME system/driver; a
    freshly built model at the new window and the remapped state must
    produce the same next step — and the step functions must not have
    been re-jitted by the move."""
    mA = StreamerModel(_cfg(8.5e-3))
    mA.system.use_gather_scatter()
    mA.system.enable_geom_mode()
    drv = mA.make_driver()
    s = mA.initial_state()
    s = drv.advance(s, {})
    s = drv.advance(s, {})

    iter_jit_before = mA.system._host_iter_jit
    new_corr = (6.0e-3, 6.0e-3 + SPAN, DZ)
    s_pre = s
    s_moved = mA.move_window(new_corr, s_pre)
    assert mA.system._host_iter_jit is iter_jit_before, (
        "move_window must not invalidate the compiled step")
    s3 = drv.advance(s_moved, {})

    # fresh reference build at the new window, fed the SAME pre-move state
    # remapped through an unmoved twin of the original model (bitwise
    # comparison: both paths then run identical math on identical data)
    mA0 = StreamerModel(_cfg(8.5e-3))
    mB = StreamerModel(_cfg(6.0e-3))
    mB.system.use_gather_scatter()
    mB.system.enable_geom_mode()
    # restrict=False: move_window remaps by pure interpolation, so the
    # fresh-build comparison path must too (bitwise-identical data)
    sB = mA0.remap_state(mB, s_pre, restrict=False)
    s3B = mB.make_driver().advance(sB, {})

    assert s3.t == pytest.approx(s3B.t)
    du = np.abs(np.asarray(s3.u) - np.asarray(s3B.u)).max()
    assert du == 0.0, f"moved-window step diverges from fresh build: {du}"


def test_checkpoint_meta_roundtrip(tmp_path):
    """Corridor metadata travels INSIDE the checkpoint npz (round-2
    advisor fix: the split checkpoint/window.json pair could desync)."""
    from fedm_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    from fedm_tpu.timestepping import TimeState

    u = jnp.asarray(np.random.default_rng(1).standard_normal((10, 3)))
    st = TimeState(u=u, u_old=u, u_old1=u, t=1e-9, dt=2e-12, dt_old=1e-12,
                   max_error=[1e-4, 2e-4, 3e-4], n_accepted=5, n_rejected=2)
    p = tmp_path / "ck.npz"
    save_checkpoint(p, st, meta={"z_corridor": (6e-3, 7.5e-3, 2.5e-6)})
    st2, meta = load_checkpoint(p, with_meta=True)
    assert np.allclose(meta["z_corridor"], (6e-3, 7.5e-3, 2.5e-6))
    assert st2.t == st.t and st2.n_accepted == 5
    np.testing.assert_array_equal(np.asarray(st2.u), np.asarray(st.u))
    # legacy checkpoints (no meta) load fine
    save_checkpoint(p, st)
    st3, meta3 = load_checkpoint(p, with_meta=True)
    assert meta3 == {} and st3.n_rejected == 2


def test_wall_clustered_tail_geometry():
    """`z_wall_dz` (sheath regime, docs/BAGHERI14_RUN.md post-arrival):
    same node count as the default tail for every window position, first
    cell at the wall ~ dz_wall instead of the default tail's coarsest-at-
    the-wall shape, smooth meeting at the corridor edge."""
    dz_wall = 1e-6
    for z0 in (1e-4, 3.3e-3, 8.5e-3):
        z_plain = StreamerModel._z_coords(_cfg(z0))
        z_wall = StreamerModel._z_coords(_cfg(z0, z_wall_dz=dz_wall))
        assert len(z_wall) == len(z_plain), (
            "wall clustering must not change the corridor topology")
        assert z_wall[0] == 0.0 and np.all(np.diff(z_wall) > 0)
        # clustered: first cell within 2x of the requested wall size
        # (exact-closure rescaling can stretch it slightly)
        assert z_wall[1] - z_wall[0] < 2 * dz_wall, z_wall[:3]
        # default tail is coarsest at the wall once the window is away
        # from it; the clustered tail must beat it by >~10x there
        if z0 > 1e-3:
            assert (z_plain[1] - z_plain[0]) > 10 * (z_wall[1] - z_wall[0])
        # the cell adjacent to the corridor edge stays within ~3x of dz
        i = np.searchsorted(z_wall, z0) - 1
        assert z_wall[i + 1] - z_wall[i] < 3 * DZ


def test_wall_clustered_window_move_keeps_topology():
    """A window move with `z_wall_dz` set keeps shapes (the zero-recompile
    contract) and remaps the state onto the clustered geometry."""
    m = StreamerModel(_cfg(8.5e-3, z_wall_dz=1e-6))
    m.system.use_gather_scatter()
    m.system.enable_geom_mode()
    drv = m.make_driver()
    s = drv.advance(m.initial_state(), {})
    iter_jit = m.system._host_iter_jit
    s2 = m.move_window((6.0e-3, 6.0e-3 + SPAN, DZ), s)
    assert m.system._host_iter_jit is iter_jit
    assert s2.u.shape == s.u.shape
    zs = np.unique(m.mesh.coords[:, 1])
    assert zs[1] - zs[0] < 2e-6, "wall clustering lost across the move"
    s3 = drv.advance(s2, {})
    assert np.isfinite(np.asarray(s3.u)).all()


def test_wall_dz_resume_remap_roundtrip():
    """Changing the wall spacing across a resume must remap the fields,
    not reload them onto shifted z-lines: interpolate a smooth analytic
    profile from plain-tail z-lines onto clustered ones via `_remap_z`
    and check it reproduces the profile on the new nodes."""
    cfg_plain = _cfg(1e-4)
    cfg_wall = _cfg(1e-4, z_wall_dz=1e-6)
    m = StreamerModel(cfg_wall)
    zs_src = StreamerModel._z_coords(cfg_plain)
    zs_dst = np.unique(m.mesh.coords[:, 1])
    n_r = len(np.unique(m.mesh.coords[:, 0]))

    from fedm_tpu.timestepping import TimeState

    def profile(z):
        return np.sin(2 * np.pi * z / 0.0125)

    # node id = iz * n_r + ir: same profile on every radial line
    u_src = np.repeat(profile(zs_src), n_r)[:, None] * np.ones((1, m.n_eq))
    st = TimeState(u=jnp.asarray(u_src), u_old=jnp.asarray(u_src),
                   u_old1=jnp.asarray(u_src), t=0.0, dt=1e-12, dt_old=1e-12,
                   max_error=[1e-4] * 3, n_accepted=1, n_rejected=0)
    st2 = m._remap_z(st, zs_src, zs_dst, n_r)
    got = np.asarray(st2.u)[:, 0].reshape(len(zs_dst), n_r)[:, 0]
    # linear interpolation of a smooth profile: small but nonzero error
    assert np.abs(got - profile(zs_dst)).max() < 5e-3
    assert st2.n_accepted == 1 and st2.dt == st.dt


def test_corridor_dz_resume_remap_roundtrip():
    """Changing the corridor SPACING across a resume (finishing the
    post-arrival tail at the reference's own dz, docs/BAGHERI14_RUN.md)
    changes the z-line COUNT: `_remap_z` must interpolate onto the new
    lines, both directions (fine -> coarse -> fine reproduces a smooth
    profile up to linear-interpolation error)."""
    import dataclasses

    cfg_fine = _cfg(1e-4)                              # dz = DZ
    cfg_coarse = dataclasses.replace(
        cfg_fine, z_corridor=(1e-4, 1e-4 + SPAN, 2 * DZ))
    m_fine = StreamerModel(cfg_fine)
    m_coarse = StreamerModel(cfg_coarse)
    zs_fine = np.unique(m_fine.mesh.coords[:, 1])
    zs_coarse = np.unique(m_coarse.mesh.coords[:, 1])
    assert len(zs_coarse) < len(zs_fine)
    n_r = len(np.unique(m_fine.mesh.coords[:, 0]))
    assert n_r == len(np.unique(m_coarse.mesh.coords[:, 0]))

    from fedm_tpu.timestepping import TimeState

    def profile(z):
        return np.sin(2 * np.pi * z / 0.0125)

    u_src = np.repeat(profile(zs_fine), n_r)[:, None] * np.ones(
        (1, m_fine.n_eq))
    st = TimeState(u=jnp.asarray(u_src), u_old=jnp.asarray(u_src),
                   u_old1=jnp.asarray(u_src), t=0.0, dt=1e-12, dt_old=1e-12,
                   max_error=[1e-4] * 3, n_accepted=1, n_rejected=0)
    down = m_coarse._remap_z(st, zs_fine, zs_coarse, n_r)
    assert down.u.shape == (len(zs_coarse) * n_r, m_fine.n_eq)
    back = m_fine._remap_z(down, zs_coarse, zs_fine, n_r)
    got = np.asarray(back.u)[:, 0].reshape(len(zs_fine), n_r)[:, 0]
    err = np.abs(got - profile(zs_fine))
    # tight in the corridor (uniform spacing both ways); the geometric
    # outer tails are coarse by design, so only loosely bounded there
    in_corr = (zs_fine >= 1e-4) & (zs_fine <= 1e-4 + SPAN)
    assert err[in_corr].max() < 2e-2
    assert err.max() < 0.5
    assert back.n_accepted == 1 and back.dt == st.dt
