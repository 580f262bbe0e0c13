"""Full-gap-scale precision escalation (round-4 verdict "next" item 5).

The reference's robustness backstop is an always-available MUMPS f64
direct solve (`/root/reference/fedm/functions.py:1154-1161`,
`examples/glow_discharge/fedm-gd.py:32`). At the 547k-unknown full-gap
finish size the r3-era emulated-f64 program crashed the tunneled TPU
worker; round 5 re-enables `--f64` there on the STATIC full-gap mesh
(geometry baked into the program) with Krylov-bounded executions
(`linear_maxiter` + `linear_stall_window`) — the same two fixes that
stopped the f32 worker crashes at that size (commit 0702152).

This test pins the escalation CONFIGURATION on CPU at miniature size:
the f64 host-loop bounded-Krylov program (the exact NewtonConfig shape
`tools/bagheri_run.py --f64 --full-gap` builds, including the r5
delta_clip and stall window) must march accepted steps and stay on the
f32+hi-residual production trajectory to ttol-level agreement.
"""

import jax.numpy as jnp
import numpy as np

from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
from fedm_tpu.solvers.newton import NewtonConfig
from fedm_tpu.timestepping import AdaptiveDriver


def _march(dtype, hi_residual, n=3):
    nc = NewtonConfig(rtol=1e-3, max_iter=20, linear_tol=1e-2,
                      linear_maxiter=150, linear_stall_window=25,
                      accept_reduction=3e-2, host_loop=True,
                      hi_residual=hi_residual,
                      delta_clip=(15.0, 15.0, float("inf")))
    cfg = StreamerConfig(nx=12, ny=24, dtype=dtype, newton=nc,
                         mg_levels=0, density_floor=1e13, stab_mode="off")
    m = StreamerModel(cfg)
    m.system.use_gather_scatter()
    st = m.initial_state()
    d = AdaptiveDriver(m.system, 1, m.cfg.ttol, m.cfg.dt_min, m.cfg.dt_max,
                       post_accept=m.floor_projection())
    for _ in range(n):
        st = d.advance(st, {})
    return st


def test_f64_fullgap_config_marches_and_matches_f32_hires():
    st64 = _march(jnp.float64, hi_residual=False)
    st32 = _march(jnp.float32, hi_residual=True)
    assert st64.n_accepted == 3 and st64.n_rejected == 0
    assert st32.n_accepted == 3
    assert np.isfinite(np.asarray(st64.u)).all()
    # both trajectories are ttol-guarded; the escalation must stay on the
    # production trajectory (same t to ~ttol, fields close in log space)
    assert abs(st64.t - st32.t) / st32.t < 1e-2
    np.testing.assert_allclose(np.asarray(st32.u, dtype=np.float64),
                               np.asarray(st64.u), rtol=1e-3, atol=1e-2)
