"""A/B the inexact-Newton forcing term (NewtonConfig.linear_tol) on the
stiff bench checkpoint.

Round-2 profile (tools/profile_step.py): the production step is ~100%
inner BiCGStab — 3 Newton iterations x ~0.96 s, 28 Krylov iterations per
solve at linear_tol = 1e-4 (which converges to ~8e-5, 10x beyond the
rtol = 1e-3 Newton target's needs). Classic inexact-Newton theory
(Eisenstat-Walker) says the inner solve only needs to beat the CURRENT
nonlinear reduction target; with the f64-defect hi-residual Newton the
outer iteration is self-correcting. This measures step cost, Newton
iterations, rejections and trajectory agreement across forcing terms.

Usage: python tools/ab_lintol.py [tol ...]   (default 1e-4 3e-3 1e-2)
       AB_TZLINE=1 adds the transport z-line preconditioner (round-3
       lever: exact per-z-line tridiagonal solve on the electron row,
       StreamerConfig.transport_zline) to every variant.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
CKPT = ROOT / "bench_assets" / "bagheri_dz1e-5_ckpt.npz"


def run(linear_tol: float, n_adv: int, tzline: bool = False):
    import jax
    import jax.numpy as jnp

    from fedm_tpu.io.checkpoint import load_checkpoint
    from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
    from fedm_tpu.solvers.newton import NewtonConfig
    from fedm_tpu.timestepping import AdaptiveDriver

    nc = NewtonConfig(rtol=1e-3, max_iter=20, linear_tol=linear_tol,
                      linear_maxiter=400, accept_reduction=3e-2,
                      host_loop=True, hi_residual=True)
    cfg = StreamerConfig(dtype=jnp.float32, newton=nc, nx=96,
                         z_corridor=(0.0, 1.08e-2, 1e-5),
                         poisson_precond="mg-zline", density_floor=1e13,
                         r_corridor=(2e-3, 2e-5), stab_mode="off",
                         transport_zline=tzline)
    model = StreamerModel(cfg)
    model.system.use_gather_scatter()
    state = load_checkpoint(CKPT)
    driver = AdaptiveDriver(model.system, monitor_idx=1, ttol=cfg.ttol,
                            dt_min=cfg.dt_min, dt_max=cfg.dt_max,
                            post_accept=model.floor_projection())
    t0 = time.perf_counter()
    state = driver.advance(state, {})
    compile_s = time.perf_counter() - t0
    state = driver.advance(state, {})

    iters = [0]
    orig = model.system._host_iter_jit

    def counted(*a):
        iters[0] += 1
        return orig(*a)

    model.system._host_iter_jit = counted
    acc0, rej0 = state.n_accepted, state.n_rejected
    times = []
    for _ in range(n_adv):
        t1 = time.perf_counter()
        state = driver.advance(state, {})
        jax.block_until_ready(state.u)
        times.append(time.perf_counter() - t1)
    attempts = (state.n_accepted - acc0) + (state.n_rejected - rej0)

    coords = np.asarray(model.space.dof_coords)
    axis = np.isclose(coords[:, 0], 0.0)
    u = np.asarray(state.u)
    ne_axis = np.exp(u[axis, 1])
    z_axis = coords[axis, 1]
    front = float(z_axis[ne_axis > 1e18].min())
    med = float(np.median(times))
    print(f"linear_tol={linear_tol:g} tzline={int(tzline)}: median {med:.3f}s/adv, "
          f"{iters[0] / max(attempts, 1):.2f} Newton iters/attempt, "
          f"{state.n_rejected - rej0} rejects, t={state.t:.6e}, "
          f"dt={state.dt:.3e}, ne_max={ne_axis.max():.4e}, "
          f"front_z={front:.5e}, err={state.max_error[0]:.3e} "
          f"(compile {compile_s:.0f}s)", flush=True)
    return med


def main():
    tols = [float(t) for t in sys.argv[1:]] or [1e-4, 3e-3, 1e-2]
    n_adv = int(os.environ.get("AB_ADVANCES", "20"))
    tzline = os.environ.get("AB_TZLINE", "0") == "1"
    for t in tols:
        run(t, n_adv, tzline=tzline)


if __name__ == "__main__":
    main()
