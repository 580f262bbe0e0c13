"""Component-level probe of the streamer Newton step at a given mesh size.

Diagnoses resolution-scaling failures (e.g. the dz=1e-5 / dz=5e-6
first-step failures this tool was written for) by exercising each stage of
the production step in isolation and printing finiteness + norms:

  1. residual assembly at the probe state
  2. JVP (Jacobian action) on a random tangent
  3. node-block Jacobian build + inversion + preconditioner apply
     (includes the elliptic V-cycle / z-line solve on the Poisson block)
  4. one full Newton step (converged, iters, |F|, linres)

Usage: python tools/streamer_probe.py [--dz 1e-5] [--nx 96]
           [--state ckpt.npz] [--stage N]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dz", type=float, default=1e-5)
    ap.add_argument("--nx", type=int, default=96)
    ap.add_argument("--state", type=Path, default=None,
                    help="optional checkpoint to probe at (else fresh init)")
    ap.add_argument("--stab", default="peclet")
    ap.add_argument("--precond", default="mg-zline")
    ap.add_argument("--stage", type=int, default=4,
                    help="run stages 1..N (default all)")
    ap.add_argument("--mg-levels", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import fedm_tpu  # noqa: F401
    from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
    from fedm_tpu.model.system import StepParams
    from fedm_tpu.solvers.newton import NewtonConfig

    nc = NewtonConfig(rtol=3e-3, max_iter=20, linear_tol=1e-4,
                      linear_maxiter=400)
    extra = {} if args.mg_levels is None else {"mg_levels": args.mg_levels}
    cfg = StreamerConfig(nx=args.nx, z_corridor=(0.0, 1.08e-2, args.dz),
                         stab_mode=args.stab, poisson_precond=args.precond,
                         density_floor=1e13, dtype=jnp.float32, newton=nc,
                         **extra)
    t0 = time.perf_counter()
    model = StreamerModel(cfg)
    model.system.use_gather_scatter()
    sys_ = model.system
    print(f"setup {time.perf_counter()-t0:.1f}s: {model.space.n_dofs} dofs "
          f"({3*model.space.n_dofs} unknowns) on {jax.devices()[0]}",
          flush=True)

    if args.state is not None:
        from fedm_tpu.io.checkpoint import load_checkpoint
        st = load_checkpoint(args.state)
        u0, t_now, dt = st.u, float(st.t), float(st.dt)
        dt_old = float(st.dt_old)
    else:
        st = model.initial_state()
        u0, t_now, dt = st.u, 0.0, cfg.dt_init
        dt_old = 1e30
    u0 = jnp.asarray(u0)
    params = StepParams(jnp.asarray(t_now + dt), jnp.asarray(dt),
                        jnp.asarray(dt_old))

    def stat(name, x):
        x = np.asarray(x)
        fin = np.isfinite(x).all()
        print(f"  {name}: finite={bool(fin)} |max|={np.abs(x).max():.4e} "
              f"l2={np.linalg.norm(x.ravel().astype(np.float64)):.4e}",
              flush=True)
        return fin

    # stage 1: residual at u0
    t0 = time.perf_counter()
    F = jax.jit(sys_.residual)(u0, u0, u0, {}, params)
    jax.block_until_ready(F)
    print(f"[1] residual ({time.perf_counter()-t0:.1f}s incl compile)",
          flush=True)
    stat("F(u0)", F)
    if args.stage < 2:
        return

    # the delta-formulation inputs the production step uses
    (delta0, u_old_c, d_hist, aux_c, params_c,
     bc_shift) = sys_._cast_inputs(u0, u0, u0, {}, params)

    # stage 2: JVP on the delta residual
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, delta0.shape, delta0.dtype)

    def Jv_fn(d, t):
        R = sys_.make_delta_residual_fn(u_old_c, d_hist, aux_c, params_c,
                                        bc_shift)
        return jax.jvp(R, (d,), (t,))[1]

    t0 = time.perf_counter()
    Jv = jax.jit(Jv_fn)(delta0, v)
    jax.block_until_ready(Jv)
    print(f"[2] JVP ({time.perf_counter()-t0:.1f}s)", flush=True)
    stat("J@v", Jv)
    if args.stage < 3:
        return

    # stage 3: node-block Jacobian + inversion + full preconditioner apply
    t0 = time.perf_counter()
    blocks = jax.jit(sys_._jacobian_blocks)(delta0, u_old_c, d_hist, aux_c,
                                            params_c)
    jax.block_until_ready(blocks)
    print(f"[3] node blocks ({time.perf_counter()-t0:.1f}s)", flush=True)
    stat("blocks", blocks)
    from fedm_tpu.solvers.precond import invert_blocks
    binv = jax.jit(invert_blocks)(blocks)
    stat("inv(blocks)", binv)
    build = sys_.block_precond_builder(u_old_c, d_hist, aux_c, params_c)

    def apply_M(d, r):
        return build(d)(r)

    t0 = time.perf_counter()
    MF = jax.jit(apply_M)(delta0, F.astype(delta0.dtype))
    jax.block_until_ready(MF)
    print(f"    precond apply {time.perf_counter()-t0:.2f}s "
          f"(incl elliptic {args.precond})", flush=True)
    stat("M F", MF)
    if args.stage < 4:
        return

    # stage 4: one full Newton step
    t0 = time.perf_counter()
    u1, info = sys_.step(u0, u0, u0, {}, params)
    jax.block_until_ready(u1)
    print(f"[4] newton step ({time.perf_counter()-t0:.1f}s): "
          f"converged={bool(info.converged)} iters={int(info.iters)} "
          f"|F|={float(info.res_norm):.4e} res0={float(info.res0_norm):.4e} "
          f"linres={float(info.lin_relres):.4e}", flush=True)
    stat("u1", u1)


if __name__ == "__main__":
    main()
