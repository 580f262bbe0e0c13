"""Microprofile of the full-gap finish mesh vs the bench mesh on the
live device: where do the 130 s/iteration go?

The 484k-unknown bench config runs host-loop Newton iterations in
~0.5-1 s; the 547k full-gap finish config (only 13% bigger) measured
~130 s per iteration (runs/bagheri14_T attempt logs). This times each
piece on both meshes: f32 delta-residual, hi-residual, jvp, block
preconditioner application (incl. the mg-zline V-cycle), and one
host-iteration execution at a representative state.

Usage: python tools/fullgap_micro.py [--mesh fullgap|bench] [--iters 2]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def timeit(fn, *a, n=3):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", choices=["fullgap", "bench"],
                    default="fullgap")
    ap.add_argument("--maxiter", type=int, default=150)
    ap.add_argument("--ckpt", type=Path, default=None,
                    help="optional state checkpoint (matching mesh)")
    args = ap.parse_args()

    import jax.numpy as jnp

    import fedm_tpu  # noqa: F401
    from fedm_tpu.io.checkpoint import load_checkpoint
    from fedm_tpu.model.system import StepParams
    from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
    from fedm_tpu.solvers.newton import NewtonConfig

    nc = NewtonConfig(rtol=1e-3, max_iter=20, linear_tol=1e-2,
                      linear_maxiter=args.maxiter, accept_reduction=3e-2,
                      host_loop=True, hi_residual=True,
                      true_res_rescue=1.0)
    if args.mesh == "fullgap":
        corr = (1e-4, 1.24e-2, 1e-5)
        extra = dict(z_tail_cells=(10, 10))
    else:
        corr = (0.0, 1.08e-2, 1e-5)
        extra = {}
    cfg = StreamerConfig(dtype=jnp.float32, newton=nc, nx=96,
                         z_corridor=corr, stab_mode="off",
                         poisson_precond="mg-zline", T_final=1.4e-8,
                         r_corridor=(2e-3, 2e-5), density_floor=1e13,
                         **extra)
    t0 = time.perf_counter()
    m = StreamerModel(cfg)
    m.system.use_gather_scatter()
    sys_ = m.system
    print(f"setup {time.perf_counter()-t0:.1f}s: {m.space.n_dofs} dofs "
          f"({3*m.space.n_dofs} unknowns) on {jax.devices()[0]}",
          flush=True)

    if args.ckpt is not None:
        state = load_checkpoint(args.ckpt)
        u = jnp.asarray(state.u)
        dt = jnp.asarray(state.dt)
    else:
        st = m.initial_state()
        u = st.u
        dt = jnp.asarray(1e-13)
    p = StepParams(jnp.asarray(1e-9) if args.ckpt is None
                   else jnp.asarray(state.t + float(dt)), dt,
                   jnp.asarray(1e30))
    aux = {}

    # f32 delta-residual
    (_, u_old_c, d_hist, aux_c, params_c,
     bc_shift) = sys_._cast_inputs(u, u, u, aux, p)
    R = sys_.make_delta_residual_fn(u_old_c, d_hist, aux_c, params_c,
                                    bc_shift)
    delta0 = jnp.zeros((m.space.n_dofs, 3), sys_.dtype)
    Rj = jax.jit(R)
    t0 = time.perf_counter(); jax.block_until_ready(Rj(delta0))
    print(f"f32 residual: compile {time.perf_counter()-t0:.1f}s, "
          f"eval {timeit(Rj, delta0)*1e3:.1f} ms", flush=True)

    # hi residual
    if sys_._hi_enabled():
        Rh = jax.jit(sys_._make_hi_residual(u, u, aux, p))
        t0 = time.perf_counter(); jax.block_until_ready(Rh(delta0))
        print(f"hi residual: compile {time.perf_counter()-t0:.1f}s, "
              f"eval {timeit(Rh, delta0)*1e3:.1f} ms", flush=True)

    # jvp
    def jvp_fn(d):
        return jax.jvp(R, (delta0,), (d,))[1]
    Jj = jax.jit(jvp_fn)
    t0 = time.perf_counter(); jax.block_until_ready(Jj(delta0))
    print(f"jvp: compile {time.perf_counter()-t0:.1f}s, "
          f"eval {timeit(Jj, delta0)*1e3:.1f} ms", flush=True)

    # block preconditioner (incl. mg-zline V-cycle)
    Mb = sys_.block_precond_builder(u_old_c, d_hist, aux_c, params_c)

    def precond_apply(d):
        return Mb(delta0)(d)
    Pj = jax.jit(precond_apply)
    t0 = time.perf_counter(); jax.block_until_ready(Pj(delta0))
    print(f"precond apply: compile {time.perf_counter()-t0:.1f}s, "
          f"eval {timeit(Pj, delta0)*1e3:.1f} ms", flush=True)

    # one full host-iteration execution
    it_jit = jax.jit(sys_._host_iter_impl)
    r0_jit = jax.jit(sys_._host_res0_impl)
    fn = r0_jit(delta0, u, u, aux, p)
    t0 = time.perf_counter()
    out = it_jit(delta0, fn, u, u, aux, p)
    jax.block_until_ready(out[0])
    print(f"host-iter: compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    for k in range(3):
        t0 = time.perf_counter()
        out = it_jit(out[0], out[1], u, u, aux, p)
        jax.block_until_ready(out[0])
        print(f"  iter {k}: {time.perf_counter()-t0:.1f}s "
              f"fnorm={float(out[1]):.3e} linres={float(out[2]):.2e} "
              f"improved={bool(out[3])}", flush=True)


if __name__ == "__main__":
    main()
