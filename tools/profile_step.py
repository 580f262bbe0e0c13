"""Dissect the stiff-regime Newton-Krylov step cost (bench configuration).

Loads the same checkpoint + configuration as bench.py, then times each
component of one host-loop Newton iteration at the live state:

  - residual eval (f32) and hi-residual eval (emulated f64)
  - Jacobian action (jvp) on top of the residual
  - node-block Jacobian build + invert_blocks
  - preconditioner apply (block-Jacobi + Poisson V-cycle), V-cycle alone
  - one full preconditioned BiCGStab solve (with iteration count)
  - one full newton_iteration

and measures Newton-iterations/attempt + attempts/advance over a short
driver window. This is the evidence base for the perf levers named in
VERDICT.md round 2 ("profile the V-cycle share, cut Krylov iterations,
reuse the node-block preconditioner").
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
CKPT = ROOT / "bench_assets" / "bagheri_dz1e-5_ckpt.npz"


def t_med(fn, *args, n=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    import jax
    import jax.numpy as jnp

    import fedm_tpu  # noqa: F401
    from fedm_tpu.io.checkpoint import load_checkpoint
    from fedm_tpu.model.system import StepParams
    from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
    from fedm_tpu.solvers.linear import bicgstab
    from fedm_tpu.solvers.newton import NewtonConfig, newton_iteration
    from fedm_tpu.solvers.precond import block_apply, invert_blocks
    from fedm_tpu.timestepping import AdaptiveDriver

    nc = NewtonConfig(rtol=1e-3, max_iter=20, linear_tol=1e-4,
                      linear_maxiter=400, accept_reduction=3e-2,
                      host_loop=True, hi_residual=True)
    cfg = StreamerConfig(dtype=jnp.float32, newton=nc, nx=96,
                         z_corridor=(0.0, 1.08e-2, 1e-5),
                         poisson_precond="mg-zline", density_floor=1e13,
                         r_corridor=(2e-3, 2e-5), stab_mode="off")
    model = StreamerModel(cfg)
    model.system.use_gather_scatter()
    state = load_checkpoint(CKPT)
    sys_ = model.system
    print(f"{model.space.n_dofs} dofs, {model.space.n_dofs * model.n_eq} "
          f"unknowns, device {jax.devices()[0]}", flush=True)

    driver = AdaptiveDriver(sys_, monitor_idx=1, ttol=cfg.ttol,
                            dt_min=cfg.dt_min, dt_max=cfg.dt_max,
                            post_accept=model.floor_projection())
    t0 = time.perf_counter()
    state = driver.advance(state, {})
    print(f"first advance (compile): {time.perf_counter() - t0:.1f}s",
          flush=True)
    state = driver.advance(state, {})

    # count Newton iterations (host-loop executions) per driver advance
    orig_iter = sys_._host_iter_jit
    calls = [0]

    def counted(*a):
        calls[0] += 1
        return orig_iter(*a)

    sys_._host_iter_jit = counted
    n_adv = int(os.environ.get("PROFILE_ADVANCES", "6"))
    acc0, rej0 = state.n_accepted, state.n_rejected
    t0 = time.perf_counter()
    for _ in range(n_adv):
        state = driver.advance(state, {})
        jax.block_until_ready(state.u)
    adv_s = (time.perf_counter() - t0) / n_adv
    attempts = (state.n_accepted - acc0) + (state.n_rejected - rej0)
    print(f"advance: {adv_s:.3f}s median-window mean, "
          f"{calls[0] / max(attempts, 1):.2f} Newton iters/attempt, "
          f"{attempts / n_adv:.2f} attempts/advance", flush=True)
    sys_._host_iter_jit = orig_iter

    # dissect ONE Newton iteration at the live state
    u_old, u_old1 = state.u, state.u_old
    aux = {}
    params = StepParams(jnp.asarray(state.t), jnp.asarray(state.dt),
                        jnp.asarray(state.dt_old))
    (delta0, u_old_c, d_hist, aux_c, params_c,
     bc_shift) = sys_._cast_inputs(u_old, u_old, u_old1, aux, params)
    R = sys_.make_delta_residual_fn(u_old_c, d_hist, aux_c, params_c,
                                    bc_shift)
    R_hi = sys_._make_hi_residual(u_old, u_old1, aux, params)
    pb = sys_.block_precond_builder(u_old_c, d_hist, aux_c, params_c)

    s, _ = t_med(jax.jit(R), delta0)
    print(f"residual eval (f32):        {1e3 * s:8.2f} ms", flush=True)
    s, _ = t_med(jax.jit(R_hi), delta0)
    print(f"hi-residual eval (emul f64):{1e3 * s:8.2f} ms", flush=True)
    v = jnp.ones_like(delta0)
    s, _ = t_med(jax.jit(lambda d, w: jax.jvp(R, (d,), (w,))[1]), delta0, v)
    print(f"residual+jvp:               {1e3 * s:8.2f} ms", flush=True)
    jac = jax.jit(lambda d: sys_._jacobian_blocks(d, u_old_c, d_hist,
                                                  aux_c, params_c))
    s, blocks = t_med(jac, delta0)
    print(f"jacobian node blocks:       {1e3 * s:8.2f} ms", flush=True)
    s, inv = t_med(jax.jit(invert_blocks), blocks)
    print(f"invert_blocks:              {1e3 * s:8.2f} ms", flush=True)
    r = jnp.ones_like(delta0)
    s, _ = t_med(jax.jit(block_apply), inv, r)
    print(f"block_apply:                {1e3 * s:8.2f} ms", flush=True)
    if sys_._ell is not None:
        eq, ell_solve = sys_._ell
        s, _ = t_med(jax.jit(ell_solve), r[:, eq])
        print(f"poisson V-cycle (ell):      {1e3 * s:8.2f} ms", flush=True)

    def M_apply(d, rr):
        return pb(d)(rr)

    s, _ = t_med(jax.jit(M_apply), delta0, r)
    print(f"precond build+apply:        {1e3 * s:8.2f} ms", flush=True)

    def kry(d):
        f, jvp = jax.linearize(R, d)
        fh = R_hi(d).astype(f.dtype)
        M = pb(d)
        x, relres, iters = bicgstab(lambda w: M(jvp(w)), M(-fh),
                                    tol=nc.linear_tol,
                                    maxiter=nc.linear_maxiter)
        return relres, iters

    s, (relres, iters) = t_med(jax.jit(kry), delta0, n=5)
    print(f"BiCGStab solve:             {1e3 * s:8.2f} ms  "
          f"(relres {float(relres):.2e}, iters {int(iters)})", flush=True)

    fn0 = jnp.asarray(float(np.linalg.norm(np.asarray(R_hi(delta0)))),
                      jnp.float64)

    def full_iter(d, fn):
        return newton_iteration(R, d, fn, nc, pb, residual_hi=R_hi)[:3]

    s, out = t_med(jax.jit(full_iter), delta0, fn0, n=5)
    print(f"full newton_iteration:      {1e3 * s:8.2f} ms  "
          f"(linres {float(out[2]):.2e})", flush=True)


if __name__ == "__main__":
    main()
