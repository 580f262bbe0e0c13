"""Residual-level autopsy of the coarse-corridor tail resume refusal.

Replicates `tools/bagheri_run.py --resume --window-dz 1e-5` on the
`runs/bagheri14_tail` checkpoint (dz 2.5e-6 -> 1e-5 cross-resolution
remap, restrict=True, BDF history restart) ON CPU, then dissects what
Newton actually sees instead of letting the adaptive driver walk dt to
dt_min:

  1. remapped-state sanity (per-column min/max, finiteness),
  2. the initial residual F(delta=0) at several dt: norm, non-finite
     count, per-equation max |F| and its z location,
  3. a manually-driven host-loop Newton iteration trace (fnorm, linres,
     improved) at the probe dt.

The working hypothesis this probe decides: a backward-Euler step at
dt -> 0 is near-identity and MUST converge, so a refusal at every dt
down to 1e-15 means the residual/preconditioner at the remapped state
is structurally broken (non-finite entries or a dt-independent
inconsistency), not that the transient is stiff.

Usage: python tools/tail_diag.py [--ckpt runs/bagheri14_tail/checkpoint.npz]
           [--dst-dz 1e-5] [--dts 1e-12,1e-13,1e-15] [--iters 6]
           [--no-restrict] [--rescue 1.0]
"""

import argparse
import dataclasses
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--tpu" not in sys.argv:
    # pre-backend-init (conftest trick); sitecustomize imports jax before
    # env vars can apply, so JAX_PLATFORMS=cpu does NOT work for tools
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=Path,
                    default=Path("runs/bagheri14_tail/checkpoint.npz"))
    ap.add_argument("--dst-dz", type=float, default=1e-5)
    ap.add_argument("--dts", default="1e-12,1e-13,1e-15")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--no-restrict", action="store_true")
    ap.add_argument("--rescue", type=float, default=1.0)
    ap.add_argument("--linear-tol", type=float, default=1e-2)
    ap.add_argument("--tpu", action="store_true",
                    help="probe on the real chip (default: CPU, so a "
                         "production TPU run can stay live)")
    ap.add_argument("--stab", default="off", choices=["off", "peclet", "linear"])
    ap.add_argument("--tail-lo", type=int, default=48,
                    help="destination lower-tail cell count (the source "
                         "checkpoint's is 48); 10 at dz=1e-5 gives a "
                         "UNIFORM 1e-5 wall spacing — the reference's own "
                         "cathode resolution")
    args = ap.parse_args()

    import jax.numpy as jnp

    import fedm_tpu  # noqa: F401
    from fedm_tpu.io.checkpoint import load_checkpoint
    from fedm_tpu.model.system import StepParams
    from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
    from fedm_tpu.solvers.newton import NewtonConfig
    from fedm_tpu.timestepping.driver import restart_bdf_history

    state, meta = load_checkpoint(args.ckpt, with_meta=True)
    src_corr = tuple(float(v) for v in meta["z_corridor"])
    corridor = (src_corr[0], src_corr[1], args.dst_dz)
    nc = NewtonConfig(rtol=1e-3, max_iter=20, linear_tol=args.linear_tol,
                      linear_maxiter=400, linear_solver="bicgstab",
                      accept_reduction=3e-2, host_loop=True,
                      hi_residual=True, true_res_rescue=args.rescue)
    cfg = StreamerConfig(dtype=jnp.float32, newton=nc, nx=96,
                         z_corridor=corridor, stab_mode=args.stab,
                         poisson_precond="mg-zline", T_final=1.4e-8,
                         z_tail_cells=(args.tail_lo, 48),
                         r_corridor=(2e-3, 2e-5),
                         density_floor=1e13)
    t0 = time.perf_counter()
    model = StreamerModel(cfg)
    model.system.use_gather_scatter()
    sys_ = model.system
    print(f"setup {time.perf_counter()-t0:.1f}s: {model.space.n_dofs} dofs, "
          f"corridor {corridor}", flush=True)

    cfg_src = dataclasses.replace(model.cfg, z_wall_dz=None,
                                  z_corridor=src_corr,
                                  z_tail_cells=(48, 48))
    zs_src = StreamerModel._z_coords(cfg_src)
    zs_dst = np.unique(model.mesh.coords[:, 1])
    n_r = len(np.unique(model.mesh.coords[:, 0]))
    state = model._remap_z(state, zs_src, zs_dst, n_r,
                           restrict=not args.no_restrict)
    state = restart_bdf_history(state, dt=1e-12)
    print(f"remapped {len(zs_src)}->{len(zs_dst)} z-lines "
          f"(restrict={not args.no_restrict}); t={state.t:.4e}", flush=True)

    u = np.asarray(state.u)
    names = ["u_ion", "u_el", "phi"]
    for j, nm in enumerate(names):
        col = u[:, j]
        print(f"  state {nm}: min={col.min():.4e} max={col.max():.4e} "
              f"nonfinite={np.count_nonzero(~np.isfinite(col))}", flush=True)

    coords = np.asarray(model.space.dof_coords)
    aux = {}
    u_j = jnp.asarray(state.u)

    res_fn = jax.jit(lambda uu, p: sys_.residual(uu, uu, uu, aux, p))
    hi_fn = jax.jit(
        lambda uu, p: sys_._make_hi_residual(uu, uu, aux, p)(
            jnp.zeros_like(uu).astype(sys_.dtype)))

    for dt in [float(s) for s in args.dts.split(",")]:
        p = StepParams(jnp.asarray(state.t + dt), jnp.asarray(dt),
                       jnp.asarray(1e30))
        F = np.asarray(res_fn(u_j, p)).reshape(u.shape)
        Fh = np.asarray(hi_fn(u_j, p)).reshape(u.shape)
        print(f"dt={dt:g}: |F|={np.linalg.norm(F):.4e} "
              f"|F_hi|={np.linalg.norm(Fh):.4e} "
              f"nonfinite={np.count_nonzero(~np.isfinite(F))}"
              f"/hi {np.count_nonzero(~np.isfinite(Fh))}", flush=True)
        for j, nm in enumerate(names):
            k = int(np.nanargmax(np.abs(np.where(np.isfinite(F[:, j]),
                                                 F[:, j], np.inf))))
            print(f"    {nm}: max|F|={np.abs(F[k, j]):.4e} at "
                  f"r={coords[k, 0]:.3e} z={coords[k, 1]:.3e} "
                  f"(u there: {u[k, 0]:.2f},{u[k, 1]:.2f},{u[k, 2]:.1f})",
                  flush=True)

    # -- deep dissection of ONE Newton direction at the first probe dt ----
    dt = float(args.dts.split(",")[0])
    p = StepParams(jnp.asarray(state.t + dt), jnp.asarray(dt),
                   jnp.asarray(1e30))
    n_g = sys_.guarded_block_count(u_j, u_j, aux, p)
    print(f"guarded preconditioner blocks: {int(n_g)} "
          f"of {model.space.n_dofs}", flush=True)

    (_, u_old_c, d_hist, aux_c, params_c,
     bc_shift) = sys_._cast_inputs(u_j, u_j, u_j, aux, p)
    R = sys_.make_delta_residual_fn(u_old_c, d_hist, aux_c, params_c,
                                    bc_shift)
    delta0 = jnp.zeros((model.space.n_dofs, sys_.n_eq), sys_.dtype)

    from fedm_tpu.solvers.linear import bicgstab, _norm

    @jax.jit
    def one_direction(d0):
        f, jvp = jax.linearize(R, d0)
        M = sys_.block_precond_builder(u_old_c, d_hist, aux_c,
                                       params_c)(d0)
        d, linres, it = bicgstab(lambda v: M(jvp(v)), M(-f),
                                 tol=nc.linear_tol,
                                 maxiter=nc.linear_maxiter)
        lin_true = _norm(f + jvp(d)) / _norm(f)
        # the mass-dominated analytic check: one block-Jacobi sweep alone
        d_jac = M(-f)
        jac_true = _norm(f + jvp(d_jac)) / _norm(f)
        fn_full = _norm(R(d0 + d))
        fn_jac = _norm(R(d0 + d_jac))
        return f, d, linres, it, lin_true, d_jac, jac_true, fn_full, fn_jac

    f, d, linres, it, lin_true, d_jac, jac_true, fn_full, fn_jac = \
        one_direction(delta0)
    f0n = float(_norm(f))
    print(f"one direction at dt={dt:g}: |f|={f0n:.4e}", flush=True)
    print(f"  bicgstab: M-linres={float(linres):.3e} iters={int(it)} "
          f"TRUE ||f+Jd||/||f||={float(lin_true):.3e} "
          f"-> nonlinear |R(d)|/|f|={float(fn_full)/f0n:.3e}", flush=True)
    print(f"  pure block-Jacobi sweep: TRUE lin "
          f"{float(jac_true):.3e} -> nonlinear {float(fn_jac)/f0n:.3e} "
          f"|d_jac|={float(_norm(d_jac)):.3e}", flush=True)

    # the worst row's local picture
    F2 = np.asarray(f).reshape(-1, sys_.n_eq)
    k = int(np.argmax(np.abs(F2).max(axis=1)))
    print(f"  worst node {k} at r={coords[k,0]:.3e} z={coords[k,1]:.3e}: "
          f"F={F2[k]}, u={u[k]}", flush=True)
    dN = np.asarray(d).reshape(-1, sys_.n_eq)
    dJ = np.asarray(d_jac).reshape(-1, sys_.n_eq)
    print(f"    delta(newton)={dN[k]} delta(jacobi)={dJ[k]}", flush=True)

    # Jacobian block at that node via jvp on unit vectors
    _, jvp_full = jax.linearize(R, delta0)
    ne = sys_.n_eq
    cols = []
    for j in range(ne):
        e = np.zeros((model.space.n_dofs, ne), np.float64)
        e[k, j] = 1.0
        cols.append(np.asarray(jvp_full(
            jnp.asarray(e, sys_.dtype))).reshape(-1, ne)[k])
    Jb = np.stack(cols, axis=1)
    print(f"    J block at node {k}:\n{Jb}", flush=True)
    with np.errstate(all="ignore"):
        print(f"    block cond ~ {np.linalg.cond(Jb):.3e}; "
              f"block solve of -F: {np.linalg.solve(Jb, -F2[k])}",
              flush=True)

    # manually-driven host-loop Newton trace at the first probe dt
    p = StepParams(jnp.asarray(state.t + dt), jnp.asarray(dt),
                   jnp.asarray(1e30))
    it_jit = jax.jit(sys_._host_iter_impl)
    r0_jit = jax.jit(sys_._host_res0_impl)
    delta = jnp.zeros_like(u_j).astype(sys_.dtype)
    fnorm = r0_jit(delta, u_j, u_j, aux, p)
    f0 = float(fnorm)
    print(f"newton trace at dt={dt:g}: f0={f0:.6e} "
          f"(target rtol*f0={nc.rtol * f0:.3e})", flush=True)
    for k in range(args.iters):
        t1 = time.perf_counter()
        delta, fnorm, linres, improved, step_ok = it_jit(
            delta, fnorm, u_j, u_j, aux, p)
        print(f"  it{k}: fnorm={float(fnorm):.6e} "
              f"({float(fnorm)/f0:.3e} of f0) linres={float(linres):.3e} "
              f"improved={bool(improved)} [{time.perf_counter()-t1:.1f}s]",
              flush=True)
        if not bool(improved) and k >= 1:
            pass  # keep going anyway: the trace is the point


if __name__ == "__main__":
    main()
