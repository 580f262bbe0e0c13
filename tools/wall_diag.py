"""Autopsy of the t=13.979 ns total-Newton-refusal wall (runs/bagheri14_final).

Unlike tools/tail_diag.py (which dissected the cross-resolution REMAP
refusal), this probe loads the crash-state checkpoint onto its OWN
geometry (corridor + tail topology from checkpoint meta — no remap, no
BDF restart) and asks where the refusal lives:

  1. full-domain axial profiles: z, Ez, n_e, n_ion — is the action still
     inside the fine corridor (z in [z_lo, z_hi]) or has the post-arrival
     field redistribution moved it into the 48-cell geometric coarse tail
     that covers the upper ~87% of the gap?
  2. residual F at several dt with per-equation max|F| locations tagged
     corridor/tail,
  3. a manually-driven Newton trace at the probe dts (is the refusal
     dt-independent = off-manifold, or dt-dependent = stiffness?).

Reference counterpart: the reference's static mesh is uniform dz=1e-5
over the FULL 1.25 cm gap (`/root/reference/examples/streamer_discharge/
fedm-streamer.py`), so it never has a coarse-tail region to fail in.

Usage: python tools/wall_diag.py [--ckpt runs/bagheri14_final/checkpoint.npz]
           [--dts 1e-12,1e-13,1e-15] [--iters 8] [--tpu]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=Path,
                    default=Path("runs/bagheri14_final/checkpoint.npz"))
    ap.add_argument("--dts", default="1e-12,1e-13,1e-15")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--linear-tol", type=float, default=1e-2)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--profile-only", action="store_true",
                    help="just the axial profile (no residual/Newton)")
    args = ap.parse_args()

    import jax.numpy as jnp

    import fedm_tpu  # noqa: F401
    from fedm_tpu.io.checkpoint import load_checkpoint
    from fedm_tpu.model.system import StepParams
    from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
    from fedm_tpu.solvers.newton import NewtonConfig

    state, meta = load_checkpoint(args.ckpt, with_meta=True)
    corridor = tuple(float(v) for v in meta["z_corridor"])
    tails = (tuple(int(v) for v in meta["z_tail_cells"])
             if "z_tail_cells" in meta else (48, 48))
    wall_dz = float(meta["z_wall_dz"]) if "z_wall_dz" in meta else None
    print(f"checkpoint: t={state.t:.6e} dt={state.dt:.3e} "
          f"steps={state.n_accepted} rej={state.n_rejected} "
          f"corridor={corridor} tails={tails} wall_dz={wall_dz}", flush=True)

    nc = NewtonConfig(rtol=1e-3, max_iter=20, linear_tol=args.linear_tol,
                      linear_maxiter=400, linear_solver="bicgstab",
                      accept_reduction=0.0, host_loop=True,
                      hi_residual=True, true_res_rescue=1.0)
    cfg = StreamerConfig(dtype=jnp.float32, newton=nc, nx=96,
                         z_corridor=corridor, stab_mode="off",
                         poisson_precond="mg-zline", T_final=1.4e-8,
                         z_tail_cells=tails, z_wall_dz=wall_dz,
                         r_corridor=(2e-3, 2e-5), density_floor=1e13)
    t0 = time.perf_counter()
    model = StreamerModel(cfg)
    model.system.use_gather_scatter()
    sys_ = model.system
    print(f"setup {time.perf_counter()-t0:.1f}s: {model.space.n_dofs} dofs",
          flush=True)
    assert model.space.n_dofs * sys_.n_eq == state.u.size, (
        f"geometry mismatch: {model.space.n_dofs} dofs vs state "
        f"{state.u.shape}")

    coords = np.asarray(model.space.dof_coords)
    u = np.asarray(state.u)
    names = ["u_ion", "u_el", "phi"]
    for j, nm in enumerate(names):
        col = u[:, j]
        print(f"  state {nm}: min={col.min():.4e} max={col.max():.4e} "
              f"nonfinite={np.count_nonzero(~np.isfinite(col))}", flush=True)

    # ---- 1. full-domain axial profiles ---------------------------------
    axis = np.isclose(coords[:, 0], 0.0)
    z_axis = coords[axis, 1]
    order = np.argsort(z_axis)
    z_s = z_axis[order]
    phi = u[axis, 2][order]
    ne = np.exp(u[axis, 1][order])
    ni = np.exp(u[axis, 0][order])
    Ez = -np.gradient(phi, z_s)
    z_lo, z_hi = corridor[0], corridor[1]
    k = int(np.argmax(np.abs(Ez)))
    where = ("corridor" if z_lo <= z_s[k] <= z_hi
             else ("wall-tail" if z_s[k] < z_lo else "COARSE-TAIL"))
    print(f"axial Emax={np.abs(Ez)[k]:.4e} at z={z_s[k]:.4e} [{where}]",
          flush=True)
    print("axial profile (z, dz_local, Ez, ne, ni):", flush=True)
    dz_loc = np.gradient(z_s)
    # print every axis node in the coarse tail plus every 10th in corridor
    for i in range(len(z_s)):
        in_tail = z_s[i] > z_hi + 1e-12
        if in_tail or i % 15 == 0 or abs(np.abs(Ez[i]) - np.abs(Ez)[k]) < 1e-6:
            tag = "T" if in_tail else ("W" if z_s[i] < z_lo - 1e-12 else "c")
            print(f"  {tag} z={z_s[i]:.4e} dz={dz_loc[i]:.2e} "
                  f"Ez={Ez[i]:+.3e} ne={ne[i]:.3e} ni={ni[i]:.3e}",
                  flush=True)

    if args.profile_only:
        return

    # ---- 2. residual at several dt -------------------------------------
    aux = {}
    u_j = jnp.asarray(state.u)
    res_fn = jax.jit(lambda uu, p: sys_.residual(uu, uu, uu, aux, p))

    def tag_of(z):
        if z < z_lo - 1e-12:
            return "wall-tail"
        if z > z_hi + 1e-12:
            return "COARSE-TAIL"
        return "corridor"

    for dt in [float(s) for s in args.dts.split(",")]:
        p = StepParams(jnp.asarray(state.t + dt), jnp.asarray(dt),
                       jnp.asarray(1e30))
        F = np.asarray(res_fn(u_j, p)).reshape(u.shape)
        print(f"dt={dt:g}: |F|={np.linalg.norm(F):.4e} "
              f"nonfinite={np.count_nonzero(~np.isfinite(F))}", flush=True)
        for j, nm in enumerate(names):
            col = np.where(np.isfinite(F[:, j]), np.abs(F[:, j]), np.inf)
            k = int(np.nanargmax(col))
            print(f"    {nm}: max|F|={np.abs(F[k, j]):.4e} at "
                  f"r={coords[k, 0]:.3e} z={coords[k, 1]:.3e} "
                  f"[{tag_of(coords[k, 1])}] "
                  f"(u there: {u[k, 0]:.2f},{u[k, 1]:.2f},{u[k, 2]:.1f})",
                  flush=True)

    # ---- 3. Newton trace at each probe dt (true BDF history) -----------
    it_jit = jax.jit(sys_._host_iter_impl)
    r0_jit = jax.jit(sys_._host_res0_impl)
    u_old = jnp.asarray(state.u_old)
    u_old1 = jnp.asarray(state.u_old1)
    for dt in [float(s) for s in args.dts.split(",")]:
        # mirror the driver's attempt: BDF2 with the checkpoint's history
        p = StepParams(jnp.asarray(state.t + dt), jnp.asarray(dt),
                       jnp.asarray(state.dt_old))
        delta = jnp.zeros_like(u_j).astype(sys_.dtype)
        fnorm = r0_jit(delta, u_j, u_old, aux, p)
        f0 = float(fnorm)
        print(f"newton trace dt={dt:g} (dt_old={state.dt_old:.3e}): "
              f"f0={f0:.6e} target={nc.rtol * f0:.3e}", flush=True)
        for k in range(args.iters):
            t1 = time.perf_counter()
            delta, fnorm, linres, improved, step_ok = it_jit(
                delta, fnorm, u_j, u_old, aux, p)
            print(f"  it{k}: fnorm={float(fnorm):.6e} "
                  f"({float(fnorm)/f0:.3e} of f0) "
                  f"linres={float(linres):.3e} improved={bool(improved)} "
                  f"[{time.perf_counter()-t1:.1f}s]", flush=True)
        # where is the end-of-trace residual concentrated?
        dn = np.asarray(delta).reshape(u.shape)
        k2 = int(np.argmax(np.abs(dn).max(axis=1)))
        print(f"  largest delta at r={coords[k2,0]:.3e} z={coords[k2,1]:.3e}"
              f" [{tag_of(coords[k2,1])}] delta={dn[k2]}", flush=True)


if __name__ == "__main__":
    main()
