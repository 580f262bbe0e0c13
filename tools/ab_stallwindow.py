"""A/B: stall-aware Krylov inner budget on the 13.754 ns stall-loop state.

VERDICT r4 "next" item 3 protocol: the `runs/bagheri14_ref/
checkpoint_004500.npz` resume point (30,305-dof window mesh at
t = 13.754 ns) is the measured worst case for stalled inner solves —
most Newton iterations trigger the true-res rescue and a stalled
BiCGStab/GMRES burned the full `linear_maxiter` budget (~900 s/step,
docs/BAGHERI14_RUN.md). This tool marches N driver advances from that
checkpoint twice — `linear_stall_window=0` (r4 behavior) vs the given
window — on whatever device is live, and reports wall s/step for both.

Usage: python tools/ab_stallwindow.py [--steps 3] [--window 25]
       [--out bench_assets/ab_stallwindow_r05.json]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def march(window, steps, ckpt):
    import jax
    import jax.numpy as jnp

    import fedm_tpu  # noqa: F401
    from fedm_tpu.io.checkpoint import load_checkpoint
    from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
    from fedm_tpu.solvers.newton import NewtonConfig
    from fedm_tpu.timestepping import AdaptiveDriver

    state0, meta = load_checkpoint(ckpt, with_meta=True)
    corridor = tuple(float(v) for v in meta["z_corridor"])
    tails = (tuple(int(v) for v in meta["z_tail_cells"])
             if "z_tail_cells" in meta else (48, 48))
    # the bagheri14 window protocol this checkpoint was written under
    nc = NewtonConfig(rtol=1e-3, max_iter=20, linear_tol=1e-2,
                      linear_maxiter=400, linear_solver="bicgstab",
                      linear_stall_window=window,
                      accept_reduction=3e-2, host_loop=True,
                      hi_residual=True, true_res_rescue=1.0)
    cfg = StreamerConfig(dtype=jnp.float32, newton=nc, nx=96,
                         z_corridor=corridor, stab_mode="off",
                         poisson_precond="mg-zline", T_final=1.4e-8,
                         z_tail_cells=tails, r_corridor=(2e-3, 2e-5),
                         density_floor=1e13)
    m = StreamerModel(cfg)
    m.system.use_gather_scatter()
    m.system.enable_geom_mode()
    st = load_checkpoint(ckpt)
    driver = AdaptiveDriver(m.system, monitor_idx=1, ttol=m.cfg.ttol,
                            dt_min=m.cfg.dt_min, dt_max=m.cfg.dt_max,
                            post_accept=m.floor_projection(),
                            fail_dt_cap=0.7, predictor=1.0)
    st = driver.advance(st, {})  # compile + first advance (excluded)
    jax.block_until_ready(st.u)
    walls = []
    for _ in range(steps):
        t0 = time.perf_counter()
        st = driver.advance(st, {})
        jax.block_until_ready(st.u)
        walls.append(time.perf_counter() - t0)
        print(f"  window={window}: t={st.t:.6e} dt={st.dt:.3e} "
              f"acc={st.n_accepted} rej={st.n_rejected} "
              f"[{walls[-1]:.1f}s]", flush=True)
    return dict(window=window, walls_s=walls,
                mean_s_per_step=sum(walls) / len(walls),
                accepted=int(st.n_accepted - state0.n_accepted),
                rejected=int(st.n_rejected - state0.n_rejected))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=Path,
                    default=Path("runs/bagheri14_ref/checkpoint_004500.npz"))
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--window", type=int, default=25)
    ap.add_argument("--out", type=Path,
                    default=Path("bench_assets/ab_stallwindow_r05.json"))
    args = ap.parse_args()
    res_off = march(0, args.steps, args.ckpt)
    res_on = march(args.window, args.steps, args.ckpt)
    speedup = res_off["mean_s_per_step"] / res_on["mean_s_per_step"]
    result = dict(checkpoint=str(args.ckpt), off=res_off, on=res_on,
                  speedup=speedup)
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(result, indent=1))
    print(f"stall-window speedup on the 13.754 ns stall-loop state: "
          f"{speedup:.2f}x ({res_off['mean_s_per_step']:.1f} -> "
          f"{res_on['mean_s_per_step']:.1f} s/step) -> {args.out}")


if __name__ == "__main__":
    main()
