"""Low-pressure argon glow discharge, end to end, on the reference's
REAL `4_particles` chemistry (Becker et al., the tree the reference's
glow test ships — `/root/reference/tests/integrated_tests/glow_discharge/
file_input/4_particles/`).

The reference's flagship LMEA case (`examples/glow_discharge/fedm-gd.py`:
1 Torr argon, U = -250 V ramped, T_final = 5e-5 s) run with checkpoints
so the march to (quasi-)steady state is resumable and its dt trajectory /
discharge diagnostics are recorded.

Usage (TPU or CPU):
  python tools/glow_run.py --out /tmp/glow [--nx 64] [--T 5e-5]
      [--resume] [--f32] [--checkpoint-every 100]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_INPUT = Path("/root/reference/tests/integrated_tests/glow_discharge/"
                 "file_input")


# Named production protocols (VERDICT r3 "next" item 6): --preset glow50
# reproduces the committed runs/glow50 flagship configuration (hi-residual
# f32, no escalation fallback — the protocol that reached the reference's
# full t = 5e-5 s horizon). A preset only sets DEFAULTS.
PRESETS = {
    "glow50": dict(f32=True, hi_res=True, no_fallback=True,
                   linear_tol=1e-2, checkpoint_every=100,
                   report_every=50),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(PRESETS), default=None,
                    help="named production protocol (flag defaults; "
                         "explicit flags still override); recorded in "
                         "checkpoint meta")
    ap.add_argument("--out", type=Path, default=Path("/tmp/glow"))
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--ny", type=int, default=64)
    ap.add_argument("--T", type=float, default=5e-5)
    ap.add_argument("--ttol", type=float, default=5e-4)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--f32", action="store_true",
                    help="f32 compute with f64 escalation fallback")
    ap.add_argument("--hi-res", action="store_true",
                    help="with --f32: mixed-precision hi-residual Newton "
                         "(f64-emulated defect + f32 Krylov, "
                         "NewtonConfig.hi_residual — the streamer "
                         "production fix for the f32 noise-floor stall; "
                         "allows rtol=1e-3 at ~3 iters/step)")
    ap.add_argument("--verbose", action="store_true",
                    help="per-attempt Newton diagnostics from the driver")
    ap.add_argument("--no-fallback", action="store_true",
                    help="with --f32: drop the emulated-f64 escalation "
                         "system — Newton failures shrink dt instead. The "
                         "whole-step emulated-f64 fallback program is the "
                         "longest single XLA execution in the repo and the "
                         "tunneled TPU kills long executions (measured on "
                         "the 5e-5 march: reproducible 'TPU worker "
                         "crashed' within minutes of escalations starting "
                         "at ne~2e14; crash-free before them)")
    # 100 (was 200): a tunnel-hang kill costs at most ~100 steps
    # of recompute (round-2 post-mortem lost 379 steps to cadence)
    ap.add_argument("--checkpoint-every", type=int, default=100)
    ap.add_argument("--report-every", type=int, default=50)
    ap.add_argument("--linear-tol", type=float, default=1e-4,
                    help="inner Krylov relative tolerance (inexact-Newton "
                         "forcing term; the streamer's round-3 A/B showed "
                         "1e-4 is ~10x tighter than the Newton rtol needs "
                         "— the ttol error control guards the physics)")
    ap.add_argument("--fail-dt-cap", type=float, default=0.0,
                    help="solver-aware dt limiting after Newton failures "
                         "(AdaptiveDriver.fail_dt_cap; 0 = off, 0.7 good)")
    ap.add_argument("--predictor", type=float, default=0.0,
                    help="Newton initial-guess extrapolation factor "
                         "(AdaptiveDriver.predictor; host-loop only)")
    ap.add_argument("--max-steps", type=int, default=200000)
    ap.add_argument("--file-input", type=Path, default=REF_INPUT)
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--preset", choices=sorted(PRESETS), default=None)
    known, _ = pre.parse_known_args()
    if known.preset is not None:
        ap.set_defaults(**PRESETS[known.preset])
    args = ap.parse_args()
    args.out.mkdir(parents=True, exist_ok=True)
    import json as _json

    protocol = {k: (str(v) if isinstance(v, Path) else v)
                for k, v in sorted(vars(args).items())}
    print(f"protocol: {_json.dumps(protocol)}", flush=True)

    import jax
    import jax.numpy as jnp

    import fedm_tpu  # noqa: F401  (enables x64)
    from fedm_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    from fedm_tpu.models.glow import GlowDischargeModel, GlowConfig
    from fedm_tpu.timestepping import AdaptiveDriver

    common = dict(model="4_particles", file_input=args.file_input,
                  nx=args.nx, ny=args.ny, ttol=args.ttol, T_final=args.T)
    if args.f32:
        # f32 Newton rtol: the default 1e-3 sits below the f32 assembly
        # noise floor once dt grows past ~5e-11 on this chemistry —
        # measured 38 escalations/100 steps (10s/step in emulated f64).
        # 5e-3 converges within the floor; the adaptive ttol error
        # control still guards the physical accuracy of every step.
        from fedm_tpu.solvers.newton import NewtonConfig

        if args.hi_res:
            # Streamer-production Newton: the f64-emulated residual defect
            # removes the f32 assembly noise floor entirely, so the
            # standard rtol=1e-3 converges in ~3 iterations where the
            # plain-f32 path stalls against the floor and burns
            # max_iter x linear_maxiter (measured on this march: step
            # cost 0.5 s -> ~30 s once the chemistry stiffened at
            # ne ~ 3e11 m^-3). host_loop: one jitted call per Newton
            # iteration — the tunneled TPU kills long XLA executions.
            nc = NewtonConfig(rtol=1e-3, max_iter=20,
                              linear_tol=args.linear_tol,
                              linear_maxiter=600, hi_residual=True,
                              host_loop=True)
        else:
            nc = NewtonConfig(rtol=5e-3, max_iter=20,
                              linear_tol=args.linear_tol, linear_maxiter=600)
        model = GlowDischargeModel(GlowConfig(dtype=jnp.float32, newton=nc,
                                              **common))
        if args.no_fallback:
            fallback_system = None
        else:
            fallback = GlowDischargeModel(GlowConfig(**common))
            fallback.system.use_gather_scatter()
            fallback_system = fallback.system
    else:
        from dataclasses import replace as _rep

        from fedm_tpu.solvers.newton import NewtonConfig

        model = GlowDischargeModel(GlowConfig(**common))
        model.system.newton = _rep(model.system.newton,
                                   linear_tol=args.linear_tol)
        fallback_system = None
    model.system.use_gather_scatter()

    n_dofs = model.space.n_dofs
    print(f"devices: {jax.devices()}", flush=True)
    print(f"mesh: {args.nx}x{args.ny}, {n_dofs} dofs "
          f"({model.n_eq * n_dofs} unknowns), chemistry=4_particles "
          f"({args.file_input}), dtype={'f32+escalation' if args.f32 else 'f64'}",
          flush=True)

    driver = AdaptiveDriver(
        model.system, monitor_idx=0, ttol=args.ttol,
        dt_min=model.cfg.dt_min, dt_max=model.cfg.dt_max,
        error_log=args.out / "relative_error.log",
        fallback_system=fallback_system,
        crash_checkpoint=args.out / "crash.npz", verbose=args.verbose,
        fail_dt_cap=args.fail_dt_cap, predictor=args.predictor,
        newton_log=args.out / "newton.log")

    _ckpt_meta = {"protocol": _json.dumps(protocol)}
    ckpt = args.out / "checkpoint.npz"
    if args.resume and ckpt.exists():
        state = load_checkpoint(ckpt)
        print(f"resumed from {ckpt}: t={state.t:.4e}, "
              f"{state.n_accepted} steps", flush=True)
    else:
        state = model.initial_state()

    def report(state, wall, n_since):
        u = np.asarray(state.u)
        ne = np.exp(u[:, 3])
        eps = np.exp(u[:, 0] - u[:, 3])      # mean electron energy [eV]
        print(f"t={state.t:.4e} dt={state.dt:.3e} steps={state.n_accepted} "
              f"rej={state.n_rejected} esc={driver.n_escalated} "
              f"stall={driver.n_stall_accepted} "
              f"ne_max={ne.max():.3e} eps=[{eps.min():.2f},{eps.max():.2f}] "
              f"phi=[{u[:, 4].min():.1f},{u[:, 4].max():.1f}] "
              f"[{n_since / max(wall, 1e-9):.2f} steps/s]", flush=True)

    T = args.T
    t_wall = time.perf_counter()
    n_last = state.n_accepted
    last_saved = state.n_accepted
    while state.t < T and state.n_accepted < args.max_steps:
        state.dt = min(state.dt, max(T - state.t, model.cfg.dt_min))
        aux = model._update_aux_jit(state.u)
        state = driver.advance(state, aux)
        # trigger on n_accepted TRANSITIONS: rejected attempts leave
        # n_accepted unchanged and must not re-fire the report (resetting
        # the steps/s window) or re-save the same checkpoint
        if (state.n_accepted % args.report_every == 0
                and state.n_accepted != n_last):
            now = time.perf_counter()
            report(state, now - t_wall, state.n_accepted - n_last)
            t_wall, n_last = now, state.n_accepted
        if (state.n_accepted % args.checkpoint_every == 0
                and state.n_accepted != last_saved):
            save_checkpoint(ckpt, state, meta=_ckpt_meta)
            last_saved = state.n_accepted
            # periodic restart-point trail (forensics + re-bench assets)
            if state.n_accepted % (20 * args.checkpoint_every) == 0:
                save_checkpoint(
                    args.out / f"checkpoint_{state.n_accepted:06d}.npz",
                    state, meta=_ckpt_meta)

    save_checkpoint(ckpt, state, meta=_ckpt_meta)
    report(state, time.perf_counter() - t_wall, state.n_accepted - n_last)
    done = state.t >= T * (1 - 1e-12)
    print(f"{'REACHED T_final' if done else 'STOPPED'} at t={state.t:.6e} "
          f"({state.n_accepted} accepted, {state.n_rejected} rejected, "
          f"{driver.n_escalated} escalated, "
          f"{driver.n_stall_accepted} stall-accepted this segment)",
          flush=True)


if __name__ == "__main__":
    main()
