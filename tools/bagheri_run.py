"""The Bagheri et al. (PSST 27, 2018) streamer benchmark, end to end.

Runs the reference's flagship case (`examples/streamer_discharge/
fedm-streamer.py`: U = 18.75 kV, 760 Torr air, 1.25 cm gap, T = 14 ns)
with the round-2 machinery that round 1 lacked:

  - Peclet-limited upwind stabilisation (monotone fronts on um-to-tens-of-
    um meshes; plain Galerkin died at 1.47-1.6 ns from front oscillation),
  - z-line relaxation in the Poisson V-cycle (anisotropic corridor mesh),
  - f32 compute with rejection-rate-triggered f64 escalation,
  - periodic checkpoints (resumable; also the stiff-regime restart points
    bench.py uses).

Usage (TPU or CPU):
  python tools/bagheri_run.py --out /tmp/bagheri [--dz 2e-5] [--nx 96]
      [--resume] [--T 1.4e-8] [--checkpoint-every 100]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# Named production protocols (VERDICT r3 "next" item 6): one flag
# reproduces a flagship run instead of 16 flags recovered from shell
# history. A preset only sets DEFAULTS — explicit flags still override.
PRESETS = {
    # the 14 ns Bagheri flagship protocol (runs/bagheri14_final):
    # uniform-1e-5 wall (the reference's own cathode resolution,
    # docs/BAGHERI14_RUN.md), hi-residual f32 Newton, full rescue stack
    "bagheri14": dict(
        window_dz=1e-5, window_span=1.5e-3, tail_cells="10,48",
        dr=2e-5, r1=2e-3, hi_res=True, no_fallback=True, stab="off",
        linear_tol=1e-2, checkpoint_every=25, report_every=10,
        predictor=1.0, fail_dt_cap=0.7, true_res_rescue=1.0,
        direct_rescue=True),
    # the validated FINISH protocol (VERDICT r4 "next" item 8): the static
    # full-gap uniform-1e-5 mesh (547k unknowns) that round 4 proved out
    # post-arrival (runs/bagheri14_T, docs/BAGHERI14_RUN.md). Differences
    # from `bagheri14`: full-gap static corridor (no window moves, geometry
    # baked into the program — the 547k geom-mode program crashed the
    # tunneled worker), uniform 10-cell tails at BOTH electrodes, direct
    # rescue off (a SuperLU factorization costs minutes at this size),
    # bounded Krylov budget, and the r5 stall-aware inner early-exit.
    "bagheri14-fullgap": dict(
        window_dz=1e-5, window_span=1.5e-3, tail_cells="10,10",
        full_gap=True, dr=2e-5, r1=2e-3, hi_res=True, no_fallback=True,
        stab="off", linear_tol=1e-2, linear_maxiter=150,
        linear_stall_window=25, checkpoint_every=25, report_every=10,
        predictor=1.0, fail_dt_cap=0.7, true_res_rescue=1.0,
        direct_rescue=False),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(PRESETS), default=None,
                    help="named production protocol: sets the flag "
                         "DEFAULTS of a flagship run (explicit flags "
                         "still override). The active protocol is "
                         "recorded in checkpoint meta and the run header")
    ap.add_argument("--out", type=Path, default=Path("/tmp/bagheri"))
    ap.add_argument("--dz", type=float, default=2e-5)
    ap.add_argument("--nx", type=int, default=96)
    ap.add_argument("--dr", type=float, default=None,
                    help="r-corridor: uniform dr on [0, --r1] (fixes the "
                         "annular-front artifact of radially-starved "
                         "meshes; docs/STREAMER_STUDY.md round 6)")
    ap.add_argument("--r1", type=float, default=2e-3,
                    help="r-corridor fine-region extent [m]")
    ap.add_argument("--T", type=float, default=1.4e-8)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--resume-dt", type=float, default=None,
                    help="override the checkpoint's dt on a "
                         "cross-resolution remap resume (the backward-"
                         "Euler restart step; default: keep checkpoint dt)")
    ap.add_argument("--restart-bdf", action="store_true",
                    help="force a BDF-history restart (backward-Euler "
                         "first step at --resume-dt) on a PLAIN same-mesh "
                         "resume. State-level lever for stiff bands the "
                         "incoming BDF2 history cannot cross: the 13.67 ns "
                         "band was entered at a fail-cap-ratcheted "
                         "dt=3.8e-14 whose history no Newton direction "
                         "descends from (docs/BAGHERI14_RUN.md); a "
                         "BDF1-restarted larger-dt approach is a "
                         "different trajectory through the same physics")
    ap.add_argument("--checkpoint-every", type=int, default=100)
    ap.add_argument("--report-every", type=int, default=25)
    ap.add_argument("--f64", action="store_true", help="full f64 (no escalation)")
    ap.add_argument("--stab", default="peclet", choices=["off", "peclet", "linear"])
    ap.add_argument("--precond", default="mg-zline",
                    choices=["mg", "mg-zline", "zline"])
    ap.add_argument("--max-steps", type=int, default=100000)
    # round-4 verdict (docs/STREAMER_STUDY.md): the density floor stays ON
    # by default; row equilibration was RETIRED as a production option
    # (config B could not converge — the block-Jacobi Krylov iteration is
    # invariant to row scaling, and the equilibrated norm lowers the
    # achievable f32 reduction). Opt back in with --row-scaled for A/Bs.
    ap.add_argument("--row-scaled", action="store_true",
                    help="enable true-l1 row equilibration (retired from "
                         "production, see docs/STREAMER_STUDY.md round 4)")
    ap.add_argument("--no-floor", action="store_true",
                    help="disable the far-field background density floor")
    ap.add_argument("--rtol", type=float, default=None,
                    help="override Newton rtol")
    ap.add_argument("--linear-maxiter", type=int, default=400,
                    help="inner Krylov iteration cap. Each host-loop "
                         "Newton iteration is ONE XLA execution whose "
                         "worst case is ~3x this many matvecs (bicgstab "
                         "+ gmres fallback + rescue); the tunneled TPU "
                         "kills executions longer than O(minutes), so "
                         "large meshes need a smaller cap")
    ap.add_argument("--linear-tol", type=float, default=1e-4,
                    help="inner Krylov relative tolerance (inexact-Newton "
                         "forcing term; the ttol error control guards the "
                         "physics either way)")
    ap.add_argument("--linear-stall-window", type=int, default=0,
                    help="NewtonConfig.linear_stall_window: early-exit an "
                         "inner Krylov solve after this many consecutive "
                         "iterations without a >1%% residual improvement "
                         "instead of burning the full --linear-maxiter "
                         "(~23 s vs 2.2 s per stalled solve at 547k "
                         "unknowns, tools/fullgap_micro.py). 0 disables")
    ap.add_argument("--hi-res", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="mixed-precision Newton: f64-emulated residual "
                         "defect + f32 Krylov correction "
                         "(NewtonConfig.hi_residual) — removes the f32 "
                         "assembly noise floor at ~one extra residual "
                         "eval per Newton iteration")
    ap.add_argument("--true-res-rescue", type=float, default=0.0,
                    help="NewtonConfig.true_res_rescue: when the BiCGStab "
                         "direction's TRUE-norm linear reduction exceeds "
                         "this, rerun right-preconditioned GMRES and keep "
                         "the better direction (guards against the left-"
                         "preconditioned M-norm under-reporting a useless "
                         "direction — the coarse-corridor resume failure "
                         "mode, docs/BAGHERI14_RUN.md). 0 disables; 1.0 "
                         "= rescue only provably-useless directions")
    ap.add_argument("--floor-atol", type=float, default=0.0,
                    help="AdaptiveDriver.floor_atol: dynamic absolute "
                         "Newton target C * (last accepted step's final "
                         "||F||). Post-band-crossing regime: the accepted "
                         "state is converged to its f32 floor, the next "
                         "attempt starts AT that floor, and every "
                         "reduction-based criterion spuriously fails. "
                         "0 disables; 1.5 is a good value (ttol still "
                         "judges every accepted step)")
    ap.add_argument("--log-clip", type=float, default=0.0,
                    help="NewtonConfig.delta_clip on the species (log-"
                         "density) columns: per-component trust clamp of "
                         "the Newton update to this many log-units per "
                         "iteration (potential column unclamped). Targets "
                         "the 13.67 ns no-descent band, where near-empty "
                         "sheath rows blow every direction past exp() "
                         "range and the global line search refuses all "
                         "damping (docs/BAGHERI14_RUN.md). 0 disables; "
                         "15 (=6.5 decades/iteration) is a safe value")
    ap.add_argument("--accept-reduction", type=float, default=3e-2,
                    help="NewtonConfig.accept_reduction: stall-acceptance "
                         "threshold (accept a kept-best iterate at the "
                         "probe-accuracy floor when Newton stalls having "
                         "reduced ||F|| by this factor). 0 disables — the "
                         "state-poisoning probe mode named in "
                         "docs/BAGHERI14_RUN.md")
    ap.add_argument("--verbose", action="store_true",
                    help="per-attempt Newton diagnostics")
    ap.add_argument("--diag-guards", action="store_true",
                    help="report the guarded-preconditioner-block count "
                         "each report interval (precond._guard fallback "
                         "visibility; one extra compile at first report)")
    ap.add_argument("--direct-rescue", action="store_true",
                    help="host sparse-direct Newton escalation "
                         "(solvers.direct.DirectNewton — the reference's "
                         "MUMPS role): steps the TPU Krylov Newton "
                         "refuses retry at the SAME dt with an exact "
                         "SuperLU solve of the colored-JVP-probed "
                         "Jacobian. Tunnel-safe (each device execution "
                         "is one residual/jvp); composes with "
                         "--no-fallback (it replaces the emulated-f64 "
                         "escalation, not the f32 hot path)")
    ap.add_argument("--no-fallback", action="store_true",
                    help="f32 only: skip the emulated-f64 escalation system "
                         "(measured to crash the tunneled TPU worker on the "
                         "55k-dof program)")
    ap.add_argument("--fallback", dest="no_fallback", action="store_false",
                    help="re-enable the f64 escalation over a preset's "
                         "no_fallback=True")
    ap.add_argument("--linear-solver", default=None,
                    choices=[None, "bicgstab", "gmres"],
                    help="override the Newton inner solver")
    # MOVING-WINDOW refinement (docs/STREAMER_STUDY.md round 6): keep a
    # fine-dz z-corridor centered on the ionisation front and re-mesh +
    # remap the state (StreamerModel.remap_state) whenever the front
    # nears the window's leading edge. Resolves 1/alpha at the late-stage
    # head (~2.5 um at 2.4e7 V/m) at a CONSTANT dof count instead of a
    # 10x-finer global corridor. Requires --no-fallback (f32 production).
    ap.add_argument("--window-dz", type=float, default=None,
                    help="moving-window mode: fine dz inside the window")
    ap.add_argument("--window-span", type=float, default=1.5e-3,
                    help="window length [m] (60%% ahead of the front, "
                         "40%% behind)")
    ap.add_argument("--tail-cells", default="48,48",
                    help="window-mode z-tail cell counts 'lo,hi' "
                         "(StreamerConfig.z_tail_cells). NOTE the lower "
                         "tail is a fixed-COUNT geometric fan whose ratio "
                         "re-solves from the corridor dz: at 48 cells a "
                         "corridor COARSENING to dz=1e-5 shrinks the wall "
                         "cell to 0.108 um — finer than the 0.25 um "
                         "wall-resolution study that died at dt_min "
                         "(docs/BAGHERI14_RUN.md). '10,48' at dz=1e-5 "
                         "gives a UNIFORM 1e-5 wall spacing, the "
                         "reference's own cathode resolution")
    ap.add_argument("--wall-dz", type=float, default=None,
                    help="wall-clustered lower tail (StreamerConfig."
                         "z_wall_dz): first cell size at the cathode for "
                         "the post-arrival sheath regime; same topology, "
                         "zero-recompile window moves preserved")
    ap.add_argument("--tzline", action="store_true",
                    help="transport z-line preconditioning of the electron "
                         "row (CoupledSystem.enable_transport_zline): exact "
                         "tridiagonal solve on the z-direction advection-"
                         "diffusion couplings, complementing mg-zline on "
                         "the Poisson row — targets the Krylov-iteration "
                         "cost of fine-dz window meshes")
    ap.add_argument("--predictor", type=float, default=0.0,
                    help="Newton initial-guess extrapolation factor "
                         "(AdaptiveDriver.predictor; host-loop only). "
                         "0 = off (reference starts from u_old); 1.0 = "
                         "full BDF linear extrapolation")
    ap.add_argument("--fail-dt-cap", type=float, default=0.0,
                    help="solver-aware dt limiting (AdaptiveDriver."
                         "fail_dt_cap): after a Newton failure at dt_f, "
                         "cap controller proposals at fail_dt_cap*dt_f, "
                         "relaxing 1.05x per acceptance. Breaks the "
                         "post-arrival sheath's fail-twice-every-other-"
                         "step limit cycle (runs/bagheri14). 0 = off "
                         "(reference semantics); 0.7 is a good value")
    ap.add_argument("--no-direct-rescue", action="store_true",
                    help="override a preset's --direct-rescue: at the "
                         "full-gap finish size (547k unknowns) a single "
                         "SuperLU factorization costs minutes of host "
                         "time per escalated attempt — Krylov + "
                         "fail-dt-cap is the right failure handling "
                         "there")
    ap.add_argument("--full-gap", action="store_true",
                    help="static full-gap corridor at --window-dz over "
                         "the WHOLE 1.25 cm gap (the reference's own "
                         "static-mesh configuration, fedm-streamer.py "
                         "dz=1e-5) — no window moves. This is the "
                         "post-arrival finishing mesh: the t=13.979 ns "
                         "total-Newton-refusal wall (tools/wall_diag.py "
                         "autopsy) was a SECONDARY mid-gap ionisation "
                         "wave at z~3.4 mm sitting in the moving "
                         "window's coarse geometric tail (local dz "
                         "1.9e-4), which the single-front window parked "
                         "at the cathode can never resolve. Pass "
                         "--tail-cells 10,10 for uniform 1e-5 wall and "
                         "anode spacing")
    ap.add_argument("--devices", type=int, default=1,
                    help="GSPMD z-slab sharding over the first N devices: "
                         "the PRODUCTION structured stack (slice/pad "
                         "assembly, mg-zline V-cycle, host-loop Newton) "
                         "runs multi-chip — the reference's `mpirun -np N` "
                         "launch mode (/root/reference/README.md:66). Odd "
                         "dof counts shard via internal pad/slice anchors.")
    pre, _ = argparse.ArgumentParser(add_help=False), None
    pre.add_argument("--preset", choices=sorted(PRESETS), default=None)
    known, _ = pre.parse_known_args()
    # set_defaults silently accepts keys matching no argument dest, so a
    # preset typo would be dropped without error (round-4 advisor)
    dests = {a.dest for a in ap._actions}
    for pname, pdict in PRESETS.items():
        unknown = set(pdict) - dests
        if unknown:
            ap.error(f"preset {pname!r} sets unknown keys: {sorted(unknown)}")
    if known.preset is not None:
        ap.set_defaults(**PRESETS[known.preset])
    args = ap.parse_args()
    if args.no_direct_rescue:
        args.direct_rescue = False
    if not 0.0 <= args.accept_reduction < 1.0:
        # negative would silently behave like 0 (disabled) and >= 1 would
        # accept iterates that made no progress (round-3 advisor)
        ap.error(f"--accept-reduction must be in [0, 1): "
                 f"{args.accept_reduction}")
    args.out.mkdir(parents=True, exist_ok=True)
    # protocol provenance: every run (and, below, every checkpoint) names
    # the solver protocol that produced it
    import json as _json

    protocol = {k: (str(v) if isinstance(v, Path) else v)
                for k, v in sorted(vars(args).items())}
    print(f"protocol: {_json.dumps(protocol)}", flush=True)
    # species columns clamped, potential column free (streamer n_eq=3)
    delta_clip = ((args.log_clip, args.log_clip, float("inf"))
                  if args.log_clip > 0 else ())

    import jax
    import jax.numpy as jnp

    import fedm_tpu  # noqa: F401  (enables x64)
    from fedm_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
    from fedm_tpu.timestepping import AdaptiveDriver

    from fedm_tpu.solvers.newton import NewtonConfig

    window = args.window_dz is not None
    ckpt = args.out / "checkpoint.npz"
    if window:
        # MOVING-window mode is the f32 production path (the emulated-f64
        # geom-mode program crashed the tunneled worker). The STATIC
        # full-gap mesh is different (round 5): geometry is baked into
        # the program and every execution is Krylov-bounded, which is
        # what fixed the 547k worker crashes for f32 — so --f64 is
        # allowed there as the full-gap-scale precision escalation
        # (r4 verdict "next" item 5; the reference's always-available
        # MUMPS-f64 role, fedm/functions.py:1154-1161). Pair it with
        # --linear-maxiter <=150 / --linear-stall-window to keep single
        # executions under the tunnel's deadline.
        assert args.no_fallback, (
            "--window-dz is the f32 production path: pass --no-fallback")
        assert not (args.f64 and not args.full_gap), (
            "--f64 with a MOVING window crashes the tunneled worker; "
            "the escalation is supported on the static --full-gap mesh")
        span = args.window_span
        # fixed-topology window (StreamerConfig.z_tail_cells): every
        # position has the same node count, so a window move is a pure
        # geometry-array swap under the already-compiled step
        # (CoupledSystem.enable_geom_mode — zero recompiles)
        Z_LO_MIN = 1e-4   # clamp: tails must keep positive extent
        Z_HI_MAX = 1.19e-2

        def window_corr(front):
            z_lo = front - 0.6 * span
            z_hi = front + 0.4 * span
            if z_hi > Z_HI_MAX:            # shift, never shrink: constant span
                z_lo, z_hi = Z_HI_MAX - span, Z_HI_MAX
            if z_lo < Z_LO_MIN:
                z_lo, z_hi = Z_LO_MIN, Z_LO_MIN + span
            return (z_lo, z_hi, args.window_dz)

        # full-gap: fine corridor spans the entire gap minus the two
        # uniform 10-cell tails (z_hi so that a 10-cell upper tail over
        # the remaining 10*dz is uniform at dz too)
        fg_corr = (Z_LO_MIN, 1.25e-2 - 10 * args.window_dz, args.window_dz)
        corridor = (fg_corr if args.full_gap
                    else window_corr(1e-2))  # initial front = seed position
        # the corridor the checkpointed state lives on travels INSIDE the
        # checkpoint (meta entry) — the split window.json sidecar could
        # desync from the state on a mid-write kill (round-2 advisor)
        if args.resume and ckpt.exists():
            from fedm_tpu.io.checkpoint import load_checkpoint as _lc

            _, meta = _lc(ckpt, with_meta=True)
            if "z_corridor" in meta:
                corridor = tuple(float(v) for v in meta["z_corridor"])
            else:
                # legacy checkpoint: fall back to the window.json sidecar
                wfile = args.out / "window.json"
                if wfile.exists():
                    import json as _json

                    corridor = tuple(_json.loads(wfile.read_text()))
            # the window POSITION always comes from the checkpoint, but a
            # resume may request a different corridor dz (e.g. finishing
            # the post-arrival tail at the reference's own resolution):
            # build the model on the requested spacing and z-remap the
            # state below (node counts change; _remap_z is count-agnostic)
            src_corridor = corridor
            if args.full_gap:
                # finish-segment corridor is the full gap regardless of
                # the checkpoint's window position; the z-remap below
                # prolongs the coarse-tail region onto the fine mesh
                corridor = fg_corr
            elif corridor[2] != args.window_dz:
                corridor = (corridor[0], corridor[1], args.window_dz)
    else:
        corridor = (0.0, 1.08e-2, args.dz)
    common = dict(nx=args.nx, z_corridor=corridor, stab_mode=args.stab,
                  poisson_precond=args.precond, T_final=args.T,
                  row_scaled=args.row_scaled)
    if window:
        tail_cells = tuple(int(s) for s in args.tail_cells.split(","))
        assert len(tail_cells) == 2
        common["z_tail_cells"] = tail_cells
        if args.wall_dz is not None:
            common["z_wall_dz"] = args.wall_dz
    if args.dr is not None:
        common["r_corridor"] = (args.r1, args.dr)
    if not args.no_floor:
        common["density_floor"] = 1e13  # = cfg.background
    if args.tzline:
        common["transport_zline"] = True
    if args.f64:
        # host_loop also for f64: the tunneled TPU kills long single XLA
        # executions, and the emulated-f64 whole-step program is the
        # longest one (docs/STREAMER_STUDY.md round 5)
        # accept_reduction / true_res_rescue apply on the f64 path too
        # (round-3 advisor: omitting them silently dropped the flags);
        # hi_residual is a no-op at dtype f64 (`_hi_enabled`)
        nc = NewtonConfig(rtol=args.rtol or 1e-3, max_iter=20,
                          linear_tol=args.linear_tol,
                          linear_maxiter=args.linear_maxiter,
                          linear_stall_window=args.linear_stall_window,
                          linear_solver=args.linear_solver or "bicgstab",
                          accept_reduction=args.accept_reduction,
                          true_res_rescue=args.true_res_rescue,
                          delta_clip=delta_clip,
                          host_loop=True)
        model = StreamerModel(StreamerConfig(newton=nc, **common))
        fallback = None
    else:
        # measured (this tool's shakedowns): at dz=2e-5 the f32 noise
        # floor sits at ~res0/800, right at the default rtol=1e-3 target;
        # 3e-3 converges in 2-4 iterations and the adaptive ttol error
        # control still guards physical accuracy
        # rtol rides just above the 55k-mesh noise floor; accept_reduction
        # covers finer meshes whose floor is higher (res0/224 at dz=1e-5
        # vs res0/800 at dz=2e-5 — measured; see NewtonConfig docstring)
        nc = NewtonConfig(rtol=args.rtol or (1e-3 if args.hi_res else 3e-3),
                          max_iter=20,
                          linear_tol=args.linear_tol,
                          linear_maxiter=args.linear_maxiter,
                          linear_stall_window=args.linear_stall_window,
                          linear_solver=args.linear_solver or "bicgstab",
                          accept_reduction=args.accept_reduction,
                          host_loop=True,
                          hi_residual=args.hi_res,
                          delta_clip=delta_clip,
                          true_res_rescue=args.true_res_rescue)
        model = StreamerModel(StreamerConfig(dtype=jnp.float32, newton=nc,
                                             **common))
        if args.no_fallback:
            fallback = None
        else:
            fallback = StreamerModel(StreamerConfig(**common),
                                     mesh=model.mesh)
            fallback.system.use_gather_scatter()
    model.system.use_gather_scatter()
    if window and not args.full_gap:
        # geom-mode exists for zero-recompile window MOVES; the full-gap
        # mesh is static, so baking the geometry into the program keeps
        # the compiled step smaller (the 547k-unknown finish segment sits
        # near the tunneled worker's compile-size ceiling)
        model.system.enable_geom_mode()
    if args.direct_rescue:
        assert fallback is None, (
            "--direct-rescue replaces the f64 escalation: pass "
            "--no-fallback (or --f64)")
        assert args.devices == 1, "--direct-rescue is single-chip"
        from fedm_tpu.solvers.direct import DirectNewton
    sharding = None
    if args.devices > 1:
        from jax.sharding import Mesh

        devs = jax.devices()
        assert len(devs) >= args.devices, (
            f"--devices {args.devices} but only {len(devs)} present "
            "(virtual CPU meshes: XLA_FLAGS="
            "--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu)")
        dev_mesh = Mesh(np.array(devs[:args.devices]), ("space",))
        sharding = model.system.use_gspmd(dev_mesh)
        if fallback is not None:
            fallback.system.use_gspmd(dev_mesh)

    n_dofs = model.space.n_dofs
    print(f"devices: {jax.devices()}", flush=True)
    corr = model.cfg.z_corridor
    print(f"mesh: {n_dofs} dofs ({3 * n_dofs} unknowns), "
          f"z_corridor=({corr[0]:.4e},{corr[1]:.4e},dz={corr[2]:g})"
          f"{' [moving]' if window else ''}, "
          f"stab={args.stab}, precond={args.precond}, "
          f"dtype={'f64' if args.f64 else 'f32'}", flush=True)

    driver = AdaptiveDriver(
        model.system, monitor_idx=1, ttol=model.cfg.ttol,
        dt_min=model.cfg.dt_min, dt_max=model.cfg.dt_max,
        error_log=args.out / "relative error.log",
        fallback_system=(
            DirectNewton(model.system, verbose=args.verbose)
            if args.direct_rescue
            else None if fallback is None else fallback.system),
        crash_checkpoint=args.out / "crash.npz",
        post_accept=model.floor_projection(), verbose=args.verbose,
        fail_dt_cap=args.fail_dt_cap, predictor=args.predictor,
        newton_log=args.out / "newton.log",
        floor_atol=args.floor_atol)

    if args.resume and ckpt.exists():
        state, _meta = load_checkpoint(ckpt, with_meta=True)
        # a checkpoint's state lives on the z-lines its writer's geometry
        # flags produced; changing --wall-dz or --window-dz across a
        # resume would otherwise silently load the fields onto shifted
        # nodes (or fail on shape) — remap along z instead
        _src_wall = (float(_meta["z_wall_dz"])
                     if "z_wall_dz" in _meta else None)
        _src_corr = (src_corridor if window else None)
        # legacy checkpoints predate the meta entry and were all written
        # with the (48, 48) fixed topology
        _src_tails = (tuple(int(v) for v in _meta["z_tail_cells"])
                      if "z_tail_cells" in _meta else (48, 48))
        if window and (_src_wall != args.wall_dz
                       or _src_corr != model.cfg.z_corridor
                       or _src_tails != model.cfg.z_tail_cells):
            import dataclasses as _dc

            cfg_src = _dc.replace(model.cfg, z_wall_dz=_src_wall,
                                  z_corridor=_src_corr,
                                  z_tail_cells=_src_tails)
            zs_src = StreamerModel._z_coords(cfg_src)
            zs_dst = np.unique(model.mesh.coords[:, 1])
            n_r = len(np.unique(model.mesh.coords[:, 0]))
            # restrict=True: a cross-resolution resume must anti-alias
            # locally-coarsened regions (top-hat restriction) — pointwise
            # sampling of the resolved cathode layer is what Newton
            # refused at every dt (docs/BAGHERI14_RUN.md coarse-tail)
            state = model._remap_z(state, zs_src, zs_dst, n_r,
                                   restrict=True)
            print(f"remapped checkpoint z-lines: wall-dz {_src_wall} -> "
                  f"{args.wall_dz}, corridor dz {_src_corr[2]:g} -> "
                  f"{model.cfg.z_corridor[2]:g}, tails {_src_tails} -> "
                  f"{model.cfg.z_tail_cells} "
                  f"({len(zs_src)} -> {len(zs_dst)} z-lines; wall cell "
                  f"{zs_src[1] - zs_src[0]:.2e} -> "
                  f"{zs_dst[1] - zs_dst[0]:.2e})", flush=True)
            # a cross-resolution remap invalidates the BDF2 history (see
            # restart_bdf_history docstring): restart the integrator on a
            # backward-Euler first step from the remapped state.
            from fedm_tpu.timestepping.driver import restart_bdf_history

            state = restart_bdf_history(state, dt=args.resume_dt)
            print(f"cross-resolution remap: BDF history restarted "
                  f"(backward-Euler first step, dt={state.dt:.3e})",
                  flush=True)
        if args.restart_bdf:
            from fedm_tpu.timestepping.driver import restart_bdf_history

            state = restart_bdf_history(state, dt=args.resume_dt)
            print(f"--restart-bdf: BDF history restarted "
                  f"(backward-Euler first step, dt={state.dt:.3e})",
                  flush=True)
        print(f"resumed from {ckpt}: t={state.t:.4e}, "
              f"{state.n_accepted} steps", flush=True)
    else:
        state = model.initial_state()
    if sharding is not None:
        # production corridor meshes have odd dof counts (2^k+1 coordinate
        # lines) — place_state falls back to the step's internal pad ->
        # constrain -> slice anchors when an even device_put cannot tile
        state.u = model.system.place_state(state.u)
        state.u_old = model.system.place_state(state.u_old)
        state.u_old1 = model.system.place_state(state.u_old1)

    coords = model.space.dof_coords
    axis = np.isclose(coords[:, 0], 0.0)
    z_axis = coords[axis, 1]

    def report(state, wall, n_since):
        u = np.asarray(state.u)
        ne_axis = np.exp(u[axis, 1])
        ion_mask = ne_axis > 1e18
        front = float(z_axis[ion_mask].min()) if ion_mask.any() else float("nan")
        # peak field on axis from the potential gradient along z
        order = np.argsort(z_axis)
        phi = u[axis, 2][order]
        Ez = -np.gradient(phi, z_axis[order])
        guards = ""
        if args.diag_guards:
            from fedm_tpu.model.system import StepParams as _SP
            n_g = model.system.guarded_block_count(
                state.u, state.u_old, {},
                _SP(jnp.asarray(state.t), jnp.asarray(state.dt),
                    jnp.asarray(state.dt_old)))
            guards = f" n_guarded={n_g}"
        print(f"t={state.t:.4e} dt={state.dt:.3e} steps={state.n_accepted} "
              f"rej={state.n_rejected} esc={driver.n_escalated} "
              f"stall={driver.n_stall_accepted} "
              f"ne_max={ne_axis.max():.3e} front_z={front:.4e} "
              f"Emax={np.abs(Ez).max():.3e}{guards} "
              f"[{n_since / max(wall, 1e-9):.2f} steps/s]", flush=True)
        return front

    def ckpt_meta():
        # protocol provenance in every checkpoint (json string), so any
        # artifact names the solver protocol that produced it
        meta = {"protocol": _json.dumps(protocol)}
        if not window:
            return meta
        meta.update({"z_corridor": model.cfg.z_corridor,
                     "z_tail_cells": model.cfg.z_tail_cells})
        if model.cfg.z_wall_dz is not None:
            meta["z_wall_dz"] = model.cfg.z_wall_dz
        return meta

    # a dt_min crash checkpoint must carry the same window meta as the
    # periodic ones, or its --resume would remap from the wrong (legacy)
    # topology (AdaptiveDriver.crash_meta docstring)
    driver.crash_meta = ckpt_meta

    def save_window():
        # human-readable sidecar only; resume reads the checkpoint meta
        if window:
            import json as _json

            (args.out / "window.json").write_text(
                _json.dumps(list(model.cfg.z_corridor)))

    T = args.T
    t_wall = time.perf_counter()
    n_last = state.n_accepted
    last_saved = state.n_accepted
    while state.t < T * (1 - 1e-12) and state.n_accepted < args.max_steps:
        state.dt = min(state.dt, T - state.t)
        state = driver.advance(state, {})
        # n_accepted-transition triggers (rejected attempts must not
        # re-fire the report or re-save the same checkpoint)
        if (state.n_accepted % args.report_every == 0
                and state.n_accepted != n_last):
            now = time.perf_counter()
            front = report(state, now - t_wall, state.n_accepted - n_last)
            t_wall, n_last = now, state.n_accepted
            # moving window: re-center once the front nears the leading
            # (low-z) third of the fine corridor — a zero-recompile
            # geometry swap (StreamerModel.move_window): same compiled
            # step, same driver, ~100 ms of host work
            z_lo = model.cfg.z_corridor[0]
            if (window and not args.full_gap and np.isfinite(front)
                    and front < z_lo + 0.35 * span):
                new_corr = window_corr(front)
                if abs(new_corr[0] - z_lo) > 1e-12:
                    print(f"REMESH: window {model.cfg.z_corridor} -> "
                          f"{new_corr} (front at {front:.4e})", flush=True)
                    t_rm = time.perf_counter()
                    state = model.move_window(new_corr, state)
                    print(f"REMESH done in "
                          f"{time.perf_counter() - t_rm:.2f}s", flush=True)
                    coords = model.space.dof_coords
                    axis = np.isclose(coords[:, 0], 0.0)
                    z_axis = coords[axis, 1]
                    save_checkpoint(ckpt, state, meta=ckpt_meta())
                    save_window()
                    last_saved = state.n_accepted
        if (state.n_accepted % args.checkpoint_every == 0
                and state.n_accepted != last_saved):
            save_checkpoint(ckpt, state, meta=ckpt_meta())
            save_window()
            last_saved = state.n_accepted
            # keep a trail of stiff-regime restart points
            if state.n_accepted % (10 * args.checkpoint_every) == 0:
                save_checkpoint(
                    args.out / f"checkpoint_{state.n_accepted:06d}.npz",
                    state, meta=ckpt_meta())

    save_checkpoint(ckpt, state, meta=ckpt_meta())
    report(state, time.perf_counter() - t_wall,
           state.n_accepted - n_last)
    done = state.t >= T * (1 - 1e-12)
    print(f"{'REACHED T_final' if done else 'STOPPED'} at t={state.t:.6e} "
          f"({state.n_accepted} accepted, {state.n_rejected} rejected, "
          f"{driver.n_escalated} escalated, "
          f"{driver.n_stall_accepted} stall-accepted this segment)",
          flush=True)


if __name__ == "__main__":
    main()
