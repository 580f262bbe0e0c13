"""Benchmark: DoF * BDF-steps / second / chip on the 2D streamer.

North-star metric from BASELINE.md (the reference publishes no wall-time
numbers; `BASELINE.json` "published": {}).

Measurement protocol (round 2 — honest mid-run numbers):
- restart from a committed STIFF-REGIME checkpoint of the Bagheri 14 ns
  run (`bench_assets/bagheri_dz1e-5_ckpt.npz`, written by
  `tools/bagheri_run.py` at ~1 ns on the production dz=1e-5 mesh:
  ionisation front formed, ne ~ 1e19-1e20, field ~1e7 V/m — the regime
  that dominates the production run, NOT the easy near-uniform post-init
  steps round 1 measured);
- measure >= 50 accepted adaptive BDF steps (full Newton-Krylov, error
  control, PID controller);
- report BOTH named metrics: DoF*BDF-steps/s/chip (primary) and
  Newton-Krylov wall-time per attempted step.

Baseline derivation (documented estimate, unchanged from round 1): the
reference's per-BDF-step cost on a CPU node is ~3 Newton iterations, each
paying a MUMPS factorise+solve plus FFC-kernel assembly of the coupled
5e4-unknown system: ~2-4 s/step in FEniCS-2019 practice for this size,
i.e. ~5e4 unknowns / 2.5 s ~ 2e4 DoF*steps/s. No reference-stack run is
possible in this image (no FEniCS), so this stays an estimate and is
labelled as such.

Prints exactly one JSON line on stdout.
"""

import json
import os
import sys
import time
from pathlib import Path

# Line-search structure (round-5 A/B on this bench, same chip/session):
# the r4 "folded" lam=1 probe costs ~1.6% steady-state step time (median
# 2.221 vs 2.185 s/step; Newton-Krylov 2.408 vs 2.324 s/step) in exchange
# for a ~50 s smaller first compile. The bench's headline is steady-state
# throughput, so it runs the EAGER structure; production runs
# (tools/bagheri_run.py) keep the folded default because supervisor
# restarts re-pay the compile while 1.6% of a 25-100 s sheath step is
# noise. See NewtonConfig / newton_iteration (FEDM_TPU_LS_EAGER).
os.environ.setdefault("FEDM_TPU_LS_EAGER", "1")

REFERENCE_ESTIMATE = 2.0e4  # DoF*BDF-steps/s, see module docstring
ROOT = Path(__file__).resolve().parent
# production checkpoint (round-5 configuration: dz=1e-5 corridor mesh,
# f32-only host-loop Newton — the config that traverses the old t=1.13 ns
# wall, docs/STREAMER_STUDY.md round 5); legacy dz=2e-5 checkpoint kept as
# a fallback so the bench still runs on older asset sets
CKPT_DZ1E5 = ROOT / "bench_assets" / "bagheri_dz1e-5_ckpt.npz"
CKPT_LEGACY = ROOT / "bench_assets" / "bagheri_ckpt.npz"


def _stiff_bench():
    """Preferred path: >= 50 mid-run steps from the stiff checkpoint."""
    import jax
    import jax.numpy as jnp

    from fedm_tpu.io.checkpoint import load_checkpoint
    from fedm_tpu.models.streamer import StreamerModel, StreamerConfig
    from fedm_tpu.solvers.newton import NewtonConfig
    from fedm_tpu.timestepping import AdaptiveDriver

    # the exact configuration of the tools/bagheri_run.py production run
    # that wrote the checkpoint (docs/STREAMER_STUDY.md round 5): f32-only,
    # host-driven Newton loop (one XLA execution per Newton iteration —
    # the tunneled-TPU execution deadline kills long single executions),
    # noise-floor stall acceptance, far-field density floor, Peclet
    # upwinding, z-line-smoothed V-cycle. No f64 fallback system: the
    # production path takes zero escalations (measured), and the emulated
    # f64 program crashes the tunneled TPU worker at this size.
    if CKPT_DZ1E5.exists():
        ckpt, dz = CKPT_DZ1E5, 1e-5
        # round-6 production: f64-defect Newton (hi_residual), r-corridor
        # mesh (radially-starved meshes go annular and stall —
        # docs/STREAMER_STUDY.md round 6).
        # rtol 1e-3: same-window A/B vs 1e-4 measured 2.84 vs 4.51 s/step
        # with trajectory errors identical to the 3rd digit (both are
        # ttol-guarded; with the f64-defect Newton 1e-3 sits ~1e5 above
        # the noise floor)
        # linear_tol 3e-2: inexact-Newton forcing-term A/B on this very
        # checkpoint+window (tools/ab_lintol.py, round 3): 1e-4 spends 28
        # Krylov iterations/solve converging to 8e-5 — 10x beyond what the
        # rtol=1e-3 outer target uses. Measured 3.49 -> 2.24 s/advance
        # (1e-4 -> 3e-2) at +0.45 Newton iters/attempt, 0 rejects, ttol
        # step errors identical to 3 digits, same front position.
        nc = NewtonConfig(rtol=1e-3, max_iter=20, linear_tol=3e-2,
                          linear_maxiter=400, accept_reduction=3e-2,
                          host_loop=True, hi_residual=True)
        # stab off: plain Galerkin like the reference — the Peclet
        # artificial diffusion suppressed the head field and drove the
        # annular-rim stall (round-6 A/B, docs/STREAMER_STUDY.md)
        extra = dict(r_corridor=(2e-3, 2e-5), stab_mode="off")
    else:
        # LEGACY fallback (best-effort): without the f64 escalation system
        # this f32-only path can occasionally walk dt to dt_min on the old
        # dz=2e-5 checkpoint (round-2 measurement); only stall-acceptance
        # (accept_reduction) stands in the way. Kept runnable for older
        # asset sets, not a supported bench configuration.
        ckpt, dz = CKPT_LEGACY, 2e-5
        nc = NewtonConfig(rtol=3e-3, max_iter=20, linear_tol=1e-4,
                          linear_maxiter=400, accept_reduction=3e-2,
                          host_loop=True)
        extra = dict(stab_mode="peclet")
    common = dict(nx=96, z_corridor=(0.0, 1.08e-2, dz),
                  poisson_precond="mg-zline",
                  density_floor=1e13, **extra)
    cfg = StreamerConfig(dtype=jnp.float32, newton=nc, **common)
    model = StreamerModel(cfg)
    model.system.use_gather_scatter()
    state = load_checkpoint(ckpt)
    assert state.u.shape[0] == model.space.n_dofs, "checkpoint/mesh mismatch"
    n_unknowns = model.space.n_dofs * model.n_eq
    print(f"bench: Bagheri streamer restart at t={state.t:.3e} "
          f"({state.n_accepted} steps in), {model.space.n_dofs} nodes, "
          f"{n_unknowns} unknowns on {jax.devices()[0]}", file=sys.stderr)

    # FEDM_TPU_BENCH_PREDICTOR: A/B knob for the Newton initial-guess
    # predictor (AdaptiveDriver.predictor, round-3 feature). Default off
    # until a same-chip A/B shows a win at identical trajectories.
    pred = float(os.environ.get("FEDM_TPU_BENCH_PREDICTOR", "0"))
    driver = AdaptiveDriver(
        model.system, monitor_idx=1, ttol=model.cfg.ttol,
        dt_min=model.cfg.dt_min, dt_max=model.cfg.dt_max,
        post_accept=model.floor_projection(), predictor=pred)
    # warm-up: compile (the persistent XLA cache usually absorbs this)
    # + settle the controller
    t0 = time.perf_counter()
    state = driver.advance(state, {})
    print(f"bench: first step (incl. compile) "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
    state = driver.advance(state, {})

    # FEDM_TPU_BENCH_STEPS shortens the window for CPU smoke-verification
    # of the bench path itself; the driver-run default stays 50.
    n_steps = int(os.environ.get("FEDM_TPU_BENCH_STEPS", "50"))
    start_acc, start_rej = state.n_accepted, state.n_rejected
    import jax as _jax
    _jax.block_until_ready(state.u)
    t0 = time.perf_counter()
    step_times = []
    for _ in range(n_steps):
        t1 = time.perf_counter()
        state = driver.advance(state, {})
        _jax.block_until_ready(state.u)
        step_times.append(time.perf_counter() - t1)
    elapsed = time.perf_counter() - t0
    accepted = state.n_accepted - start_acc
    attempts = accepted + (state.n_rejected - start_rej)
    # the deployment TPU is reached through a tunnel whose throughput
    # stalls transiently (measured: identical steps spanning 3.3 s to
    # 30+ s wall inside one window while device work is constant). The
    # headline rate uses the MEDIAN per-advance wall time — the
    # framework's own steady-state cost — with the raw mean kept
    # alongside for the environment-inclusive number.
    import statistics
    med = statistics.median(step_times)
    return {
        "rate": n_unknowns * (accepted / n_steps) / med,
        "mean_rate": n_unknowns * accepted / elapsed,
        "median_step_s": med,
        "newton_krylov_s_per_step": elapsed / attempts,
        "accepted": accepted,
        "attempts": attempts,
        # self-describing basis (round-2 advisor): the headline is the
        # MEDIAN per-advance rate over n_steps advances; mean_rate is the
        # environment-inclusive (tunnel stalls and all) number
        "n_steps": n_steps,
        "basis": "median_step",
        "regime": f"stiff mid-run restart at t={state.t:.3e}",
    }


def _fresh_bench():
    """Fallback when the checkpoint asset is absent: short fresh-start
    measurement (labelled as the easy regime)."""
    import jax
    import jax.numpy as jnp

    from fedm_tpu.models.streamer import StreamerModel, StreamerConfig

    cfg = StreamerConfig(nx=96, ny=192, dtype=jnp.float32, mg_levels=0)
    model = StreamerModel(cfg)
    model.system.use_gather_scatter()
    n_unknowns = model.space.n_dofs * model.n_eq
    driver = model.make_driver()
    state = model.initial_state()
    state = driver.advance(state, {})
    n_steps = 10
    start = state.n_accepted
    jax.block_until_ready(state.u)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state = driver.advance(state, {})
    jax.block_until_ready(state.u)
    elapsed = time.perf_counter() - t0
    accepted = state.n_accepted - start
    return {
        "rate": n_unknowns * accepted / elapsed,
        "newton_krylov_s_per_step": elapsed / accepted,
        "accepted": accepted,
        "attempts": accepted,
        "regime": "fresh-start (easy post-init regime; checkpoint missing)",
    }


def main():
    have_ckpt = CKPT_DZ1E5.exists() or CKPT_LEGACY.exists()
    res = _stiff_bench() if have_ckpt else _fresh_bench()
    print(f"bench: {res['accepted']} accepted / {res['attempts']} attempted "
          f"steps; Newton-Krylov {res['newton_krylov_s_per_step']:.3f} "
          f"s/step; regime: {res['regime']}", file=sys.stderr)
    out = {
        "metric": "streamer_dof_bdf_steps_per_sec",
        "value": res["rate"],
        "unit": "DoF*steps/s/chip",
        "vs_baseline": res["rate"] / REFERENCE_ESTIMATE,
        "newton_krylov_s_per_step": res["newton_krylov_s_per_step"],
        "regime": res["regime"],
    }
    for k in ("mean_rate", "median_step_s", "n_steps", "basis"):
        if k in res:
            out[k] = res[k]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
