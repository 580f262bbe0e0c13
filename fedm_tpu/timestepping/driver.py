"""Adaptive solve driver: reject/retry stepping with error control.

Reproduces the semantics of the reference's recursive `adaptive_solver`
(`/root/reference/fedm/functions.py:954-1130`) as a bounded host-side loop
around ONE jitted attempted step (dt is traced, so retries never
recompile — SURVEY.md section 7 'dynamic control flow'):

- attempt: t += dt, update time-dependent BCs, Newton solve;
- on success: relative step error ||u_new - u_old + eps|| / ||u_old + eps||
  on the monitored component (LMEA -> electron energy density, index 0;
  LFA -> electron density, index -2; `functions.py:1056-1064`), appended to
  `relative error.log` in the reference's exact column format
  (`functions.py:1067-1069`). `monitor_idx` also accepts a tuple/list of
  components — the controlled error is then the MAX over them — an
  upgrade over the reference's single-variable monitor: a wild excursion
  in an unmonitored species (measured: u_ion = -909 at one node while the
  monitored electrons stayed smooth, docs/STREAMER_STUDY.md round 6) is
  caught by CONTROL (dt shrink) instead of by after-the-fact guards;
- error >= ttol: dt *= 0.5*ttol/error, reset, retry (`functions.py:1086`);
- Newton failure: dt *= 0.5, reset, retry (`functions.py:1092`);
- dt < dt_min: SystemExit (`functions.py:1099-1100`);
- after acceptance: dt_old <- dt, dt <- controller(dt, error history)
  (PID by default, `examples/streamer_discharge/fedm-streamer.py:335-341`).

Numerical failure recovery doubles as the framework's fault handling, as in
the reference (SURVEY.md section 5, failure detection).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..constants import DOLFIN_EPS
from ..model.system import CoupledSystem, StepParams
from .controllers import adaptive_timestep

Array = jax.Array


def step_error_norm(var_new: Array, var_old: Array) -> Array:
    """Relative l2 step error with the reference's DOLFIN_EPS shift
    (`fedm/functions.py:1062-1064`)."""
    num = jnp.linalg.norm(var_new - var_old + DOLFIN_EPS)
    den = jnp.linalg.norm(var_old + DOLFIN_EPS)
    return num / den


@dataclass
class TimeState:
    """Everything needed to advance (and to checkpoint/resume — an upgrade
    over the reference, which cannot restart; SURVEY.md section 5)."""

    u: Array          # current solution [n_dofs, n_eq]
    u_old: Array
    u_old1: Array
    t: float = 0.0
    dt: float = 1e-13
    dt_old: float = 1e30
    max_error: list = field(default_factory=lambda: [1.0, 1.0, 1.0])
    n_accepted: int = 0
    n_rejected: int = 0


def restart_bdf_history(state: TimeState, dt: float | None = None) -> TimeState:
    """Restart the multistep history in place: the next attempt becomes a
    backward-Euler step from ``state.u``.

    A cross-RESOLUTION state remap (e.g. a corridor-dz change across a
    resume) invalidates the BDF2 history: ``u_old`` and ``u_old1`` are
    restricted/prolonged independently, so their divided differences no
    longer approximate a time derivative on the new mesh — the first BDF2
    attempt then hands Newton an inconsistent system and it (correctly)
    refuses at every dt (measured: ``runs/bagheri14_tail``, zero accepted
    steps; ``docs/BAGHERI14_RUN.md`` coarse-tail study). Setting
    ``dt_old`` to the first-step sentinel makes the ratio-weighted BDF2
    combination degrade to the BDF1 difference ``u - u_old``
    (``model/forms.py`` ``bdf2_history_part``) — the same bootstrap the
    reference uses on its first step (`fedm-tof_1d.py:65`)."""
    state.u_old = state.u
    state.u_old1 = state.u
    state.dt_old = 1e30
    if dt is not None:
        state.dt = dt
    return state


class AdaptiveDriver:
    def __init__(
        self,
        system: CoupledSystem,
        monitor_idx: int,
        ttol: float,
        dt_min: float,
        dt_max: float,
        controller: Callable = adaptive_timestep,
        error_log: Optional[Path] = None,
        max_retries: int = 60,
        verbose: bool = False,
        fallback_system: Optional[CoupledSystem] = None,
        escalate_after_rejects: int = 2,
        crash_checkpoint: Optional[Path] = None,
        crash_meta: Optional[Callable] = None,
        post_accept: Optional[Callable] = None,
        fail_dt_cap: float = 0.0,
        fail_cap_recovery: float = 1.05,
        predictor: float = 0.0,
        newton_log: Optional[Path] = None,
        floor_atol: float = 0.0,
    ):
        self.system = system
        # int (reference semantics) or tuple/list of components (max-over)
        self.monitor_idx = monitor_idx
        self.ttol = ttol
        self.dt_min = dt_min
        self.dt_max = dt_max
        self.controller = controller
        self.error_log = Path(error_log) if error_log is not None else None
        self.max_retries = max_retries
        self.verbose = verbose
        # NOTE on Newton initial guesses: the reference starts from u_old
        # (`fedm/functions.py:1103`) and so does this driver. A linear
        # extrapolation predictor was evaluated and REJECTED: a near-exact
        # guess makes ||R(delta0)|| tiny, and the SNES-style rtol target
        # relative to it then falls below the floating-point residual
        # floor, turning good steps into spurious failures.
        #
        # Precision escalation: with `fallback_system` (same model built in
        # a higher precision, e.g. f64 vs the fast f32 system), a Newton
        # failure retries the SAME dt in the fallback before shrinking dt.
        # Rationale (measured on the streamer): at sharpening ionisation
        # fronts the f32 assembly noise floor overtakes the achievable
        # residual reduction — the linear solve "converges" yet the Newton
        # update makes no progress — while f64 marches on. Escalation
        # confines the expensive precision to the handful of hard steps.
        #
        # Rejection-rate trigger (round-2 refinement, the study's planned
        # fix): failure-triggered escalation engages too late — by the
        # time f32 Newton *fails*, the accepted states already carry the
        # front oscillation ("death-state resume + f64 escalation: no
        # rescue", docs/STREAMER_STUDY.md). So after
        # `escalate_after_rejects` rejected attempts within one advance,
        # ALL remaining attempts of that advance run in the fallback
        # precision, while the state is still healthy.
        self.fallback_system = fallback_system
        self.escalate_after_rejects = escalate_after_rejects
        self.n_escalated = 0
        # Stall-acceptance audit (the counterpart of PETSc SNES printing
        # its converged-reason per solve): count, over the run, how many
        # ACCEPTED steps exited Newton via the `accept_reduction` clause
        # (kept-best iterate at the noise floor) vs a genuine rtol/stol
        # convergence, and optionally record one row per accepted step in
        # a `newton.log` sidecar (`step exit iters res0 res dt`). The
        # `relative error.log` format stays byte-identical to the
        # reference's (`fedm/functions.py:1067-1069`).
        self.n_stall_accepted = 0
        self.newton_log = Path(newton_log) if newton_log is not None else None
        # FLOOR-TRACKING ABSOLUTE TOLERANCE (round 5, the post-band-
        # crossing regime of the Bagheri finish segment): after a large
        # rebalancing step, the accepted state satisfies the discrete
        # equations to its f32 assembly-noise floor — the NEXT attempt
        # starts at res0 ~ that floor (measured: res0 3.0e16 vs the
        # previous step's final 2.94e16), Newton can reduce NOTHING, and
        # every reduction-based criterion (rtol, accept_reduction) fails,
        # walking dt down for a state that is already converged in the
        # absolute sense. With floor_atol = C > 0 the driver maintains a
        # running floor estimate (the last accepted step's final ||F||)
        # and hands the host-loop solver a dynamic absolute target
        # C * floor: an attempt whose res0 is already at the floor exits
        # converged immediately (taking the BDF-extrapolated predictor
        # state), and the ttol error control — the physical guard —
        # judges the step as always. This is SNES atol semantics with a
        # problem-scaled, self-updating magnitude (the reference's MUMPS
        # f64 never hits this because its floor is 1e9 lower). 0 = off.
        self.floor_atol = floor_atol
        self._res_floor = float("inf")
        # On a dt_min death, save the last good state here first so the
        # failure is resumable forensics instead of a lost run (the
        # reference just raises SystemExit, `functions.py:1099-1100`).
        self.crash_checkpoint = (
            Path(crash_checkpoint) if crash_checkpoint is not None else None)
        # Callable returning the same meta dict the run's periodic
        # checkpoints carry (e.g. moving-window corridor/tail topology).
        # Without it a crash checkpoint is NOT safely resumable for
        # geometry-bearing runs: the Bagheri finish segment's dt_min death
        # wrote a crash.npz whose missing corridor/tail meta would have
        # been mis-read as the legacy (48,48) topology on --resume,
        # z-remapping the state onto wrong nodes (measured 2026-08-19;
        # repaired by hand-repacking the meta). A callable (not a dict)
        # because window moves mutate the geometry mid-run.
        self.crash_meta = crash_meta
        # Projection applied to the accepted state (AFTER the step-error
        # test, so the error control still measures the raw solve). Used
        # for physics-preserving clamps — e.g. the streamer's far-field
        # density floor at the physical background, which bounds the
        # state's dynamic range on range-limited TPU arithmetic.
        self.post_accept = post_accept
        # Solver-aware dt limiting (off when fail_dt_cap == 0, the
        # reference's semantics). The reference's controller is blind to
        # WHY a step was rejected: after a Newton failure it halves dt,
        # converges a step or two later, and the PID — seeing only small
        # accepted errors — walks dt straight back into the failing range.
        # Measured on the Bagheri post-arrival sheath (runs/bagheri14,
        # t > 13.07 ns): a strict period-2 limit cycle — PID proposes
        # ~1.5e-12 s, Newton fails twice (each failed attempt burns
        # max_iter x linear_maxiter Krylov iterations), dt collapses to
        # exactly 0.25x, accepted, regrown — so HALF the attempts were
        # full-cost failures and ~80% of wall time was wasted re-probing
        # a dt the solver had just refused. With a cap: a Newton failure
        # at dt_f bounds future controller proposals at
        # `fail_dt_cap * dt_f`; each acceptance relaxes the bound by
        # `fail_cap_recovery`, so the driver re-probes larger dt
        # gradually instead of every other step (PETSc TS has the same
        # safeguard in its adapt layer).
        self.fail_dt_cap = fail_dt_cap
        self.fail_cap_recovery = fail_cap_recovery
        self._dt_cap = float("inf")
        # Newton initial-guess predictor (0 = off, the reference's
        # semantics — it starts every solve from u_old,
        # `fedm/functions.py:1103`). With predictor = p, the guess is the
        # BDF linear extrapolation u_old + p*(dt/dt_old)*(u_old - u_old1).
        # The NOTE above records why the plain predictor was rejected in
        # round 2: the SNES rtol target was anchored to the guess's own
        # (small) residual. `CoupledSystem._step_host` now anchors the
        # target to the unpredicted ||R(0)|| whenever a guess is supplied
        # (falling back to u_old when the prediction doesn't reduce the
        # residual), which removes that failure mode.
        self.predictor = predictor

    def _die(self, state: TimeState, n_rejected: int, msg: str):
        if self.crash_checkpoint is not None:
            from ..io.checkpoint import save_checkpoint

            last_good = TimeState(
                u=state.u, u_old=state.u_old, u_old1=state.u_old1,
                t=state.t, dt=state.dt, dt_old=state.dt_old,
                max_error=list(state.max_error),
                n_accepted=state.n_accepted, n_rejected=n_rejected)
            save_checkpoint(
                self.crash_checkpoint, last_good,
                meta=self.crash_meta() if self.crash_meta else None)
            msg += f" Last good state saved to {self.crash_checkpoint}."
        raise SystemExit(msg)

    def _monitor_error(self, u_new, u_old):
        """Step error on the monitored component(s): the reference's
        single-variable norm (`fedm/functions.py:1056-1064`) for an int
        monitor, the max over components for a tuple/list monitor."""
        idx = self.monitor_idx
        if isinstance(idx, int):
            return step_error_norm(u_new[:, idx], u_old[:, idx])
        errs = [step_error_norm(u_new[:, i], u_old[:, i]) for i in idx]
        return jnp.max(jnp.stack(errs))

    def _log_error(self, err: float, dt_old: float, dt: float) -> None:
        if self.error_log is None:
            return
        with open(self.error_log, "a") as f:
            f.write(f"{err:<23}  {dt_old:<23}  {dt:<23}\n")

    def advance(self, state: TimeState, aux: Dict) -> TimeState:
        """One *accepted* BDF step (with as many rejected attempts as the
        error control demands). Rotates history first, like the reference
        scripts (`fedm-gd.py:421-427`)."""
        u_old1, u_old = state.u_old, state.u
        dt, dt_old = state.dt, state.dt_old
        n_rejected = state.n_rejected  # local — never mutate the caller's state
        rejects_here = 0  # rejections within THIS advance

        for _ in range(self.max_retries):
            t_try = state.t + dt
            params = StepParams(
                jnp.asarray(t_try), jnp.asarray(dt), jnp.asarray(dt_old)
            )
            if self.verbose:
                print(f"Attempting to solve the equation for t = {t_try} "
                      f"with dt = {dt}", flush=True)
            escalated = (self.fallback_system is not None
                         and rejects_here >= self.escalate_after_rejects)
            solve_sys = self.fallback_system if escalated else self.system
            if escalated:
                self.n_escalated += 1
                if self.verbose:
                    print(f"Escalating precision for t = {t_try} "
                          f"(rejection-rate trigger)", flush=True)
            # predict only into the host-loop path: _step_host re-anchors
            # the rtol target for a supplied guess; the whole-step jit
            # path does not (round-2 failure mode) and gets u_old
            pred_ok = (getattr(getattr(solve_sys, "newton", None),
                               "host_loop", False)
                       and not getattr(solve_sys, "row_scaled", False))
            if self.predictor > 0.0 and pred_ok and 0.0 < dt_old < 1e29:
                # distinct object from u_old: the system layer detects a
                # supplied guess by identity and re-anchors its rtol target
                ratio = min(dt / dt_old, 2.0)
                u_guess = u_old + (self.predictor * ratio) * (u_old - u_old1)
            else:
                u_guess = u_old
            import time as _time

            if self.floor_atol > 0.0:
                # dynamic absolute target for the host-loop solver (see
                # __init__); a plain Python attribute — host-side only,
                # never traced
                solve_sys.dyn_atol = (
                    self.floor_atol * self._res_floor
                    if self._res_floor < float("inf") else 0.0)
            _t0 = _time.perf_counter()
            u_new, info = solve_sys.step(u_guess, u_old, u_old1, aux, params)
            if self.verbose:
                print(f"  newton: converged={bool(info.converged)} "
                      f"iters={int(info.iters)} "
                      f"res {float(info.res0_norm):.3e} -> "
                      f"{float(info.res_norm):.3e} "
                      f"linres={float(info.lin_relres):.2e} "
                      f"[{_time.perf_counter() - _t0:.1f}s]", flush=True)
            if (not bool(info.converged) and not escalated
                    and self.fallback_system is not None):
                if self.verbose:
                    print(f"Escalating precision for t = {t_try}", flush=True)
                u_new, info = self.fallback_system.step(
                    u_old, u_old, u_old1, aux, params)
                self.n_escalated += 1
                if self.verbose:
                    print(f"  newton(f64): converged={bool(info.converged)} "
                          f"iters={int(info.iters)} "
                          f"res {float(info.res0_norm):.3e} -> "
                          f"{float(info.res_norm):.3e} "
                          f"linres={float(info.lin_relres):.2e}", flush=True)
            if bool(info.converged):
                err = float(self._monitor_error(u_new, u_old))
                if self.verbose:
                    print(f"  step error = {err:.3e} (ttol {self.ttol:g})",
                          flush=True)
                self._log_error(err, dt_old, dt)
                if err < self.ttol:
                    # accepted: controller proposes the next dt
                    atol_exit = int(info.iters) == 0
                    if self.floor_atol > 0.0 and not atol_exit:
                        # Update the floor ONLY from a genuine Newton
                        # reduction. An atol exit has res_norm == res0
                        # (nothing was solved); feeding it back would
                        # ratchet the floor x C per step — measured
                        # runaway: floor 2.9e16 -> 7.4e18 in ~60 steps,
                        # after which a FROZEN state extrapolated to
                        # T_final with 1e-17 step errors while its true
                        # residual grew monotonically off the manifold
                        # (runs/bagheri14_T/nohup_r5d.log autopsy). The
                        # ttol metric cannot see manifold drift, so the
                        # floor must anchor to solved states only.
                        rn = float(info.res_norm)
                        if (rn > 0 and rn == rn
                                and rn < float(info.res0_norm)):
                            self._res_floor = rn
                    stall = bool(getattr(info, "stall_accepted", False))
                    if stall:
                        self.n_stall_accepted += 1
                    if self.newton_log is not None:
                        with open(self.newton_log, "a") as f:
                            f.write(f"{state.n_accepted + 1} "
                                    f"{'stall' if stall else 'conv'} "
                                    f"{int(info.iters)} "
                                    f"{float(info.res0_norm):.6e} "
                                    f"{float(info.res_norm):.6e} "
                                    f"{dt:.6e}\n")
                    if self.post_accept is not None:
                        u_new = self.post_accept(u_new)
                    max_error = [err, state.max_error[0], state.max_error[1]]
                    new_dt = self.controller(
                        dt, max_error, self.ttol, self.dt_min, self.dt_max,
                        dt_old=dt_old,
                    )
                    if self.floor_atol > 0.0 and atol_exit:
                        # an extrapolation-only step says nothing about
                        # solvability at a LARGER dt; growing dt on it
                        # compounds the extrapolation distance (same
                        # runaway autopsy: dt walked to dt_max while no
                        # equation was being solved)
                        new_dt = min(new_dt, dt)
                    if self.fail_dt_cap > 0.0 and self._dt_cap < float("inf"):
                        new_dt = min(new_dt, self._dt_cap)
                        self._dt_cap *= self.fail_cap_recovery
                        if self._dt_cap >= self.dt_max:
                            self._dt_cap = float("inf")  # fully relaxed
                    return TimeState(
                        u=u_new, u_old=u_old, u_old1=u_old1,
                        t=t_try, dt=new_dt, dt_old=dt,
                        max_error=max_error,
                        n_accepted=state.n_accepted + 1,
                        n_rejected=n_rejected,
                    )
                dt = dt * 0.5 * self.ttol / err
                n_rejected += 1
                rejects_here += 1
            else:
                if self.floor_atol > 0.0:
                    # A FAILED solve that still cut ||F|| by >= 2x is a
                    # fresh floor MEASUREMENT (noise cannot be halved, so
                    # this cannot ratchet on pure-noise states): in the
                    # densifying sheath the achievable floor rises faster
                    # than accepted-step anchoring tracks it, and a stale
                    # low anchor creates a dead zone where Newton cannot
                    # reduce (noise) yet atol cannot accept. Re-anchor to
                    # what the solve actually achieved; the refreshed
                    # dyn_atol applies to the retry within this advance.
                    rn, r0 = float(info.res_norm), float(info.res0_norm)
                    if (rn == rn and rn > 0 and int(info.iters) > 0
                            and rn <= 0.5 * r0):
                        self._res_floor = rn
                if self.fail_dt_cap > 0.0:
                    self._dt_cap = min(self._dt_cap, self.fail_dt_cap * dt)
                dt = dt * 0.5
                n_rejected += 1
                rejects_here += 1
            if dt < self.dt_min:
                self._die(state, n_rejected,
                          "Minimum time-step size reached, program is "
                          "terminating.")
        self._die(state, n_rejected,
                  f"adaptive driver: no accepted step after "
                  f"{self.max_retries} retries")
