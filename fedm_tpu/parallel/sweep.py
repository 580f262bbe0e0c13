"""Batched parameter sweeps: data parallelism over independent simulations.

The reference's users run parameter sweeps as separate MPI jobs (SURVEY.md
section 2.4: "data parallelism over independent simulations — no");
on TPU the same sweep is one `vmap` over the stacked states, optionally
sharded over a device-mesh axis so each chip advances a slice of the
batch. All simulations march with their OWN adaptive dt (attempts run in
lockstep compute; acceptance/rejection is per-simulation on the host).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from ..model.system import CoupledSystem, StepParams
from ..timestepping.controllers import adaptive_timestep
from ..timestepping.driver import step_error_norm

Array = jax.Array


@dataclass
class SweepState:
    u: Array          # [B, n_dofs, n_eq]
    u_old: Array
    u_old1: Array
    t: np.ndarray     # [B]
    dt: np.ndarray
    dt_old: np.ndarray
    max_error: np.ndarray  # [B, 3]
    n_accepted: np.ndarray = None
    n_rejected: np.ndarray = None

    def __post_init__(self):
        B = len(self.t)
        if self.n_accepted is None:
            self.n_accepted = np.zeros(B, dtype=int)
        if self.n_rejected is None:
            self.n_rejected = np.zeros(B, dtype=int)


class BatchedSweep:
    """vmap-batched adaptive stepping of one CoupledSystem over B
    independent initial conditions / boundary data."""

    def __init__(self, system: CoupledSystem, monitor_idx: int, ttol: float,
                 dt_min: float, dt_max: float, controller=adaptive_timestep,
                 batch_sharding=None):
        self.system = system
        self.monitor_idx = monitor_idx
        self.ttol = ttol
        self.dt_min = dt_min
        self.dt_max = dt_max
        self.controller = controller
        self.batch_sharding = batch_sharding  # NamedSharding for axis 0
        self._vstep = jax.jit(jax.vmap(
            system._step, in_axes=(0, 0, 0, None, 0)))
        self._verr = jax.jit(jax.vmap(
            lambda a, b: step_error_norm(a[:, monitor_idx],
                                         b[:, monitor_idx])))

    def from_states(self, states: List) -> SweepState:
        """Stack single-simulation TimeStates into a SweepState."""
        stack = lambda xs: jnp.stack(xs)
        u = stack([s.u for s in states])
        if self.batch_sharding is not None:
            u = jax.device_put(u, self.batch_sharding)
        return SweepState(
            u=u,
            u_old=stack([s.u_old for s in states]),
            u_old1=stack([s.u_old1 for s in states]),
            t=np.array([s.t for s in states]),
            dt=np.array([s.dt for s in states]),
            dt_old=np.array([s.dt_old for s in states]),
            max_error=np.array([s.max_error for s in states]),
        )

    def attempt(self, st: SweepState, aux: Dict,
                active: np.ndarray = None) -> SweepState:
        """One lockstep attempted step for every simulation; per-simulation
        accept/reject with the reference's shrink rules.

        `active`: optional [B] bool — simulations marked inactive (already
        past their horizon) are frozen: their state, t, dt and counters do
        not change and they cannot raise a dt_min death. They still ride
        along in the lockstep compute (the batch is one jitted call) but
        their result is discarded.
        """
        B = len(st.t)
        if active is None:
            active = np.ones(B, dtype=bool)
        t_try = st.t + st.dt
        params = StepParams(jnp.asarray(t_try), jnp.asarray(st.dt),
                            jnp.asarray(st.dt_old))
        u_new, info = self._vstep(st.u, st.u, st.u_old1, aux, params)
        conv = np.asarray(info.converged)
        errs = np.asarray(self._verr(u_new, st.u))

        accept = conv & (errs < self.ttol) & active
        # device-side select of accepted columns
        acc_dev = jnp.asarray(accept)[:, None, None]
        u_next = jnp.where(acc_dev, u_new, st.u)
        u_old_next = jnp.where(acc_dev, st.u, st.u_old)
        u_old1_next = jnp.where(acc_dev, st.u_old, st.u_old1)

        t = np.where(accept, t_try, st.t)
        dt = st.dt.copy()
        dt_old = st.dt_old.copy()
        max_error = st.max_error.copy()
        n_accepted = st.n_accepted.copy()
        n_rejected = st.n_rejected.copy()
        for b in range(B):
            if not active[b]:
                continue
            if accept[b]:
                max_error[b] = [errs[b], st.max_error[b, 0],
                                st.max_error[b, 1]]
                dt_old[b] = st.dt[b]
                dt[b] = self.controller(st.dt[b], max_error[b], self.ttol,
                                        self.dt_min, self.dt_max,
                                        dt_old=st.dt_old[b])
                n_accepted[b] += 1
            else:
                dt[b] = (st.dt[b] * 0.5 * self.ttol / errs[b]
                         if conv[b] else st.dt[b] * 0.5)
                n_rejected[b] += 1
                if dt[b] < self.dt_min:
                    raise SystemExit(
                        "Minimum time-step size reached, program is "
                        f"terminating (simulation {b}).")
        return SweepState(u=u_next, u_old=u_old_next, u_old1=u_old1_next,
                          t=t, dt=dt, dt_old=dt_old, max_error=max_error,
                          n_accepted=n_accepted, n_rejected=n_rejected)

    def run_until(self, st: SweepState, T_final: float, aux: Dict,
                  max_attempts: int = 100000) -> SweepState:
        """Advance every simulation to T_final. Finished simulations are
        frozen (not stepped past the horizon, cannot kill the sweep via
        dt_min); each active one has its dt clamped to land on T_final."""
        k = 0
        while (st.t < T_final * (1 - 1e-12)).any() and k < max_attempts:
            active = st.t < T_final * (1 - 1e-12)
            st.dt = np.where(active, np.minimum(st.dt, T_final - st.t),
                             st.dt)
            st = self.attempt(st, aux, active=active)
            k += 1
        return st
