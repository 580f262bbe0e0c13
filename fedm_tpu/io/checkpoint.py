"""Simulation checkpoint/resume.

A capability the reference lacks entirely (SURVEY.md section 5: XDMF
checkpoints are written but never read back; no restart exists). The full
restart state is exactly what `TimeState` carries: (u, u_old, u_old1, t,
dt, dt_old, error history, step counters).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax.numpy as jnp

from ..timestepping.driver import TimeState


def save_checkpoint(path, state: TimeState) -> None:
    np.savez(
        Path(path),
        u=np.asarray(state.u),
        u_old=np.asarray(state.u_old),
        u_old1=np.asarray(state.u_old1),
        t=state.t, dt=state.dt, dt_old=state.dt_old,
        max_error=np.asarray(state.max_error),
        n_accepted=state.n_accepted, n_rejected=state.n_rejected,
    )


def load_checkpoint(path) -> TimeState:
    z = np.load(Path(path))
    return TimeState(
        u=jnp.asarray(z["u"]),
        u_old=jnp.asarray(z["u_old"]),
        u_old1=jnp.asarray(z["u_old1"]),
        t=float(z["t"]), dt=float(z["dt"]), dt_old=float(z["dt_old"]),
        max_error=list(np.asarray(z["max_error"])),
        n_accepted=int(z["n_accepted"]), n_rejected=int(z["n_rejected"]),
    )
