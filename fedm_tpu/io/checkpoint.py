"""Simulation checkpoint/resume.

A capability the reference lacks entirely (SURVEY.md section 5: XDMF
checkpoints are written but never read back; no restart exists). The full
restart state is exactly what `TimeState` carries: (u, u_old, u_old1, t,
dt, dt_old, error history, step counters).

Writes are ATOMIC (write-to-temp + rename) so a kill mid-write — routine
on the tunneled-TPU deployment — can never leave a truncated npz behind,
and optional `meta` entries (e.g. the moving-window mesh corridor the
state lives on) travel INSIDE the same file, so checkpoint and mesh
metadata can never be observed inconsistent (round-2 advisor finding:
the split checkpoint.npz/window.json pair could desync on a kill between
the two writes and silently resume fields onto a wrongly-positioned
mesh).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from ..timestepping.driver import TimeState

_META_PREFIX = "meta_"


def save_checkpoint(path, state: TimeState, meta: dict = None) -> None:
    """`meta`: optional {name: scalar/array} entries stored alongside the
    state (e.g. {'z_corridor': (z0, z1, dz)} for moving-window runs)."""
    path = Path(path)
    extra = {}
    for k, v in (meta or {}).items():
        extra[_META_PREFIX + k] = np.asarray(v)
    tmp = path.with_name(path.name + ".tmp")
    np.savez(
        tmp,
        u=np.asarray(state.u),
        u_old=np.asarray(state.u_old),
        u_old1=np.asarray(state.u_old1),
        t=state.t, dt=state.dt, dt_old=state.dt_old,
        max_error=np.asarray(state.max_error),
        n_accepted=state.n_accepted, n_rejected=state.n_rejected,
        **extra,
    )
    # np.savez appends .npz to names without it
    written = tmp if tmp.exists() else tmp.with_name(tmp.name + ".npz")
    os.replace(written, path)


def load_checkpoint(path, with_meta: bool = False):
    """Returns the TimeState, or (TimeState, meta_dict) with
    `with_meta=True` (meta is {} for checkpoints written without it)."""
    z = np.load(Path(path))
    state = TimeState(
        u=jnp.asarray(z["u"]),
        u_old=jnp.asarray(z["u_old"]),
        u_old1=jnp.asarray(z["u_old1"]),
        t=float(z["t"]), dt=float(z["dt"]), dt_old=float(z["dt_old"]),
        max_error=list(np.asarray(z["max_error"])),
        n_accepted=int(z["n_accepted"]), n_rejected=int(z["n_rejected"]),
    )
    if not with_meta:
        return state
    meta = {k[len(_META_PREFIX):]: np.asarray(z[k])
            for k in z.files if k.startswith(_META_PREFIX)}
    return state, meta
