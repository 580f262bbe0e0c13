"""Checkpoint-based status line for a running glow march.

The march's console telemetry goes through the supervisor's stdout; when
that stream is unavailable (detached relaunch), this reads the latest
``checkpoint.npz`` (written every ``--checkpoint-every`` accepted steps)
plus the ``relative_error.log`` tail and prints the same one-line summary
``tools/glow_run.py`` would have reported — without touching the TPU.

Usage: python tools/glow_status.py [runs/glow50]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np


def status_line(out: Path) -> str:
    z = np.load(out / "checkpoint.npz")
    u = z["u"]
    t, dt = float(z["t"]), float(z["dt"])
    na, nr = int(z["n_accepted"]), int(z["n_rejected"])
    # glow state layout (models/glow.py:26-30): [ln w_e, ln Ar*, ln Ar+,
    # ln n_e, Phi] — same columns tools/glow_run.py's report uses.
    ne_max = float(np.exp(u[:, 3]).max())
    with np.errstate(over="ignore"):
        eps = np.exp(u[:, 0] - u[:, 3])  # mean energy = exp(we - ue) [eV]
    phi = u[:, -1]
    err_log = out / "relative_error.log"
    n_rows = sum(1 for _ in err_log.open()) if err_log.exists() else 0
    age = time.time() - (out / "checkpoint.npz").stat().st_mtime
    return (
        f"t={t:.4e} dt={dt:.3e} steps={na} rej={nr} "
        f"ne_max={ne_max:.3e} eps=[{eps.min():.2f},{eps.max():.2f}] "
        f"phi=[{phi.min():.1f},{phi.max():.1f}] "
        f"err_rows={n_rows} ckpt_age={age:.0f}s"
    )


if __name__ == "__main__":
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("runs/glow50")
    print(status_line(out))
