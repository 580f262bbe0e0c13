"""Device-resident look-up-table interpolation.

The reference interpolates transport/rate coefficient LUTs on the host with
`np.interp` over full DOF vectors every step
(`/root/reference/fedm/functions.py:621-639` — a per-step host round-trip,
SURVEY.md section 3.5). Here tables are device arrays and the lookup is
`jnp.interp` (same clamp-at-ends semantics as np.interp), fused by XLA into
whatever consumes the coefficient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def lut_interp(x: Array, xp, fp) -> Array:
    """Linear interpolation f(x) with constant extrapolation at the table
    ends (np.interp semantics)."""
    return jnp.interp(x, jnp.asarray(xp), jnp.asarray(fp))
