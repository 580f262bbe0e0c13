"""Chebyshev polynomial preconditioning for the elliptic (Poisson) block.

The coupled Jacobian's species/time/chemistry coupling is captured well by
the node-block Jacobi preconditioner, but the Poisson block has no dt term
— it is a pure Laplacian whose condition number grows like (L/h)^2 and
dominates the outer Krylov iteration count (measured: replacing the Phi
component of the preconditioner by an exact Laplacian solve cut BiCGStab
from 27 to 6 iterations on the streamer). A fixed-degree Chebyshev
polynomial in the Jacobi-scaled Laplacian approximates that solve with
`degree` cheap stiffness matvecs, no sequential dependencies, and no
autodiff — the TPU substitute for the reference's hypre AMG option
(`examples/glow_discharge/fedm-gd.py:413`, SURVEY.md 2.3).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array


def power_iteration_lmax(matvec: Callable, n: int, iters: int = 50,
                         seed: int = 0) -> float:
    """Largest eigenvalue estimate of a (scaled) SPD operator."""
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(n))
    mv = jax.jit(matvec)
    lam = 1.0
    for _ in range(iters):
        y = mv(x)
        lam = float(jnp.linalg.norm(y))
        x = y / lam
    return lam


def chebyshev_solver(matvec: Callable, lmin: float, lmax: float,
                     degree: int) -> Callable:
    """z ~= A^-1 r via the Chebyshev iteration targeting the spectrum
    [lmin, lmax] (standard smoother recurrence, unrolled `degree` times).
    `matvec` must be the (Jacobi-scaled) operator the spectrum refers to.
    """
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta

    def solve(r: Array) -> Array:
        d = r / theta
        z = d
        rho_old = 1.0 / sigma1
        for _ in range(degree - 1):
            rho = 1.0 / (2.0 * sigma1 - rho_old)
            d = rho * rho_old * d + (2.0 * rho / delta) * (r - matvec(z))
            z = z + d
            rho_old = rho
        return z

    return solve
