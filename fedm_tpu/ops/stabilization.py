"""Upwind (artificial-diffusion) stabilisation for drift-dominated fronts.

The reference uses plain Galerkin everywhere and oscillates at
under-resolved ionisation fronts (docs/STREAMER_STUDY.md post-mortem: 34
e-folds of log-density between adjacent nodes, locally non-monotone).
This module provides the standard remedy as a jittable pointwise
modification of the diffusion coefficient at quadrature points:

  linear:  D <- D + c * 0.5 * |v| * h_v          (always-on smearing)
  peclet:  D <- max(D, c * 0.5 * |v| * h_v)      (vanishes when resolved:
           for cell Peclet |v| h / (2 D) <= 1/c the physical D already
           dominates and the scheme stays 2nd-order Galerkin; at Pe >> 1
           it degrades gracefully to first-order full upwinding, which is
           monotone)

`h_v` is the *directional* cell size along the drift velocity — on the
anisotropic corridor meshes the streamer needs (dz ~ um << dr), using the
max edge length would inject orders of magnitude too much cross-front
diffusion. With axis-aligned velocity v ~ E, the projected extent is
  h_v = (|E| . extents) / |E|  per quadrature point.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def directional_h(E_q: Array, E_m: Array, extents: Array) -> Array:
    """Cell size along the field direction.

    E_q [*, n_q, dim] field vectors, E_m [*, n_q] magnitudes (floored),
    extents [*, dim] per-cell bounding-box extents. Returns [*, n_q].
    """
    return jnp.einsum("cqd,cd->cq", jnp.abs(E_q), extents) / E_m


def upwind_diffusion(D_q: Array, speed_q: Array, h_v: Array,
                     mode: str = "peclet", coeff: float = 1.0) -> Array:
    """Stabilised diffusion coefficient at quadrature points.

    D_q [*, n_q] physical diffusion, speed_q [*, n_q] drift speed |v|
    (= mu*|E| for drift fluxes), h_v [*, n_q] directional cell size.
    `mode` is static: 'off' | 'linear' | 'peclet'.
    """
    if mode == "off" or coeff == 0.0:
        return D_q
    D_art = coeff * 0.5 * speed_q * h_v
    if mode == "linear":
        return D_q + D_art
    if mode == "peclet":
        return jnp.maximum(D_q, D_art)
    raise ValueError(f"unknown stabilisation mode '{mode}'")
