"""Weak-form building blocks for the plasma balance equations.

Array-native re-expression of the reference's UFL form emitters:

- variable-step BDF2 time term with ratio weighting and the `dt_old -> inf`
  BDF1 degradation (`/root/reference/fedm/functions.py:349-368`),
- drift-diffusion flux with log representation and the
  gradient-inside-vs-outside-D variants (`fedm/functions.py:219-237`),
- Poisson term (`fedm/functions.py:379-401`).

All functions take a `CellBatch` plus *gathered* element values
`[n_cells, n_local(, k)]` and return either quadrature-point fields or
test-function contributions `[n_cells, n_local]`, so they compose freely
inside system kernels and differentiate under `jax.jvp`/`jax.jacfwd`.

Sign convention matches the reference residual: for a balance equation
F = time_derivative - flux_term - source with
flux_term = ∫ Γ·∇v (drift-diffusion) or ∫ -∇(D n)·∇v (diffusion).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..fem.assembly import CellBatch

Array = jax.Array


def bdf2_history_part(u_q, u_old_q, u_old1_q, dt, dt_old):
    """The ratio-weighted BDF2 combination
    (u*(1+2r) - (1+r)^2 u_old + r^2 u_old1)/(1+r) with r = dt/dt_old
    (`fedm/functions.py:349-357`). With dt_old >> dt this degrades to the
    BDF1 difference u - u_old, which is how the reference bootstraps
    (`fedm-tof_1d.py:65`)."""
    tr = dt / dt_old
    trp1 = 1.0 + tr
    tr2p1 = 1.0 + 2.0 * tr
    return (u_q * tr2p1 - trp1 * trp1 * u_old_q + tr * tr * u_old1_q) / trp1


def drift_diffusion_flux(
    batch: CellBatch,
    u_e: Array,
    D_e: Array,
    mu_e: Array,
    E_q: Array,
    sign: float,
    grad_diffusion: bool = True,
    log_representation: bool = True,
):
    """Particle flux Γ at quadrature points [n_cells, n_q, dim]
    (`fedm/functions.py:219-237`):

      Γ = -∇(D n) + sign·μ·E·n   (grad_diffusion=True)
      Γ = -D ∇n  + sign·μ·E·n    (grad_diffusion=False)

    with n = exp(u) when log_representation. D_e, mu_e are gathered nodal
    coefficient values; E_q the electric field at quadrature points.
    """
    u_q = batch.value(u_e)
    D_q = batch.value(D_e)
    mu_q = batch.value(mu_e)
    gu_q = batch.grad(u_e)  # [n_cells, n_q, dim]
    if log_representation:
        n_q = jnp.exp(u_q)
        gn_q = n_q[..., None] * gu_q  # ∇e^u = e^u ∇u
    else:
        n_q = u_q
        gn_q = gu_q
    if grad_diffusion:
        gD_q = batch.grad(D_e)
        diffusion = -(gD_q * n_q[..., None] + D_q[..., None] * gn_q)
    else:
        diffusion = -D_q[..., None] * gn_q
    drift = sign * mu_q[..., None] * E_q * n_q[..., None]
    return diffusion + drift


def bdf2_increment_part(delta_q, d_hist_q, dt, dt_old):
    """The BDF2 combination expressed in increments: with delta = u - u_old
    and d_hist = u_old - u_old1, the ratio-weighted form rewrites EXACTLY as
    ((1+2r) delta - r^2 d_hist)/(1+r) — the coefficients of
    `bdf2_history_part` sum to zero. Differences are formed in the state's
    storage precision before entering f32 kernels (see
    fedm_tpu.model.system docstring)."""
    tr = dt / dt_old
    trp1 = 1.0 + tr
    tr2p1 = 1.0 + 2.0 * tr
    return (delta_q * tr2p1 - tr * tr * d_hist_q) / trp1


def balance_equation_contrib(
    batch: CellBatch,
    equation_type: str,
    delta_e: Array,
    u_old_e: Array,
    d_hist_e: Array,
    dt,
    dt_old,
    f_q: Array,
    Gamma_q: Optional[Array] = None,
    D_e: Optional[Array] = None,
    log_representation: bool = True,
):
    """Residual contribution [n_cells, n_local] of one balance equation
    (`fedm/functions.py:240-368`): time term minus flux term minus source,
    in the increment formulation (delta_e = gathered u - u_old,
    d_hist_e = gathered u_old - u_old1).

    equation_type: 'reaction' | 'diffusion-reaction' |
    'drift-diffusion-reaction'. For diffusion-reaction the flux -∇(D n) is
    built here from D_e; for drift-diffusion-reaction pass Gamma_q (built
    with `drift_diffusion_flux` from u_old_e + delta_e).
    """
    u_q = batch.value(u_old_e) + batch.value(delta_e)
    u_part = bdf2_increment_part(
        batch.value(delta_e), batch.value(d_hist_e), dt, dt_old
    )
    weight = jnp.exp(u_q) if log_representation else 1.0
    contrib = batch.mass(weight * u_part / dt)

    if equation_type == "diffusion-reaction":
        if D_e is None:
            raise ValueError("diffusion-reaction requires D_e")
        u_e = u_old_e + delta_e
        n_q = jnp.exp(u_q) if log_representation else u_q
        gu_q = batch.grad(u_e)
        gn_q = n_q[..., None] * gu_q if log_representation else gu_q
        gD_q = batch.grad(D_e)
        D_q = batch.value(D_e)
        Gamma_q = -(gD_q * n_q[..., None] + D_q[..., None] * gn_q)
        contrib = contrib - batch.stiffness(Gamma_q)
    elif equation_type == "drift-diffusion-reaction":
        if Gamma_q is None:
            raise ValueError("drift-diffusion-reaction requires Gamma_q")
        contrib = contrib - batch.stiffness(Gamma_q)
    elif equation_type != "reaction":
        raise ValueError(
            f"equation type '{equation_type}' not recognised; options are "
            "'reaction', 'diffusion-reaction', 'drift-diffusion-reaction'"
        )

    return contrib - batch.mass(f_q)


def poisson_contrib(batch: CellBatch, phi_e: Array, f_q: Array):
    """Poisson residual contribution ∫ ∇Φ·∇v - ∫ f v
    (`fedm/functions.py:379-401`)."""
    return batch.stiffness(batch.grad(phi_e)) - batch.mass(f_q)


def Max(a, b):
    """Branch-free maximum, (a + b + |a - b|)/2 — the smooth form the
    reference uses inside UFL expressions (`fedm/functions.py:205-209`),
    e.g. the positive ion outflux for secondary emission."""
    return (a + b + jnp.abs(a - b)) / 2.0


def Min(a, b):
    """Branch-free minimum, (a + b - |a - b|)/2 (`fedm/functions.py:212-216`)."""
    return (a + b - jnp.abs(a - b)) / 2.0


def boundary_flux(
    fb,
    bc_type: str,
    equation_type: str,
    particle_type: str,
    sign: float,
    mu_q: Array,
    En_q: Array,
    u_q: Array,
    gamma: float,
    r_coeff: float = 1.0,
    vth=0.0,
    Ion_flux=0.0,
):
    """Generic boundary-condition surface term, the reference's
    `Boundary_flux` dispatch (`/root/reference/fedm/functions.py:404-528`).

    Returns the integrand at facet quadrature points (multiply into
    `fb.mass(...)` for the test-function contribution) or 0.0 when the
    combination contributes nothing ('zero flux', or Neumann with a
    non-drift equation — exactly the reference's fall-through).

    Arguments are quadrature-point fields on the facet batch: mu_q the
    (possibly semi-implicit) mobility, En_q = E·n the normal field
    component, u_q the log-density, vth the thermal velocity (scalar or
    field), Ion_flux the positive ion outflux for secondary emission.
    """
    bc_types = ("zero flux", "flux source", "Neumann")
    if "_" in bc_type:
        bc_type = bc_type.replace("_", " ")
    if bc_type not in bc_types:
        raise ValueError(
            f"boundary condition type '{bc_type}' not recognised; must be "
            f"one of {bc_types}")
    equation_types = ("reaction", "diffusion-reaction",
                      "drift-diffusion-reaction")
    if bc_type != "zero flux" and equation_type not in equation_types:
        raise ValueError(
            f"equation type '{equation_type}' not recognised; must be one "
            f"of {equation_types}")

    if bc_type == "flux source" and equation_type != "reaction":
        if (equation_type == "diffusion-reaction"
                and particle_type not in ("Heavy", "electrons")):
            raise ValueError(
                f"particle type '{particle_type}' not recognised; must be "
                "'Heavy' or 'electrons'")
        result = (1.0 - r_coeff) / (1.0 + r_coeff)
        if equation_type == "diffusion-reaction":
            result = result * 0.5 * vth * jnp.exp(u_q)
        if equation_type == "drift-diffusion-reaction":
            result = result * (0.5 * vth
                               + jnp.abs(sign * mu_q * En_q)) * jnp.exp(u_q)
            if particle_type == "electrons":
                result = result - 2.0 * gamma * Ion_flux / (1.0 + r_coeff)
        return result
    if bc_type == "Neumann" and equation_type == "drift-diffusion-reaction":
        return sign * mu_q * En_q * jnp.exp(u_q)
    return 0.0
