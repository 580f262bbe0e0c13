"""Generic N-species model builder vs brute-force construction.

The core FEDM promise is equations GENERATED from a parsed species list
(the reference builds its weak forms in a loop over species,
`examples/glow_discharge/fedm-gd.py:344-385`). This test runs the generic
builder (`fedm_tpu.models.generic.PlasmaModel`) on an 8-species extended
argon scheme (4 excited levels, atomic + molecular ions, 17 reactions —
the shape of the 'tens of species' configurations in BASELINE.json) and
checks its residual against a BRUTE-FORCE straight-line construction with
hard-coded species indices — the style round 1's `GlowDischargeModel`
hard-coded for exactly 4 species. It then steps the model with the
adaptive driver.
"""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fedm_tpu.constants import elementary_charge, epsilon_0, me, pi
from fedm_tpu.models.argon_synth import generate_argon8_input
from fedm_tpu.models.generic import PlasmaConfig, PlasmaModel
from fedm_tpu.model.forms import Max, balance_equation_contrib
from fedm_tpu.model.qfield import QField
from fedm_tpu.model.system import StepParams


@pytest.fixture(scope="module")
def model8(tmp_path_factory):
    base = tmp_path_factory.mktemp("argon8_input")
    generate_argon8_input(base)
    cfg = PlasmaConfig(model="argon_synth8", file_input=base, nx=8, ny=8,
                       mg_levels=0, quad_degree=2)
    return PlasmaModel(cfg)


def _perturbed_states(m, seed=0):
    """A deterministic (u, u_old, u_old1) triple around the initial state."""
    st = m.initial_state()
    rng = np.random.default_rng(seed)
    shape = np.asarray(st.u).shape
    du = 1e-3 * rng.standard_normal(shape)
    du1 = 1e-3 * rng.standard_normal(shape)
    u_old = st.u
    u_old1 = jnp.asarray(np.asarray(st.u) - du1)
    u = jnp.asarray(np.asarray(st.u) + du)
    return u, u_old, u_old1


class _BruteForce8:
    """Straight-line 9-equation kernel for the argon_synth8 scheme:
    species indices hard-coded (1..4 excited 'diffusion-reaction',
    5=Ar+ and 6=Ar2+ 'drift-diffusion-reaction' grad-outside-D,
    7=electrons grad-inside-D), no loops over parsed metadata."""

    def __init__(self, m: PlasmaModel):
        self.m = m

    def _common(self, b, delta_e, ctx):
        m = self.m
        cfg = m.cfg
        u_e = ctx["u_old"] + delta_e
        w = QField.from_nodal(b, u_e[..., 0])
        uq = [None] + [QField.from_nodal(b, u_e[..., i]) for i in range(1, 8)]
        E_q = -b.grad(u_e[..., 8])

        eps_old = QField.from_nodal(b, ctx["mean_energy_old"])
        ne_old = QField.from_nodal(b, ctx["u_old"][..., 7]).exp()
        eps_lin = eps_old + (w.exp() - uq[7].exp() * eps_old) / ne_old
        d_eps = eps_lin - eps_old

        # ions: plain interpolated coefficients (E/N dependence, no si)
        mu5 = QField.from_nodal(b, ctx["mu"][..., 5])
        mu6 = QField.from_nodal(b, ctx["mu"][..., 6])
        D5 = QField.from_nodal(b, ctx["D"][..., 5])
        D6 = QField.from_nodal(b, ctx["D"][..., 6])
        # electrons: semi-implicit (Umean dependence)
        mu7 = (QField.from_nodal(b, ctx["mu"][..., 7])
               + QField.from_nodal(b, ctx["mu_diff"][..., 7]) * d_eps)
        D7 = (QField.from_nodal(b, ctx["D"][..., 7])
              + QField.from_nodal(b, ctx["D_diff"][..., 7]) * d_eps)

        def ion_flux(D, mu, n):
            return (-D.val[..., None] * n.grad
                    + 1.0 * mu.val[..., None] * E_q * n.val[..., None])

        G5 = ion_flux(D5, mu5, uq[5].exp())
        G6 = ion_flux(D6, mu6, uq[6].exp())
        n7 = uq[7].exp()
        G7 = (-(D7 * n7).grad
              + (-1.0) * mu7.val[..., None] * E_q * n7.val[..., None])
        Pen = D7 * (5.0 / 3.0) * w.exp()
        Gen = (-Pen.grad + (-1.0) * (5.0 / 3.0) * mu7.val[..., None] * E_q
               * w.exp().val[..., None])

        # sources
        k_si = b.value(ctx["k"]) + b.value(ctx["k_diff"]) * d_eps.val[..., None]
        lnN0 = jnp.log(cfg.N0)
        ln_n = jnp.stack([jnp.full_like(w.val, lnN0)]
                         + [uq[i].val for i in range(1, 8)], axis=-1)
        from fedm_tpu.chemistry.sources import (energy_source_factors,
                                                reaction_rates)

        rates = reaction_rates(k_si, m.P_mat, ln_n)
        GL = jnp.asarray(m.G_mat - m.L_mat, rates.dtype)
        f_sp = rates @ GL
        factors = energy_source_factors(m.u_loss, eps_lin.val)
        f_en = -jnp.sum(rates * factors, axis=-1)
        f_en = f_en - jnp.sum(G7 * E_q, axis=-1)
        return dict(w=w, uq=uq, E_q=E_q, eps_old=eps_old, mu5=mu5, mu6=mu6,
                    mu7=mu7, G5=G5, G6=G6, G7=G7, Gen=Gen, f_sp=f_sp,
                    f_en=f_en)

    def cell(self, cb, delta_e, ctx):
        m = self.m
        p: StepParams = ctx["params"]
        F = self._common(cb, delta_e, ctx)
        uo, dh = ctx["u_old"], ctx["d_hist"]

        c0 = balance_equation_contrib(
            cb, "drift-diffusion-reaction", delta_e[..., 0], uo[..., 0],
            dh[..., 0], p.dt, p.dt_old, F["f_en"], Gamma_q=F["Gen"])
        cs = []
        for i in (1, 2, 3, 4):
            cs.append(balance_equation_contrib(
                cb, "diffusion-reaction", delta_e[..., i], uo[..., i],
                dh[..., i], p.dt, p.dt_old, F["f_sp"][..., i],
                D_e=ctx["D"][..., i]))
        c5 = balance_equation_contrib(
            cb, "drift-diffusion-reaction", delta_e[..., 5], uo[..., 5],
            dh[..., 5], p.dt, p.dt_old, F["f_sp"][..., 5], Gamma_q=F["G5"])
        c6 = balance_equation_contrib(
            cb, "drift-diffusion-reaction", delta_e[..., 6], uo[..., 6],
            dh[..., 6], p.dt, p.dt_old, F["f_sp"][..., 6], Gamma_q=F["G6"])
        c7 = balance_equation_contrib(
            cb, "drift-diffusion-reaction", delta_e[..., 7], uo[..., 7],
            dh[..., 7], p.dt, p.dt_old, F["f_sp"][..., 7], Gamma_q=F["G7"])

        rho = (1.0 * F["uq"][5].exp().val + 1.0 * F["uq"][6].exp().val
               + (-1.0) * F["uq"][7].exp().val) * (
            elementary_charge / epsilon_0)
        c8 = (cb.stiffness(cb.grad(uo[..., 8] + delta_e[..., 8]))
              - cb.mass(rho))
        return jnp.stack([c0, *cs, c5, c6, c7, c8], axis=-1)

    def facet(self, fb, delta_e, ctx):
        m = self.m
        cfg = m.cfg
        F = self._common(fb, delta_e, ctx)
        n = fb.normal
        En = jnp.einsum("fqd,fd->fq", F["E_q"], n)
        Ion_flux = (Max(jnp.einsum("fqd,fd->fq", F["G5"], n), 0.0)
                    + Max(jnp.einsum("fqd,fd->fq", F["G6"], n), 0.0))
        gamma = cfg.gamma_metallic
        ref = m.ref_coeffs
        fr = [(1.0 - r) / (1.0 + r) for r in ref]
        vth_e = jnp.sqrt(16.0 * elementary_charge * F["eps_old"].val
                         / (3.0 * pi * me))

        drift_en = jnp.abs((-1.0) * (5.0 / 3.0) * F["mu7"].val * En)
        c0 = fb.mass(fr[7] * (0.5 * 1.3333 * vth_e + drift_en)
                     * F["w"].exp().val
                     - 2.0 * gamma * cfg.we_metallic * Ion_flux
                     / (1.0 + ref[7]))
        cs = [fb.mass(fr[i] * 0.5 * m.vth_heavy[i] * F["uq"][i].exp().val)
              for i in (1, 2, 3, 4)]
        c5 = fb.mass(fr[5] * (0.5 * m.vth_heavy[5]
                              + jnp.abs(1.0 * F["mu5"].val * En))
                     * F["uq"][5].exp().val)
        c6 = fb.mass(fr[6] * (0.5 * m.vth_heavy[6]
                              + jnp.abs(1.0 * F["mu6"].val * En))
                     * F["uq"][6].exp().val)
        c7 = fb.mass(fr[7] * (0.5 * vth_e
                              + jnp.abs((-1.0) * F["mu7"].val * En))
                     * F["uq"][7].exp().val
                     - 2.0 * gamma * Ion_flux / (1.0 + ref[7]))
        zero = jnp.zeros_like(c0)
        return jnp.stack([c0, *cs, c5, c6, c7, zero], axis=-1)


def test_metadata_derivation(model8):
    m = model8
    assert m.n_species == 8 and m.n_eq == 9
    assert m.equation_types == [
        "reaction", "diffusion-reaction", "diffusion-reaction",
        "diffusion-reaction", "diffusion-reaction",
        "drift-diffusion-reaction", "drift-diffusion-reaction",
        "drift-diffusion-reaction"]
    assert m.species_types[5] == m.species_types[6] == "Ion"
    assert m.particle_types[7] == "electrons"
    assert m.ref_coeffs[5] == m.ref_coeffs[6] == 5e-4
    assert m.grad_diffusion == [False] * 7 + [True]
    assert m.P_mat.shape == (17, 8)


def test_residual_matches_brute_force(model8):
    m = model8
    u, u_old, u_old1 = _perturbed_states(m)
    aux = m._update_aux_jit(u_old)
    params = StepParams(jnp.asarray(1e-12), jnp.asarray(1e-12),
                        jnp.asarray(1e30))
    r_gen = np.asarray(m.system.residual(u, u_old, u_old1, aux, params))

    bf = _BruteForce8(m)
    kern_saved = m.system.cell_kernel
    facets_saved = list(m.system.facet_kernels)
    try:
        m.system.set_cell_kernel(bf.cell)
        m.system.facet_kernels = [(facets_saved[0][0], bf.facet)]
        m.system._step_jit = None
        r_bf = np.asarray(m.system.residual(u, u_old, u_old1, aux, params))
    finally:
        m.system.set_cell_kernel(kern_saved)
        m.system.facet_kernels = facets_saved
        m.system._step_jit = None

    assert np.isfinite(r_gen).all()
    scale = np.abs(r_bf).max(axis=0) + 1e-300
    assert np.max(np.abs(r_gen - r_bf), axis=0) / scale == pytest.approx(
        np.zeros(m.n_eq), abs=1e-12)


def test_steps_with_adaptive_driver(model8):
    m = model8
    st = m.initial_state()
    driver = m.make_driver()
    for _ in range(3):
        aux = m._update_aux_jit(st.u)
        st = driver.advance(st, aux)
    assert st.n_accepted == 3
    assert np.isfinite(np.asarray(st.u)).all()
    # densities stay positive by construction (log form); energy finite
    eps = np.exp(np.asarray(st.u[:, 0] - st.u[:, 7]))
    assert (eps > 0).all() and np.isfinite(eps).all()
