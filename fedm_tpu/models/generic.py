"""Generic N-species coupled plasma model (LMEA) — the framework's core
promise, matching the reference's: discretised equations GENERATED from a
parsed species list, not hand-written per species.

The reference's glow script builds its weak forms in a loop over the
parsed species (`examples/glow_discharge/fedm-gd.py:344-385`): per species
a flux (`Flux`, `fedm/functions.py:219-237`) chosen by `equation_type[i]`
and `grad_diff[i]`, a balance equation
(`weak_form_balance_equation_log_representation`), per-boundary
`Boundary_flux('flux source', ...)` terms, plus one electron-energy
equation (5/3-scaled electron transport) and one Poisson equation. This
class is the array-native counterpart: the same loop, emitting jitted
kernel contributions instead of UFL forms, for an ARBITRARY parsed
chemistry tree (`speclist.cfg` + `reacscheme.cfg` + per-species property/
LUT files) — the "tens of species" configurations of BASELINE.json run
through exactly this path.

State per node (LMEA, the reference's `modify_approximation_vars`
convention — `fedm/functions.py:15-45`):

  u[:, 0]            = ln w_e    electron energy density (log)
  u[:, i]            = ln n_i    species i = 1 .. n_species-1
                                 (species 0 is the background gas, held at
                                 N0 like the reference's Source_term,
                                 `fedm/functions.py:833-835`)
  u[:, n_eq-1]       = Phi       Poisson

Per-species metadata (equation type, particle type for boundary
conditions, species type for secondary emission, initial densities,
reflection coefficients) is configuration, exactly as in the reference
script (`fedm-gd.py:58-61`); when not given it is derived from the parsed
properties (charge sign, species name).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import elementary_charge, epsilon_0, kB, me, pi
from ..fem import CellBatch, FacetBatch, FunctionSpace
from ..fem.assembly import project
from ..fem.dirichlet import BCSet, DirichletBC
from ..mesh import mark_boundaries, rectangle_mesh
from ..model.forms import Max, balance_equation_contrib
from ..model.qfield import QField
from ..model.system import CoupledSystem, StepParams
from ..chemistry import (
    RateCoefficients,
    TransportCoefficients,
    rate_coefficient_file_names,
    reaction_matrices,
    read_energy_loss,
    read_particle_properties,
    read_speclist,
)
from ..chemistry.sources import energy_source_factors, reaction_rates
from ..solvers.elliptic import solve_poisson
from ..solvers.newton import NewtonConfig
from ..timestepping import AdaptiveDriver, TimeState

Array = jax.Array


@dataclass
class PlasmaConfig:
    """Configuration of a generic LMEA plasma model. The per-species
    tuples mirror the reference script's hand-declared lists
    (`fedm-gd.py:58-61`); leave them None to derive sensible defaults
    from the parsed chemistry (charge sign + species name)."""

    model: str = "argon_synth"
    file_input: Optional[Path] = None  # defaults to io.files.file_input
    Tgas: float = 300.0
    p0: float = 1.0                    # [Torr]
    U_w: float = -250.0                # powered-electrode voltage [V]
    gap_length: float = 0.01           # [m] (z extent)
    wall: float = 0.01                 # [m] (r extent)
    nx: int = 100
    ny: int = 100
    n_ic_species: float = 1e12         # default initial density [m^-3]
    mean_energy_init: float = 3.0      # [eV]
    we_metallic: float = 5.0           # mean secondary-electron energy [eV]
    gamma_metallic: float = 0.06
    # per-species reflection coefficients at the metallic electrodes
    # (`fedm-gd.py:137`); None -> 0.3 everywhere except 5e-4 for ions
    ref_metallic: Optional[tuple] = None
    semi_implicit: bool = True
    dt_init: float = 1e-13
    dt_min: float = 1e-15
    dt_max: float = 1e-8
    ttol: float = 5e-4                 # test variant uses 2e-3
    T_final: float = 5e-5
    quad_degree: int = 4
    project_lumped: bool = False
    mg_levels: int = 4    # Poisson-block multigrid (<=1 disables)
    dtype: object = None  # None -> f64; jnp.float32 for the TPU-fast path
    newton: NewtonConfig = None
    # -- per-species metadata (None -> derived; see _derive_species_meta) --
    # 'reaction' | 'diffusion-reaction' | 'drift-diffusion-reaction'
    equation_types: Optional[tuple] = None
    # 'Heavy' | 'electrons'  (boundary-condition dispatch)
    particle_types: Optional[tuple] = None
    # 'Neutral' | 'Ion' | 'electrons'  (secondary-emission source)
    species_types: Optional[tuple] = None
    # initial number densities [m^-3] per species (gas entry ignored: N0)
    n_ic: Optional[tuple] = None

    def __post_init__(self):
        if self.newton is None:
            if self.dtype == jnp.float32:
                # rtol 5e-3: 1e-3 sits below the f32 assembly noise floor
                # once dt grows past ~5e-11 on the 4_particles chemistry
                # (measured on TPU: 38 precision escalations per 100 steps
                # vs 0 at 5e-3); the adaptive ttol error control still
                # guards the physical accuracy of every accepted step
                self.newton = NewtonConfig(rtol=5e-3, max_iter=20,
                                           linear_tol=1e-4,
                                           linear_maxiter=600)
            else:
                self.newton = NewtonConfig(rtol=1e-4, max_iter=20,
                                           linear_tol=1e-6,
                                           linear_maxiter=1500)

    @property
    def N0(self) -> float:
        return self.p0 * 3.21877e22


class PlasmaModel:
    """LMEA coupled model generated from a parsed chemistry tree: energy +
    one balance equation per non-gas species + Poisson, solved
    monolithically (`fedm-gd.py:344-413`)."""

    def __init__(self, cfg: PlasmaConfig = None):
        self.cfg = cfg = cfg or PlasmaConfig()
        if cfg.file_input is None:
            from ..io.files import files

            cfg.file_input = files.file_input
        path = Path(cfg.file_input) / cfg.model

        # -- chemistry front-end (`fedm-gd.py:55-89`) -----------------------
        (self.n_species, self.species, prop_files,
         tc_names) = read_speclist(path)
        self.masses, self.signs = read_particle_properties(
            prop_files, cfg.model, file_input=cfg.file_input)
        self.P_mat, self.L_mat, self.G_mat = reaction_matrices(
            path, self.species)
        k_files = rate_coefficient_file_names(path)
        self.u_loss = read_energy_loss(path)
        self.rate = RateCoefficients.read(k_files)
        self.mob = TransportCoefficients.read(
            tc_names, "mobility", cfg.model, file_input=cfg.file_input)
        self.dif = TransportCoefficients.read(
            tc_names, "Diffusion", cfg.model, file_input=cfg.file_input)
        # derivative tables for the semi-implicit treatment: every
        # Umean-dependent coefficient gets one, exactly the reference's
        # `semi_implicit_coefficients` dispatch (`fedm-gd.py:85-89,317-323`)
        self.rate_diff = [
            c.table_gradient() if c.dependence == "Umean" else None
            for c in self.rate]
        self.mob_diff = [
            c.table_gradient() if c.dependence == "Umean" else None
            for c in self.mob]
        self.dif_diff = [
            c.table_gradient() if c.dependence == "Umean" else None
            for c in self.dif]

        self._derive_species_meta()
        ns = self.n_species
        self.ie = ns - 1                # electron species index
        self.n_eq = ns + 1              # LMEA: energy + species[1:] + Phi

        # heavy-particle thermal velocities (`fedm-gd.py:218-223`)
        self.vth_heavy = [0.0] * ns
        for i in range(1, ns - 1):
            self.vth_heavy[i] = float(
                np.sqrt(8.0 * kB * cfg.Tgas / (pi * self.masses[i])))

        # -- mesh / space (`fedm-gd.py:157-183`) ----------------------------
        mesh = rectangle_mesh((0, 0), (cfg.wall, cfg.gap_length),
                              cfg.nx, cfg.ny, "crossed")
        mark_boundaries(mesh, [
            ["line", 0.0, 0.0, 0.0, cfg.wall],                       # 1 z=0
            ["line", cfg.gap_length, cfg.gap_length, 0.0, cfg.wall],  # 2
            ["line", 0.0, cfg.gap_length, 0.0, 0.0],                 # 3 axis
            ["line", 0.0, cfg.gap_length, cfg.wall, cfg.wall],       # 4 wall
        ])
        self.mesh = mesh
        self.space = FunctionSpace(mesh, 1)
        self.batch = CellBatch(self.space, quad_degree=cfg.quad_degree,
                               axisymmetric=True, dtype=cfg.dtype)

        powered = self.space.dofs_where(lambda x: np.isclose(x[:, 1], 0.0))
        grounded = self.space.dofs_where(
            lambda x: np.isclose(x[:, 1], cfg.gap_length))
        U0 = cfg.U_w
        phi_ramp = lambda t: U0 * (1.0 - jnp.exp(-t / 1e-9))
        bcs = BCSet(self.space, self.n_eq, [
            DirichletBC(powered, self.n_eq - 1, phi_ramp),
            DirichletBC(grounded, self.n_eq - 1, 0.0),
        ])

        self.system = CoupledSystem(self.batch, self.n_eq, bcs, cfg.newton)
        self.system.set_cell_kernel(self._cell_kernel)
        # only the metallic electrodes (markers 1, 2) carry non-zero flux
        # terms: ref=1 on axis/wall zeroes everything (`fedm-gd.py:144-148`)
        fb = FacetBatch(self.space, markers=[1, 2],
                        quad_degree=cfg.quad_degree, axisymmetric=True,
                        dtype=cfg.dtype)
        self.system.add_facet_kernel(fb, self._electrode_kernel)

        if cfg.mg_levels > 1:
            from ..solvers.multigrid import GeometricMultigrid

            spaces = [self.space]
            nx, ny = cfg.nx, cfg.ny
            for _ in range(cfg.mg_levels - 1):
                if nx // 2 < 4 or ny // 2 < 4:
                    break
                nx //= 2
                ny //= 2
                cmesh = rectangle_mesh((0, 0), (cfg.wall, cfg.gap_length),
                                       nx, ny, "crossed")
                spaces.append(FunctionSpace(cmesh, 1))
            masks = []
            for sp in spaces:
                c = sp.dof_coords
                masks.append(np.isclose(c[:, 1], 0.0)
                             | np.isclose(c[:, 1], cfg.gap_length))
            mg = None if len(spaces) < 2 else GeometricMultigrid(
                spaces, masks, axisymmetric=True,
                quad_degree=2, dtype=cfg.dtype)
            if mg is not None:
                self.system.enable_elliptic_precond(self.n_eq - 1, mg=mg)

        self._update_aux_jit = jax.jit(self._update_aux)
        self._dist = None

    # -- per-species metadata -----------------------------------------------

    def _derive_species_meta(self):
        """Fill the per-species metadata lists, preferring configured
        values. Defaults (when the config leaves a list None): gas ->
        'reaction'/'Heavy'/'Neutral'; charged heavy -> drift-diffusion
        'Ion'; neutral non-gas -> diffusion-reaction 'Neutral'; the last
        species is the electrons (the speclist convention the reference's
        scripts rely on)."""
        cfg, ns = self.cfg, self.n_species
        eq, pt, st = [], [], []
        for i in range(ns):
            is_e = i == ns - 1
            charged = self.signs[i] != 0
            if i == 0:
                eq.append("reaction")
                pt.append("Heavy")
                st.append("Neutral")
            elif is_e:
                eq.append("drift-diffusion-reaction")
                pt.append("electrons")
                st.append("electrons")
            elif charged:
                eq.append("drift-diffusion-reaction")
                pt.append("Heavy")
                st.append("Ion")
            else:
                eq.append("diffusion-reaction")
                pt.append("Heavy")
                st.append("Neutral")
        self.equation_types = list(cfg.equation_types or eq)
        self.particle_types = list(cfg.particle_types or pt)
        self.species_types = list(cfg.species_types or st)
        # grad inside the diffusion term for electrons only
        # (`fedm-gd.py:63`: grad_diff = [pst == 'electrons' ...])
        self.grad_diffusion = [t == "electrons" for t in self.species_types]
        if cfg.ref_metallic is not None:
            self.ref_coeffs = list(cfg.ref_metallic)
        else:
            self.ref_coeffs = [
                5e-4 if self.species_types[i] == "Ion" else 0.3
                for i in range(ns)]
        self.n_ic = list(cfg.n_ic or [cfg.n_ic_species] * ns)
        for name, lst in (("equation_types", self.equation_types),
                          ("particle_types", self.particle_types),
                          ("species_types", self.species_types),
                          ("ref_metallic", self.ref_coeffs),
                          ("n_ic", self.n_ic)):
            if len(lst) != ns:
                raise ValueError(
                    f"{name} has {len(lst)} entries for {ns} species")

    # -- multi-chip ----------------------------------------------------------

    def distribute(self, device_mesh, axis: str = "space"):
        """Swap the system for a DOF-partitioned `DistributedSystem`
        (fedm_tpu.parallel.dd). The once-per-accepted-step coefficient
        interpolation gathers the state back to the original numbering
        (small vs the halo-exchanged inner loops); states and aux fields
        then live in the distributed layout."""
        from ..parallel.dd import DistributedSystem

        self._dist = DistributedSystem(self.system, device_mesh, axis)
        self.system = self._dist

        base_update = self._update_aux

        def update_dist(u_dist):
            u = self._dist.gather_global(u_dist)
            return self._dist.scatter_aux(base_update(u))

        self._update_aux = update_dist
        self._update_aux_jit = jax.jit(update_dist)
        return self._dist

    # -- per-step coefficient update (`fedm-gd.py:429-443`) -----------------

    def _update_aux(self, u: Array) -> Dict[str, Array]:
        cfg, ns, ie = self.cfg, self.n_species, self.ie
        we, u_el, phi = u[:, 0], u[:, ie], u[:, self.n_eq - 1]
        eps_old = jnp.exp(we - u_el)  # mean energy from last accepted step
        phi = phi.astype(self.batch.dtype)
        gphi = self.batch.grad(self.batch.gather(phi))
        Em_q = jnp.sqrt(jnp.sum(gphi * gphi, axis=-1))
        redE = project(Em_q * (1e21 / cfg.N0), self.batch,
                       lumped=cfg.project_lumped)

        kw = dict(N0=cfg.N0, Tgas=cfg.Tgas, energy=eps_old, redfield=redE,
                  like=eps_old)
        mu = [c.evaluate(**kw) for c in self.mob]
        # diffusion may need the mobility (ESR), pass per-species mu
        D = [c.evaluate(mu=mu[i], **kw) for i, c in enumerate(self.dif)]
        k = [c.evaluate(**kw) for c in self.rate]
        zeros = jnp.zeros_like(eps_old)
        k_diff = [
            (c.evaluate(**kw) if c is not None else zeros)
            for c in self.rate_diff]
        mu_diff = [
            (c.evaluate(**kw) if c is not None else zeros)
            for c in self.mob_diff]
        D_diff = [
            (c.evaluate(**kw) if c is not None else zeros)
            for c in self.dif_diff]
        return {"mean_energy_old": eps_old, "redE": redE,
                "k": jnp.stack(k, axis=-1),
                "k_diff": jnp.stack(k_diff, axis=-1),
                "mu": jnp.stack(mu, axis=-1),
                "D": jnp.stack(D, axis=-1),
                "mu_diff": jnp.stack(mu_diff, axis=-1),
                "D_diff": jnp.stack(D_diff, axis=-1)}

    # -- shared kernel pieces ----------------------------------------------

    def _fields(self, b, delta_e, ctx):
        """Quadrature-point fields shared by the cell and facet kernels:
        per-species log-densities, semi-implicit transport coefficients
        and fluxes — the loop body of `fedm-gd.py:347-354`."""
        cfg, ns, ie = self.cfg, self.n_species, self.ie
        u_e = ctx["u_old"] + delta_e  # absolute state (increment form)
        w = QField.from_nodal(b, u_e[..., 0])
        uQ = [None] + [QField.from_nodal(b, u_e[..., i])
                       for i in range(1, ns)]
        E_q = -b.grad(u_e[..., self.n_eq - 1])

        eps_old = QField.from_nodal(b, ctx["mean_energy_old"])
        ne_old = QField.from_nodal(b, ctx["u_old"][..., ie]).exp()
        # eps_lin: mean-energy linearisation (`fedm-gd.py:215`)
        eps_lin = eps_old + (w.exp() - uQ[ie].exp() * eps_old) / ne_old
        d_eps = eps_lin - eps_old

        # per-species semi-implicit transport coefficients: QFields for
        # grad-inside-D species (the flux needs grad(D n)), plain QP values
        # otherwise (`Flux`'s grad_diffusion dispatch)
        mu_si, D_si, Gamma = [None], [None], [None]
        for i in range(1, ns):
            if cfg.semi_implicit and self.mob_diff[i] is not None:
                mu_i = (QField.from_nodal(b, ctx["mu"][..., i])
                        + QField.from_nodal(b, ctx["mu_diff"][..., i])
                        * d_eps)
            else:
                mu_i = QField.from_nodal(b, ctx["mu"][..., i])
            if cfg.semi_implicit and self.dif_diff[i] is not None:
                D_i = (QField.from_nodal(b, ctx["D"][..., i])
                       + QField.from_nodal(b, ctx["D_diff"][..., i])
                       * d_eps)
            else:
                D_i = QField.from_nodal(b, ctx["D"][..., i])
            mu_si.append(mu_i)
            D_si.append(D_i)
            if self.equation_types[i] != "drift-diffusion-reaction":
                Gamma.append(None)
                continue
            n_i = uQ[i].exp()
            drift = (self.signs[i] * mu_i.val[..., None] * E_q
                     * n_i.val[..., None])
            if self.grad_diffusion[i]:
                # -grad(D n): the electron convention (`fedm-gd.py:63`)
                Gamma.append(-(D_i * n_i).grad + drift)
            else:
                # -D grad(n): heavy species (`fedm/functions.py:230-237`)
                Gamma.append(-D_i.val[..., None] * n_i.grad + drift)

        # electron energy flux with 5/3-scaled coefficients
        # (`fedm-gd.py:354`)
        Pen = D_si[ie] * (5.0 / 3.0) * w.exp()
        Gamma_en = (-Pen.grad
                    + self.signs[ie] * (5.0 / 3.0) * mu_si[ie].val[..., None]
                    * E_q * w.exp().val[..., None])

        return dict(w=w, uQ=uQ, E_q=E_q, eps_old=eps_old, eps_lin=eps_lin,
                    d_eps=d_eps, mu_si=mu_si, D_si=D_si, Gamma=Gamma,
                    Gamma_en=Gamma_en)

    def _rates_and_sources(self, b, F, ctx):
        """Reaction rates with semi-implicit k, species + energy sources
        (`Source_term`/`Energy_Source_term`, `fedm/functions.py:777-900`)."""
        cfg, ns, ie = self.cfg, self.n_species, self.ie
        k_e = b.value(ctx["k"])        # [*, n_q, n_r]
        kd_e = b.value(ctx["k_diff"])
        if cfg.semi_implicit:
            k_si = k_e + kd_e * F["d_eps"].val[..., None]
        else:
            k_si = k_e
        # [N0, exp(u[1:-1])]: gas held at N0 (`fedm/functions.py:833-835`)
        lnN0 = jnp.log(cfg.N0)
        ln_n = jnp.stack(
            [jnp.full_like(F["w"].val, lnN0)]
            + [F["uQ"][i].val for i in range(1, ns)], axis=-1)
        rates = reaction_rates(k_si, self.P_mat, ln_n)
        GL = jnp.asarray(self.G_mat - self.L_mat, rates.dtype)
        f_sp = rates @ GL  # [*, n_q, n_species]
        factors = energy_source_factors(self.u_loss, F["eps_lin"].val)
        f_en = -jnp.sum(rates * factors, axis=-1)
        # Joule heating -Gamma_e . E (`fedm-gd.py:359`)
        f_en = f_en - jnp.sum(F["Gamma"][ie] * F["E_q"], axis=-1)
        return f_sp, f_en

    # -- cell kernel --------------------------------------------------------

    def _cell_kernel(self, cb: CellBatch, delta_e: Array, ctx) -> Array:
        p: StepParams = ctx["params"]
        ns, ie = self.n_species, self.ie
        F = self._fields(cb, delta_e, ctx)
        f_sp, f_en = self._rates_and_sources(cb, F, ctx)
        uo, dh = ctx["u_old"], ctx["d_hist"]

        # energy equation in slot 0 (LMEA; `fedm-gd.py:377`)
        contribs = [balance_equation_contrib(
            cb, "drift-diffusion-reaction", delta_e[..., 0], uo[..., 0],
            dh[..., 0], p.dt, p.dt_old, f_en, Gamma_q=F["Gamma_en"])]
        # one balance equation per non-gas species (`fedm-gd.py:362-364`)
        for i in range(1, ns):
            eq = self.equation_types[i]
            kw = {}
            if eq == "drift-diffusion-reaction":
                kw["Gamma_q"] = F["Gamma"][i]
            elif eq == "diffusion-reaction":
                kw["D_e"] = ctx["D"][..., i]
            contribs.append(balance_equation_contrib(
                cb, eq, delta_e[..., i], uo[..., i], dh[..., i],
                p.dt, p.dt_old, f_sp[..., i], **kw))

        # Poisson: stiffness(grad Phi) - mass(rho/eps0) with
        # rho = sum_i sign_i e n_i (`fedm-gd.py:255-257`)
        rho_q = 0.0
        for i in range(1, ns):
            if self.signs[i]:
                rho_q = rho_q + self.signs[i] * F["uQ"][i].exp().val
        rho_q = rho_q * (elementary_charge / epsilon_0)
        contribs.append(
            cb.stiffness(cb.grad(uo[..., self.n_eq - 1]
                                 + delta_e[..., self.n_eq - 1]))
            - cb.mass(rho_q))

        return jnp.stack(contribs, axis=-1)

    # -- electrode boundary kernel ------------------------------------------

    def _electrode_kernel(self, fb: FacetBatch, delta_e: Array, ctx) -> Array:
        """'flux source' terms on the metallic electrodes, looped over the
        species list (`fedm-gd.py:366-374`, `fedm/functions.py:514-522`)."""
        cfg, ns, ie = self.cfg, self.n_species, self.ie
        F = self._fields(fb, delta_e, ctx)
        n = fb.normal
        En = jnp.einsum("fqd,fd->fq", F["E_q"], n)

        # secondary-emission source: positive part of the summed ion
        # outflux (`fedm-gd.py:350-352`)
        Ion_flux = 0.0
        for i in range(1, ns):
            if self.species_types[i] == "Ion" and F["Gamma"][i] is not None:
                Gin = jnp.einsum("fqd,fd->fq", F["Gamma"][i], n)
                Ion_flux = Ion_flux + Max(Gin, 0.0)

        gamma = cfg.gamma_metallic
        fr = [(1.0 - r) / (1.0 + r) for r in self.ref_coeffs]

        # electron thermal velocity from the last accepted mean energy
        # (`fedm-gd.py:224`)
        vth_e = jnp.sqrt(16.0 * elementary_charge * F["eps_old"].val
                         / (3.0 * pi * me))

        # energy equation: 5/3-scaled mobility, 1.3333 vth, secondary
        # electrons carry we_metallic each (`fedm-gd.py:379-382`)
        drift_en = jnp.abs(self.signs[ie] * (5.0 / 3.0)
                           * F["mu_si"][ie].val * En)
        contribs = [fb.mass(
            fr[ie] * (0.5 * 1.3333 * vth_e + drift_en) * F["w"].exp().val
            - 2.0 * gamma * cfg.we_metallic * Ion_flux
            / (1.0 + self.ref_coeffs[ie]))]
        zero = jnp.zeros_like(contribs[0])

        for i in range(1, ns):
            eq = self.equation_types[i]
            if eq == "reaction":
                contribs.append(zero)
                continue
            n_val = F["uQ"][i].exp().val
            if eq == "diffusion-reaction":
                # Heavy thermal outflux: fr * 0.5 vth e^u
                contribs.append(
                    fb.mass(fr[i] * 0.5 * self.vth_heavy[i] * n_val))
                continue
            # drift-diffusion-reaction
            drift = jnp.abs(self.signs[i] * F["mu_si"][i].val * En)
            if self.particle_types[i] == "electrons":
                contribs.append(fb.mass(
                    fr[i] * (0.5 * vth_e + drift) * n_val
                    - 2.0 * gamma * Ion_flux / (1.0 + self.ref_coeffs[i])))
            else:
                contribs.append(fb.mass(
                    fr[i] * (0.5 * self.vth_heavy[i] + drift) * n_val))

        contribs.append(zero)  # Poisson: Dirichlet only
        return jnp.stack(contribs, axis=-1)

    # -- initial state ------------------------------------------------------

    def initial_state(self) -> TimeState:
        cfg, ns, ie = self.cfg, self.n_species, self.ie
        n_dofs = self.space.n_dofs
        u = np.zeros((n_dofs, self.n_eq))
        for i in range(1, ns):
            u[:, i] = np.log(self.n_ic[i])
        # w_e = eps * n_e (`fedm-gd.py:258`)
        u[:, 0] = np.log(cfg.mean_energy_init) + np.log(self.n_ic[ie])
        u = jnp.asarray(u)

        # initial Poisson (`fedm-gd.py:288-300`): at t=0 the ramped voltage
        # and the net charge are both zero, but solve generally with
        # rho = sum_i sign_i e n_i over ALL species (`fedm-gd.py:255`)
        rho_q = 0.0
        for i in range(1, ns):
            if self.signs[i]:
                rho_q = rho_q + self.signs[i] * jnp.exp(
                    self.batch.value(self.batch.gather(u[:, i])))
        rho_q = rho_q * (elementary_charge / epsilon_0)
        if not isinstance(rho_q, jax.Array):
            rho_q = jnp.zeros(self.batch.scale.shape, self.batch.dtype)
        coords = self.space.dof_coords
        mask = np.isclose(coords[:, 1], 0.0) | np.isclose(
            coords[:, 1], cfg.gap_length)
        g = np.zeros(n_dofs)  # U0*(1-exp(0)) = 0 at both electrodes
        phi, _, _ = solve_poisson(self.batch, rho_q, jnp.asarray(mask),
                                  jnp.asarray(g), tol=1e-12)
        u = u.at[:, self.n_eq - 1].set(phi)
        if self._dist is not None:
            u = self._dist.to_dist(u)
        # u_old1 = 0 exactly as the reference initialises (`fedm-gd.py:251`);
        # irrelevant numerically since the first step runs as BDF1
        return TimeState(u=u, u_old=u, u_old1=jnp.zeros_like(u), t=0.0,
                         dt=cfg.dt_init, dt_old=1e30)

    # -- run ----------------------------------------------------------------

    def make_driver(self, error_log=None, verbose=False,
                    **kw) -> AdaptiveDriver:
        return AdaptiveDriver(
            self.system, monitor_idx=0, ttol=self.cfg.ttol,
            dt_min=self.cfg.dt_min, dt_max=self.cfg.dt_max,
            error_log=error_log, verbose=verbose, **kw)

    def run(self, T_final: Optional[float] = None, error_log=None,
            verbose: bool = False, max_steps: int = 100000) -> TimeState:
        T = T_final if T_final is not None else self.cfg.T_final
        driver = self.make_driver(error_log, verbose)
        state = self.initial_state()
        while state.t < T and state.n_accepted < max_steps:
            aux = self._update_aux_jit(state.u)
            state = driver.advance(state, aux)
        return state
