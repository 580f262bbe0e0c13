"""Low-pressure argon glow discharge (LMEA) — the maximal workload.

Re-creation of `examples/glow_discharge/fedm-gd.py` (test variant
`tests/integrated_tests/glow_discharge/fedm_gd.py`): the local mean energy
approximation with a parsed reaction scheme. Coupled state per node:

  u[:, 0] = ln w_e     electron energy density (log)
  u[:, 1] = ln n_Ar*   metastables ('diffusion-reaction')
  u[:, 2] = ln n_Ar+   ions ('drift-diffusion-reaction', grad outside D)
  u[:, 3] = ln n_e     electrons ('drift-diffusion-reaction', grad(D n))
  u[:, 4] = Phi        Poisson

Feature coverage vs the reference script:
- chemistry front-end: speclist/reacscheme/species/LUT parsing, power/
  loss/gain matrices, energy losses (`fedm-gd.py:68-89`);
- LUT interpolation of mu/D/k at the previous step's mean energy and
  reduced field, on device (`fedm-gd.py:432-443`);
- semi-implicit coefficient treatment: k_si = k + dk*(eps_lin - eps_old)
  with the mean-energy linearisation eps_lin = eps_old +
  (w_e - n_e*eps_old)/n_e_old, contributing to the Jacobian through
  autodiff (`fedm-gd.py:215,317-333`, `fedm/functions.py:753-774`);
- electron energy equation with 5/3-scaled transport, sentinel energy
  losses, Joule heating -Gamma_e.E (`fedm-gd.py:353-359`);
- 'flux source' boundary conditions on the electrodes: thermal flux,
  drift flux, reflection coefficients, secondary electron emission
  gamma*max(Gamma_ion.n, 0), and the energy BC with the mean secondary
  electron energy (`fedm-gd.py:366-388`, `fedm/functions.py:514-522`);
- time-ramped cathode voltage U0*(1-exp(-t/1e-9)) (`fedm-gd.py:272`);
- adaptive BDF2 + PID, error monitored on the energy density
  (LMEA -> index 0; `fedm/functions.py:1056-1057`).
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
from ..model.forms import balance_equation_contrib
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
class GlowConfig:
    model: str = "argon_synth"
    file_input: Optional[Path] = None  # defaults to io.files.file_input
    Tgas: float = 300.0
    p0: float = 1.0                    # [Torr]
    U_w: float = -250.0                # powered-electrode voltage [V]
    gap_length: float = 0.01           # [m] (z extent)
    wall: float = 0.01                 # [m] (r extent)
    nx: int = 100
    ny: int = 100
    n_ic_species: float = 1e12         # initial density of Ar*/Ar+/e [m^-3]
    mean_energy_init: float = 3.0      # [eV]
    we_metallic: float = 5.0           # mean secondary-electron energy [eV]
    gamma_metallic: float = 0.06
    ref_metallic: tuple = (0.3, 0.3, 5e-4, 0.3)
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


class GlowDischargeModel:
    def __init__(self, cfg: GlowConfig = None):
        self.cfg = cfg = cfg or GlowConfig()
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
        # derivative tables for the semi-implicit treatment
        self.rate_diff = [
            c.table_gradient() if c.dependence == "Umean" else None
            for c in self.rate]
        ie = self.n_species - 1  # electron index in the species list
        self.mob_e_diff = (self.mob[ie].table_gradient()
                           if self.mob[ie].dependence == "Umean" else None)
        self.dif_e_diff = (self.dif[ie].table_gradient()
                           if self.dif[ie].dependence == "Umean" else None)

        self.n_eq = self.n_species + 1  # LMEA: energy + species[1:] + Phi
        # heavy-particle thermal velocities (`fedm-gd.py:218-223`)
        self.vth_heavy = [0.0] * self.n_species
        for i in range(1, self.n_species - 1):
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

        coords = self.space.dof_coords
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
        cfg = self.cfg
        we, u3, phi = u[:, 0], u[:, 3], u[:, 4]
        eps_old = jnp.exp(we - u3)  # mean energy from the last accepted step
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
        k_diff = [
            (c.evaluate(**kw) if c is not None else jnp.zeros_like(eps_old))
            for c in self.rate_diff]
        ie = self.n_species - 1
        zeros = jnp.zeros_like(eps_old)
        mu_e_diff = (self.mob_e_diff.evaluate(**kw)
                     if self.mob_e_diff is not None else zeros)
        D_e_diff = (self.dif_e_diff.evaluate(**kw)
                    if self.dif_e_diff is not None else zeros)
        aux = {"mean_energy_old": eps_old, "redE": redE,
               "mu_e_diff": mu_e_diff, "D_e_diff": D_e_diff,
               "k": jnp.stack(k, axis=-1),
               "k_diff": jnp.stack(k_diff, axis=-1),
               "mu_i": mu[ie - 1], "mu_e": mu[ie],
               "D_star": D[1], "D_i": D[ie - 1], "D_e": D[ie]}
        return aux

    # -- shared kernel pieces ----------------------------------------------

    def _fields(self, b, delta_e, ctx):
        """Common quadrature-point quantities for cell and facet kernels."""
        cfg = self.cfg
        u_e = ctx["u_old"] + delta_e  # absolute state (increment form)
        w = QField.from_nodal(b, u_e[..., 0])
        uS = QField.from_nodal(b, u_e[..., 1])
        uI = QField.from_nodal(b, u_e[..., 2])
        uE = QField.from_nodal(b, u_e[..., 3])
        E_q = -b.grad(u_e[..., 4])

        eps_old = QField.from_nodal(b, ctx["mean_energy_old"])
        ne_old = QField.from_nodal(b, ctx["u_old"][..., 3]).exp()
        # eps_lin: mean-energy linearisation (`fedm-gd.py:215`)
        eps_lin = eps_old + (w.exp() - uE.exp() * eps_old) / ne_old

        mu_e = QField.from_nodal(b, ctx["mu_e"])
        D_e = QField.from_nodal(b, ctx["D_e"])
        if cfg.semi_implicit:
            d_eps = eps_lin - eps_old
            mu_e_si = mu_e + QField.from_nodal(b, ctx["mu_e_diff"]) * d_eps
            D_e_si = D_e + QField.from_nodal(b, ctx["D_e_diff"]) * d_eps
        else:
            mu_e_si, D_e_si = mu_e, D_e

        mu_i = b.value(ctx["mu_i"])
        D_i = b.value(ctx["D_i"])

        sign_i = self.signs[self.n_species - 2]
        sign_e = self.signs[self.n_species - 1]
        nI = uI.exp()
        # ion flux: grad outside D (`fedm-gd.py:63,349`)
        Gamma_i = (-D_i[..., None] * nI.grad
                   + sign_i * mu_i[..., None] * E_q * nI.val[..., None])
        # electron flux: -grad(D_si e^u) + sign mu_si E e^u
        Pe = D_e_si * uE.exp()
        Gamma_e = (-Pe.grad
                   + sign_e * mu_e_si.val[..., None] * E_q
                   * uE.exp().val[..., None])
        # energy flux with 5/3-scaled coefficients (`fedm-gd.py:354`)
        Pen = D_e_si * (5.0 / 3.0) * w.exp()
        Gamma_en = (-Pen.grad
                    + sign_e * (5.0 / 3.0) * mu_e_si.val[..., None] * E_q
                    * w.exp().val[..., None])

        return dict(w=w, uS=uS, uI=uI, uE=uE, E_q=E_q, eps_old=eps_old,
                    eps_lin=eps_lin, mu_e_si=mu_e_si, D_e_si=D_e_si,
                    mu_i=mu_i, D_i=D_i, Gamma_i=Gamma_i, Gamma_e=Gamma_e,
                    Gamma_en=Gamma_en, sign_i=sign_i, sign_e=sign_e)

    def _rates_and_sources(self, b, F, ctx):
        """Reaction rates with semi-implicit k, species + energy sources."""
        cfg = self.cfg
        k_e = b.value(ctx["k"])        # [*, n_q, n_r]
        kd_e = b.value(ctx["k_diff"])
        if cfg.semi_implicit:
            d_eps = (F["eps_lin"] - F["eps_old"]).val
            k_si = k_e + kd_e * d_eps[..., None]
        else:
            k_si = k_e
        lnN0 = jnp.log(cfg.N0)
        ln_n = jnp.stack(
            [jnp.full_like(F["uS"].val, lnN0), F["uS"].val, F["uI"].val,
             F["uE"].val], axis=-1)
        rates = reaction_rates(k_si, self.P_mat, ln_n)
        GL = jnp.asarray(self.G_mat - self.L_mat, rates.dtype)
        f_sp = rates @ GL  # [*, n_q, n_species]
        factors = energy_source_factors(self.u_loss, F["eps_lin"].val)
        f_en = -jnp.sum(rates * factors, axis=-1)
        # Joule heating -Gamma_e . E (`fedm-gd.py:359`)
        f_en = f_en - jnp.sum(F["Gamma_e"] * F["E_q"], axis=-1)
        return f_sp, f_en

    # -- cell kernel --------------------------------------------------------

    def _cell_kernel(self, cb: CellBatch, delta_e: Array, ctx) -> Array:
        cfg = self.cfg
        p: StepParams = ctx["params"]
        F = self._fields(cb, delta_e, ctx)
        f_sp, f_en = self._rates_and_sources(cb, F, ctx)
        uo, dh = ctx["u_old"], ctx["d_hist"]

        c_en = balance_equation_contrib(
            cb, "drift-diffusion-reaction", delta_e[..., 0], uo[..., 0],
            dh[..., 0], p.dt, p.dt_old, f_en, Gamma_q=F["Gamma_en"])
        c_star = balance_equation_contrib(
            cb, "diffusion-reaction", delta_e[..., 1], uo[..., 1],
            dh[..., 1], p.dt, p.dt_old, f_sp[..., 1], D_e=ctx["D_star"])
        c_ion = balance_equation_contrib(
            cb, "drift-diffusion-reaction", delta_e[..., 2], uo[..., 2],
            dh[..., 2], p.dt, p.dt_old, f_sp[..., 2], Gamma_q=F["Gamma_i"])
        c_el = balance_equation_contrib(
            cb, "drift-diffusion-reaction", delta_e[..., 3], uo[..., 3],
            dh[..., 3], p.dt, p.dt_old, f_sp[..., 3], Gamma_q=F["Gamma_e"])

        rho_q = (F["uI"].exp().val - F["uE"].exp().val) * (
            elementary_charge / epsilon_0)
        c_phi = (cb.stiffness(cb.grad(uo[..., 4] + delta_e[..., 4]))
                 - cb.mass(rho_q))

        return jnp.stack([c_en, c_star, c_ion, c_el, c_phi], axis=-1)

    # -- electrode boundary kernel ------------------------------------------

    def _electrode_kernel(self, fb: FacetBatch, delta_e: Array, ctx) -> Array:
        """'flux source' terms on the metallic electrodes
        (`fedm/functions.py:514-522`, `fedm-gd.py:366-388`)."""
        cfg = self.cfg
        F = self._fields(fb, delta_e, ctx)
        n = fb.normal
        En = jnp.einsum("fqd,fd->fq", F["E_q"], n)

        # secondary-emission source: positive part of the ion outflux
        Gin = jnp.einsum("fqd,fd->fq", F["Gamma_i"], n)
        Ion_flux = jnp.maximum(Gin, 0.0)

        gamma = cfg.gamma_metallic
        ref = cfg.ref_metallic
        fr = [(1.0 - r) / (1.0 + r) for r in ref]

        # Ar* (Heavy, diffusion-reaction): fr * 0.5 vth e^u
        c_star = fb.mass(fr[1] * 0.5 * self.vth_heavy[1] * F["uS"].exp().val)

        # Ar+ (Heavy, drift-diffusion-reaction)
        vth_i = self.vth_heavy[self.n_species - 2]
        drift_i = jnp.abs(F["sign_i"] * F["mu_i"] * En)
        c_ion = fb.mass(
            fr[2] * (0.5 * vth_i + drift_i) * F["uI"].exp().val)

        # electrons: thermal + drift - secondary emission
        vth_e = jnp.sqrt(16.0 * elementary_charge * F["eps_old"].val
                         / (3.0 * pi * me))
        drift_e = jnp.abs(F["sign_e"] * F["mu_e_si"].val * En)
        c_el = fb.mass(
            fr[3] * (0.5 * vth_e + drift_e) * F["uE"].exp().val
            - 2.0 * gamma * Ion_flux / (1.0 + ref[3]))

        # energy: 5/3-scaled mobility, 1.3333 vth, gamma*we_metallic
        drift_en = jnp.abs(F["sign_e"] * (5.0 / 3.0) * F["mu_e_si"].val * En)
        c_en = fb.mass(
            fr[3] * (0.5 * 1.3333 * vth_e + drift_en) * F["w"].exp().val
            - 2.0 * gamma * cfg.we_metallic * Ion_flux / (1.0 + ref[3]))

        zero = jnp.zeros_like(c_star)
        return jnp.stack([c_en, c_star, c_ion, c_el, zero], axis=-1)

    # -- initial state ------------------------------------------------------

    def initial_state(self) -> TimeState:
        cfg = self.cfg
        n_dofs = self.space.n_dofs
        u = np.zeros((n_dofs, self.n_eq))
        ln_ic = np.log(cfg.n_ic_species)
        u[:, 1] = u[:, 2] = u[:, 3] = ln_ic
        u[:, 0] = np.log(cfg.mean_energy_init) + ln_ic  # w_e = eps * n_e
        u = jnp.asarray(u)

        # initial Poisson (`fedm-gd.py:288-300`): at t=0 the ramped voltage
        # and the net charge are both zero, but solve generally
        rho_q = (jnp.exp(self.batch.value(self.batch.gather(u[:, 2])))
                 - jnp.exp(self.batch.value(self.batch.gather(u[:, 3])))) * (
            elementary_charge / epsilon_0)
        coords = self.space.dof_coords
        mask = np.isclose(coords[:, 1], 0.0) | np.isclose(
            coords[:, 1], cfg.gap_length)
        g = np.zeros(n_dofs)  # U0*(1-exp(0)) = 0 at both electrodes
        phi, _, _ = solve_poisson(self.batch, rho_q, jnp.asarray(mask),
                                  jnp.asarray(g), tol=1e-12)
        u = u.at[:, 4].set(phi)
        if self._dist is not None:
            u = self._dist.to_dist(u)
        # u_old1 = 0 exactly as the reference initialises (`fedm-gd.py:251`);
        # irrelevant numerically since the first step runs as BDF1
        return TimeState(u=u, u_old=u, u_old1=jnp.zeros_like(u), t=0.0,
                         dt=cfg.dt_init, dt_old=1e30)

    # -- run ----------------------------------------------------------------

    def make_driver(self, error_log=None, verbose=False) -> AdaptiveDriver:
        return AdaptiveDriver(
            self.system, monitor_idx=0, ttol=self.cfg.ttol,
            dt_min=self.cfg.dt_min, dt_max=self.cfg.dt_max,
            error_log=error_log, verbose=verbose)

    def run(self, T_final: Optional[float] = None, error_log=None,
            verbose: bool = False, max_steps: int = 100000) -> TimeState:
        T = T_final if T_final is not None else self.cfg.T_final
        driver = self.make_driver(error_log, verbose)
        state = self.initial_state()
        while state.t < T and state.n_accepted < max_steps:
            aux = self._update_aux_jit(state.u)
            state = driver.advance(state, aux)
        return state
