"""Time-of-flight verification models (method of exact solutions).

Re-creations of the reference's ToF workloads:
- 1D electron swarm, P2 elements, planar (`examples/time_of_flight_1D/
  fedm-tof_1d.py`): drift-diffusion-reaction in log form, fixed dt,
  BDF1 bootstrap then BDF2;
- 2D axisymmetric swarm, P1 (`examples/time_of_flight/fedm-tof.py`,
  test config `tests/integrated_tests/time_of_flight/fedm_tof.py:63-95`).

An analytic solution for the drifting/diffusing/ionising Gaussian exists,

  n(z, t) = exp(-((z - x0 - w t)/l)^2 / s(t) + alpha w t) / sqrt(s(t)),
  s(t) = 1 + 4 D t / l^2,

so the relative L2 error vs this solution is the verification gate
(reference pinned value 0.128997... for the 2D test configuration,
`tests/integrated_tests/time_of_flight/20220707_results/relative error.log`).
The source term is f = alpha*w*n(z,t) evaluated analytically, as in the
reference (`fedm-tof_1d.py:116`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..fem import CellBatch, FunctionSpace
from ..fem.dirichlet import BCSet
from ..mesh import interval_mesh, rectangle_mesh
from ..model.forms import balance_equation_contrib, drift_diffusion_flux
from ..model.system import CoupledSystem, StepParams
from ..solvers.newton import NewtonConfig

Array = jax.Array


@dataclass
class TofConfig:
    wez: float = 1.7e5       # drift velocity z-component [m/s]
    De: float = 0.12         # diffusion coefficient [m^2/s]
    alpha: float = 5009.51   # effective ionisation coefficient [1/m]
    x0: float = 3e-4         # initial Gaussian centre [m]
    l: float = 4e-5          # Gaussian width [m]
    dt: float = 1e-11
    t0: float = 0.0
    T_final: float = 3e-9
    # Density floor for the initial state (relative to the Gaussian peak).
    # The reference floors its Newton initial guess with +DOLFIN_EPS
    # (`fedm-tof_1d.py:121`) but hands the raw analytic tail (down to
    # exp(-306)) to MUMPS; an iterative TPU solver needs the state itself
    # floored — the tail sits ~8 orders below the peak and contributes
    # O(n_floor) to the relative L2 error, far under the verification gate.
    n_floor: float = 1e-8
    newton: NewtonConfig = field(default_factory=lambda: NewtonConfig(
        rtol=1e-10, max_iter=50, linear_tol=1e-10, linear_maxiter=2000))


class _TofBase:
    """Shared machinery; subclasses provide the mesh/space and the
    z-coordinate axis index."""

    axisymmetric: bool
    z_axis: int  # which coordinate is the drift direction

    def __init__(self, cfg: TofConfig, space: FunctionSpace, quad_degree: int,
                 err_quad_degree: int = None):
        self.cfg = cfg
        self.space = space
        self.batch = CellBatch(space, quad_degree=quad_degree,
                               axisymmetric=self.axisymmetric)
        bcs = BCSet(space, 1, [])
        self.system = CoupledSystem(self.batch, 1, bcs, cfg.newton)
        self.system.set_cell_kernel(self._cell_kernel)
        # cartesian-measure batch for the reference-compatible error norm
        # (dolfin errornorm integrates plain dx, no 2*pi*r weight).
        # `err_quad_degree` is SEPARATE from the assembly degree because the
        # reference's error METRIC has its own quadrature: the
        # `project(exp(u), V)` right-hand sides in `fedm_tof.py:165-166`
        # are integrated at legacy FFC's auto-estimated degree for
        # exp(P1)*v — degree 4 — so matching the pinned number means
        # matching that measurement procedure (tools/tof2d_decomp.py:
        # converged q>=6 assembly + q4 error projection reproduces the
        # pinned 0.128997 to +0.035%, vs +0.66% at q4 assembly).
        eq = quad_degree if err_quad_degree is None else err_quad_degree
        self._err_batch = (CellBatch(space, quad_degree=eq,
                                     axisymmetric=False)
                           if (self.axisymmetric or eq != quad_degree)
                           else self.batch)

    # analytic solution (subclasses override; points [..., dim]) ------------

    def u_analytic(self, points, t):
        raise NotImplementedError

    def n_analytic(self, points, t):
        return jnp.exp(self.u_analytic(points, t))

    # kernel ---------------------------------------------------------------

    def _cell_kernel(self, cb: CellBatch, delta_e: Array, ctx) -> Array:
        c = self.cfg
        p: StepParams = ctx["params"]
        u1 = ctx["u_old"][..., 0] + delta_e[..., 0]
        ones = jnp.ones(u1.shape[:2], u1.dtype)
        D_e = c.De * ones
        mu_e = ones
        # drift term sign*mu*E := w e_z (reference builds Gamma directly with
        # the drift velocity, fedm-tof_1d.py:115)
        w_vec = jnp.zeros((1, 1, cb.x_q.shape[-1]), u1.dtype)
        w_vec = w_vec.at[..., self.z_axis].set(c.wez)
        E_q = jnp.broadcast_to(w_vec, cb.x_q.shape)
        Gamma_q = drift_diffusion_flux(cb, u1, D_e, mu_e, E_q, sign=1.0,
                                       grad_diffusion=True)
        f_q = c.alpha * c.wez * self.n_analytic(cb.x_q, p.t)
        contrib = balance_equation_contrib(
            cb, "drift-diffusion-reaction", delta_e[..., 0],
            ctx["u_old"][..., 0], ctx["d_hist"][..., 0],
            p.dt, p.dt_old, f_q, Gamma_q=Gamma_q,
        )
        return contrib[..., None]

    # error metric ---------------------------------------------------------

    def relative_l2_error(self, u: Array, t: float) -> float:
        """errornorm(n_num, n_exact, 'l2')/norm(n_exact, 'l2') as the
        reference computes it (`fedm_tof.py:165-167`): exp(u) and the
        analytic solution are L2-projected onto the space first and the
        norms use the plain (cartesian) dx measure."""
        from ..fem.assembly import project

        eb = self._err_batch
        n_num_q = jnp.exp(eb.value(eb.gather(u[:, 0])))
        n_ex_q = self.n_analytic(eb.x_q, t)
        n_num = project(n_num_q, eb)
        n_ex = project(n_ex_q, eb)
        d_q = eb.value(eb.gather(n_num - n_ex))
        e_q = eb.value(eb.gather(n_ex))
        num = eb.integrate(d_q**2)
        den = eb.integrate(e_q**2)
        return float(jnp.sqrt(num / den))

    # time loop ------------------------------------------------------------

    def initial_state(self):
        pts = jnp.asarray(self.space.dof_coords)
        u0 = self.u_analytic(pts, self.cfg.t0)[:, None]
        # floor relative to the current peak (see n_floor docstring)
        return jnp.maximum(u0, u0.max() + jnp.log(self.cfg.n_floor))

    def run(self, output_times: Optional[List[float]] = None,
            ) -> Tuple[Array, List[Tuple[float, float]]]:
        """Fixed-dt run (the reference ToF loop, `fedm-tof_1d.py:141-173`):
        BDF1 first step (dt_old huge), BDF2 afterwards. Returns the final
        state and [(t, rel_l2_error)] at output times."""
        c = self.cfg
        u = self.initial_state()
        u_old = u
        u_old1 = u
        t = c.t0
        dt_old = 1e30
        errors = []
        out_times = list(output_times or [c.T_final])
        next_out = 0
        n_steps = int(round((c.T_final - c.t0) / c.dt))
        for k in range(n_steps):
            u_old1, u_old = u_old, u
            t = t + c.dt
            params = StepParams(jnp.asarray(t), jnp.asarray(c.dt),
                                jnp.asarray(dt_old))
            u, info = self.system.step(u_old, u_old, u_old1, {}, params)
            if not bool(info.converged):
                raise RuntimeError(
                    f"ToF Newton failed at t={t}: |F|={float(info.res_norm)}")
            if next_out < len(out_times) and (
                    abs(t - out_times[next_out]) <= 0.51 * c.dt):
                errors.append((t, self.relative_l2_error(u, t)))
                next_out += 1
            dt_old = c.dt  # BDF1 -> BDF2 switch after the first step
        return u, errors


class TimeOfFlight1D(_TofBase):
    """1D planar swarm on [0, box_height], P2 elements
    (`fedm-tof_1d.py:87-98`: IntervalMesh(4000), box 1e-3 m)."""

    axisymmetric = False
    z_axis = 0

    def u_analytic(self, points, t):
        """Drifting/diffusing/ionising 1D Gaussian (`fedm-tof_1d.py:107`)."""
        c = self.cfg
        z = points[..., 0]
        s = 1.0 + 4.0 * c.De * t / c.l**2
        return (-(((z - c.x0 - c.wez * t) / c.l) ** 2) / s
                + c.alpha * c.wez * t - 0.5 * jnp.log(s))

    def __init__(self, cfg: TofConfig = None, n_cells: int = 4000,
                 box_height: float = 1e-3, degree: int = 2,
                 quad_degree: int = 6):
        cfg = cfg or TofConfig()
        mesh = interval_mesh(n_cells, 0.0, box_height)
        super().__init__(cfg, FunctionSpace(mesh, degree), quad_degree)


class TimeOfFlight2D(_TofBase):
    """2D axisymmetric swarm on [0,w]x[0,h], P1 elements; drift along x[1]=z
    (test config `tests/integrated_tests/time_of_flight/fedm_tof.py:63-95`:
    40x40 mesh on 2.5e-4 x 5e-4 m, dt=1e-12, t in [2.5e-9, 2.6e-9])."""

    axisymmetric = True
    z_axis = 1

    def u_analytic(self, points, t):
        """3D point-source Gaussian in cylindrical (r, z)
        (`tests/integrated_tests/time_of_flight/fedm_tof.py:116`)."""
        import math

        c = self.cfg
        r, z = points[..., 0], points[..., 1]
        return (-((z - c.wez * t) ** 2 + r**2) / (4.0 * c.De * t)
                + c.alpha * c.wez * t
                - 1.5 * jnp.log(4.0 * math.pi * c.De * t))

    def __init__(self, cfg: TofConfig = None, nx: int = 40, ny: int = 40,
                 box_width: float = 2.5e-4, box_height: float = 5e-4,
                 degree: int = 1, quad_degree: int = 6,
                 err_quad_degree: int = 4):
        # quad 6 = converged assembly quadrature (q6 == q8 == q12 to 15
        # digits, tools/tof2d_decomp.py); err quad 4 = the reference error
        # metric's own projection quadrature (see _TofBase.__init__) —
        # together they reproduce the reference's pinned L2 error to
        # +0.035% (the round-3 +0.66% delta decomposed: under-integrated
        # q4 assembly +0.26pp, off-metric error projection +0.37pp,
        # initial-state floor < 1e-5, BDF bootstrap length 0.011pp)
        cfg = cfg or TofConfig(t0=2.5e-9, T_final=2.6e-9, dt=1e-12)
        mesh = rectangle_mesh((0, 0), (box_width, box_height), nx, ny)
        super().__init__(cfg, FunctionSpace(mesh, degree), quad_degree,
                         err_quad_degree)
