"""Positive streamer in air — the Bagheri et al. benchmark.

Re-creation of `examples/streamer_discharge/fedm-streamer.py` (Bagheri et
al., Plasma Sources Sci. Technol. 27 (2018) 095002): LFA, coupled system of

  u[:, 0] = ln n_ion   ('reaction' — immobile ions)
  u[:, 1] = ln n_e     ('drift-diffusion-reaction', log form)
  u[:, 2] = Phi        (Poisson)

on an axisymmetric (r, z) rectangle, U = 18.75 kV across 1.25 cm at
760 Torr. Transport/ionisation coefficients are closed-form functions of
the field magnitude E_m (`fedm-streamer.py:237-239`), compiled through the
safe expression layer and evaluated at quadrature points inside the
residual — the exact analog of the reference's symbolic UFL expressions,
including their contribution to the Newton Jacobian (via autodiff here,
via `derivative()` there).

Time stepping: adaptive BDF2, PID controller, ttol=1e-3, dt in
[1e-15, 5e-12], error monitored on the electron component (LFA -> index
n_eq-2; `fedm/functions.py:1056-1057`). First-step reference trajectory for
the shipped test config starts at ~6.77e-4 (`tests/integrated_tests/
streamer_discharge/20220707_results/relative error.log:1`).

The reference reads its mesh from an unshipped `mesh.xml`
(`fedm-streamer.py:116`); this model generates a structured rectangle mesh
(optionally graded toward the axis where the streamer runs).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import elementary_charge, epsilon_0
from ..fem import CellBatch, FacetBatch, FunctionSpace
from ..fem.dirichlet import BCSet, DirichletBC
from ..mesh import Mesh, mark_boundaries, rectangle_mesh
from ..model.forms import balance_equation_contrib
from ..model.system import CoupledSystem, StepParams
from ..ops.exprs import compile_expression
from ..solvers.elliptic import solve_poisson
from ..solvers.newton import NewtonConfig
from ..timestepping import AdaptiveDriver, TimeState

Array = jax.Array

# Bagheri et al. air coefficients, as shipped in the reference input tree
# (`tests/integrated_tests/streamer_discharge/file_input/benchmark_model/
# transport_coefficients/{e_Nb.dat,e_ND.dat,alpha.dat}` and
# `fedm-streamer.py:237-239`). N*b and N*D forms divided by N0 at build.
MU_E_EXPR = "2.3987*E_m**(-0.26)"
D_E_EXPR = "4.3628e-3*E_m**0.22"
ALPHA_EXPR = "(1.1944e6 + 4.3666e26 * E_m**(-3))*exp(-2.73e7/E_m)-340.75"


@dataclass
class StreamerConfig:
    U_w: float = 18750.0          # applied voltage [V]
    p0: float = 760.0             # pressure [Torr]
    Tgas: float = 300.0
    box_width: float = 0.0125     # [m] (r extent)
    box_height: float = 0.0125    # [m] (z extent)
    nx: int = 80
    ny: int = 160
    grade: float = 2.5            # mesh grading strength toward the axis/seed
    seed_amplitude: float = 5e18  # [m^-3]
    seed_width: float = 0.4e-3    # [m]
    seed_z: float = 1e-2          # [m]
    background: float = 1e13      # [m^-3]
    dt_init: float = 5e-12
    dt_min: float = 1e-15
    dt_max: float = 5e-12
    ttol: float = 1e-3
    T_final: float = 1.4e-8
    mu_e_expr: str = MU_E_EXPR
    D_e_expr: str = D_E_EXPR
    alpha_expr: str = ALPHA_EXPR
    quad_degree: int = 2          # reference sets quadrature_degree=2
    Em_floor: float = 1.0         # [V/m] guard for E_m^-3 style expressions
    # artificial (streamline-lite) diffusion: adds stab*0.5*mu*|E|*h to the
    # electron diffusion coefficient. 0 = plain Galerkin like the reference
    # (which oscillates at under-resolved fronts, docs/STREAMER_STUDY.md);
    # ~1 keeps the front monotone at the cost of first-order smearing.
    stab_diffusion: float = 0.0
    # upwind stabilisation (ops/stabilization.py): 'off' = plain Galerkin
    # like the reference; 'peclet' = D <- max(D, c*0.5*mu*|E|*h_E) with the
    # DIRECTIONAL cell size along E — vanishes where the front is resolved,
    # degrades to monotone first-order upwinding where it is not. This is
    # the round-2 fix for the round-1 front-oscillation deaths.
    stab_mode: str = "off"
    stab_coeff: float = 1.0
    dtype: object = None          # None -> canonical float (f64 under x64);
                                  # jnp.float32 for the TPU-fast path with
                                  # f64 Krylov reductions
    mg_levels: int = 4            # multigrid V-cycle on the Poisson block
                                  # (mesh-independent Krylov counts; ~3x
                                  # faster steps); <=1 disables
    # Poisson-block preconditioner flavour:
    #   'mg'       point-Chebyshev-smoothed V-cycle (isotropic meshes)
    #   'mg-zline' V-cycle with z-line relaxation (anisotropic corridor
    #              meshes, dz << dr — the round-1 killer; see
    #              solvers/linesmoother.py and docs/STREAMER_STUDY.md)
    #   'zline'    single-level z-line Richardson (no hierarchy)
    poisson_precond: str = "mg"
    zline_iters: int = 2          # Richardson sweeps for 'zline'
    # per-z-line tridiagonal preconditioning of the ELECTRON transport row
    # (CoupledSystem.enable_transport_zline): the node-block Jacobi
    # preconditioner captures the chemistry coupling but none of the
    # spatial advection-diffusion coupling along z, which otherwise costs
    # Krylov iterations in the stiff regime. Exact sub/super couplings
    # extracted from the element Jacobians the block build already
    # computes. Requires a canonical tensor-product mesh.
    transport_zline: bool = False
    # optional z-corridor refinement (z0, z1, dz): uniform dz inside
    # [z0, z1] (where the ionisation front runs; alpha*dz <~ 1 needed to
    # resolve it), geometric coarsening outside. ny is then derived.
    z_corridor: Optional[tuple] = None
    # FIXED-TOPOLOGY corridor tails (n_lo, n_hi): exactly n_lo geometric
    # cells below the corridor and n_hi above, with the growth ratio
    # solved per window position instead of the cell count. Every window
    # position then yields the SAME node count and cell topology — the
    # contract that makes the moving-window remesh zero-recompile
    # (CoupledSystem.enable_geom_mode + move_window): only coordinate
    # arrays change, shapes never do. Requires z_corridor with z0 > 0.
    z_tail_cells: Optional[tuple] = None
    # WALL-CLUSTERED lower tail (sheath regime): when set, the n_lo cells
    # below the corridor are built as a TWO-SIDED geometric tail — first
    # cell `z_wall_dz` at the cathode wall (z=0) growing upward, last cell
    # matching the corridor dz growing downward, meeting mid-span — instead
    # of the default one-sided tail that COARSENS toward the wall. After
    # the streamer head connects to the cathode the problem becomes a
    # collapsing sheath with sub-um gradients AT z=0 (docs/BAGHERI14_RUN.md
    # post-arrival regime); the default tail has its coarsest cells exactly
    # there. Cell COUNT is unchanged for every window position, so the
    # zero-recompile moving-window contract (z_tail_cells) still holds.
    z_wall_dz: Optional[float] = None
    # optional r-corridor refinement (r1, dr): uniform dr on [0, r1] with
    # geometric coarsening out to box_width; nx is then derived. Radial
    # resolution at the axis must track the streamer head radius
    # (~0.3-1 mm in the Bagheri case): with only ~6 graded cells across
    # the head (dr ~ 54 um at nx=96) the discrete front goes ANNULAR —
    # the density maximum detaches from the axis, radial oscillations
    # develop, the on-axis front stalls and the head field runs away
    # (measured crash autopsy at t = 1.29 ns, docs/STREAMER_STUDY.md
    # round 6). The z-resolved, r-starved mesh is the failure mode; this
    # corridor is the fix.
    r_corridor: Optional[tuple] = None
    newton: NewtonConfig = None
    # Row-equilibrated Newton system (CoupledSystem.row_scaled, true
    # assembled l1 row norms): the production setting for deep TPU runs —
    # raw log-form residual rows reach 1e24+ at a developed front and
    # overflow range-limited Krylov inner products (the t = 1.13 ns wall,
    # docs/STREAMER_STUDY.md); the equilibrated system stays O(1) at any
    # density scale.
    row_scaled: bool = False
    # Far-field density floor [m^-3]: after each ACCEPTED step, clamp the
    # electron log-density at ln(floor). The reference initialises the far
    # field at background 1e13 (`fedm-streamer.py:169-172`) and its f64
    # range lets the depleted cathode-side tail decay 15+ e-folds below it
    # with no physical consequence; on TPU that tail only doubles the
    # state's dynamic range. None disables; set to cfg.background for the
    # production run.
    density_floor: Optional[float] = None

    def __post_init__(self):
        if self.newton is None:
            import jax.numpy as jnp

            if self.dtype == jnp.float32:
                # inexact-Newton tolerances sitting above the f32 assembly
                # noise floor (~1e-4 relative); the adaptive ttol error
                # control still guards physical accuracy
                # accept_reduction: the floor is MESH-dependent (res0/800
                # at dz=2e-5, res0/224 at dz=1e-5) — accept a stalled
                # iterate that has still reduced ||F|| 30x+ rather than
                # dead-stalling on finer meshes (NewtonConfig docstring)
                # host_loop: one XLA execution per Newton iteration — the
                # tunneled-TPU deployment kills whole-step executions at
                # stiff states (solvers/newton.py module docstring)
                self.newton = NewtonConfig(rtol=1e-3, max_iter=20,
                                           linear_tol=1e-4,
                                           linear_maxiter=400,
                                           accept_reduction=3e-2,
                                           host_loop=True)
            else:
                self.newton = NewtonConfig(rtol=1e-4, max_iter=20,
                                           linear_tol=1e-6,
                                           linear_maxiter=800)

    @property
    def N0(self) -> float:
        return self.p0 * 3.21877e22


def _graded_coords(n: int, length: float, grade: float, focus: float) -> np.ndarray:
    """1D node coordinates on [0, length], geometrically refined toward
    `focus` (0 -> start, 1 -> end). grade=0 gives a uniform grid."""
    s = np.linspace(0.0, 1.0, n + 1)
    if grade <= 0:
        return s * length
    # sinh stretching: derivative cosh(grade*(s-focus)) is minimal at the
    # focus -> finest spacing there
    t = np.sinh(grade * (s - focus)) / grade
    t = (t - t[0]) / (t[-1] - t[0])
    return t * length


def _tophat_avg_row(zs: np.ndarray, a: float, b: float) -> np.ndarray:
    """Nodal weights of (1/(b-a)) * integral_a^b u(z) dz for u piecewise
    linear on the z-lines `zs` (exact trapezoid over the merged grid)."""
    a, b = max(a, zs[0]), min(b, zs[-1])
    pts = np.concatenate(([a], zs[(zs > a) & (zs < b)], [b]))
    i1 = np.clip(np.searchsorted(zs, pts), 1, len(zs) - 1)
    i0 = i1 - 1
    w = (pts - zs[i0]) / (zs[i1] - zs[i0])
    seg = np.diff(pts)
    coef = np.zeros(len(pts))
    coef[:-1] += 0.5 * seg
    coef[1:] += 0.5 * seg
    row = np.zeros(len(zs))
    np.add.at(row, i0, coef * (1.0 - w))
    np.add.at(row, i1, coef * w)
    return row / (b - a)


def _z_interp_weights(zs: np.ndarray, zd: np.ndarray) -> np.ndarray:
    """[len(zd), len(zs)] pure z-linear interpolation matrix (identity on
    matching z-planes) — `move_window`'s remap mode."""
    n_d, n_s = len(zd), len(zs)
    idx1 = np.clip(np.searchsorted(zs, zd), 1, n_s - 1)
    idx0 = idx1 - 1
    w = (zd - zs[idx0]) / (zs[idx1] - zs[idx0])
    W = np.zeros((n_d, n_s))
    W[np.arange(n_d), idx0] = 1.0 - w
    # += not =: exact node hits (w=0 or 1) must not overwrite
    np.add.at(W, (np.arange(n_d), idx1), w)
    return W


def _z_remap_weights(zs: np.ndarray, zd: np.ndarray) -> np.ndarray:
    """[len(zd), len(zs)] remap matrix: z-linear interpolation rows, except
    interior destination nodes whose local spacing exceeds 1.5x the source
    spacing there — those average the source field over a symmetric
    top-hat of the local destination spacing (anti-aliasing restriction;
    see `StreamerModel._remap_z`). Boundary nodes always interpolate
    pointwise so Dirichlet/wall values stay consistent with their BCs."""
    n_d, n_s = len(zd), len(zs)
    W = _z_interp_weights(zs, zd)
    src_gap = np.diff(zs)
    gap_at = src_gap[np.clip(np.searchsorted(zs, zd) - 1, 0, n_s - 2)]
    for j in range(1, n_d - 1):
        h_half = 0.5 * min(zd[j] - zd[j - 1], zd[j + 1] - zd[j])
        if 2.0 * h_half > 1.5 * gap_at[j]:
            W[j] = _tophat_avg_row(zs, zd[j] - h_half, zd[j] + h_half)
    return W


class StreamerModel:
    SIGN = (1.0, -1.0)  # ion, electron charge signs

    @classmethod
    def from_file_input(cls, file_input, model: str = "benchmark_model",
                        mesh: Optional[Mesh] = None, **config_overrides):
        """Build the model from a reference-format input tree
        (`speclist.cfg` + `transport_coefficients/*_{Nb,ND}.dat` with
        `fun:E` expressions + `species/*.cfg`), the path the reference
        exercises at `fedm-streamer.py:47-48,227-245`. The electron
        mobility/diffusion expressions and (optionally) an
        `alpha.dat` ionisation expression are compiled through the safe
        expression layer."""
        from pathlib import Path

        from ..chemistry import (read_speclist, read_transport_coefficients,
                                 read_particle_properties, read_single_string)
        from ..model.approximation import modify_approximation_vars

        n_sp, species, prop_files, tc_names = read_speclist(
            Path(file_input) / model)
        masses, signs = read_particle_properties(prop_files, model,
                                                 file_input=file_input)
        n_sp, n_eq, species, masses, signs = modify_approximation_vars(
            "LFA", n_sp, species, masses, signs)
        # the reference's streamer looks transport files up by species NAME
        # (`fedm-streamer.py:227-228` passes particle_species), unlike the
        # glow script which uses the property-file basenames
        _, mu_y, mu_dep = read_transport_coefficients(
            species, "mobility", model, file_input=file_input)
        _, D_y, D_dep = read_transport_coefficients(
            species, "Diffusion", model, file_input=file_input)
        kw = dict(config_overrides)
        if mu_dep[-1] == "fun:E":
            kw["mu_e_expr"] = mu_y[-1]
        if D_dep[-1] == "fun:E":
            kw["D_e_expr"] = D_y[-1]
        alpha_file = (Path(file_input) / model / "transport_coefficients"
                      / "alpha.dat")
        if alpha_file.is_file():
            kw["alpha_expr"] = read_single_string(alpha_file)
        obj = cls(StreamerConfig(**kw), mesh=mesh)
        obj.SIGN = tuple(signs)
        return obj

    @staticmethod
    def _geom_tail(span: float, dz: float, n: int) -> np.ndarray:
        """`n` cell sizes growing geometrically away from a corridor edge
        whose adjacent corridor cell is `dz`, covering exactly `span`:
        sizes dz*r^1..dz*r^n with the ratio r solved by bisection (r < 1
        when span < n*dz — tiny tails near a clamped domain edge are
        allowed). The fixed COUNT (vs the fixed ratio of `_z_coords`) is
        what keeps the moving-window topology constant."""
        assert span > 0 and n >= 1
        target = span / dz

        def ssum(r):
            return float(n) if abs(r - 1.0) < 1e-12 else r * (r**n - 1) / (r - 1)

        lo, hi = 1e-9, 1e3
        for _ in range(200):
            mid = 0.5 * (lo + hi)
            if ssum(mid) < target:
                lo = mid
            else:
                hi = mid
        r = 0.5 * (lo + hi)
        sizes = dz * r ** np.arange(1, n + 1)
        return sizes * (span / sizes.sum())  # exact closure

    @classmethod
    def _wall_tail(cls, span: float, dz: float, dz_wall: float,
                   n: int) -> np.ndarray:
        """`n` cell sizes covering exactly `span` between the wall (z=0)
        and a corridor edge whose adjacent cell is `dz`, clustered at BOTH
        ends: n1 = n//2 sizes dz_wall*g^0..g^(n1-1) growing away from the
        wall plus n2 = n-n1 sizes dz*r^1..r^n2 growing away from the
        corridor, with one shared ratio g = r solved by bisection on the
        total span. Returned wall-to-corridor ordered. Ratios < 1 (span
        smaller than the end cells can absorb) are allowed, mirroring
        `_geom_tail`."""
        assert span > 0 and n >= 2 and dz_wall > 0
        n1 = n // 2
        n2 = n - n1

        def ssum(g):
            if abs(g - 1.0) < 1e-12:
                return dz_wall * n1 + dz * n2
            return (dz_wall * (g**n1 - 1) / (g - 1)
                    + dz * g * (g**n2 - 1) / (g - 1))

        lo, hi = 1e-9, 1e3
        for _ in range(200):
            mid = 0.5 * (lo + hi)
            if ssum(mid) < span:
                lo = mid
            else:
                hi = mid
        g = 0.5 * (lo + hi)
        wall = dz_wall * g ** np.arange(n1)
        corr = dz * g ** np.arange(1, n2 + 1)
        sizes = np.concatenate([wall, corr[::-1]])
        return sizes * (span / sizes.sum())  # exact closure

    @classmethod
    def _z_coords_fixed(cls, cfg) -> np.ndarray:
        """Fixed-topology corridor z-lines: n_lo + n_fine + n_hi cells for
        EVERY window position (see `z_tail_cells`)."""
        z0, z1, dz = cfg.z_corridor
        n_lo, n_hi = cfg.z_tail_cells
        assert z0 > 0, "fixed-topology corridor needs z0 > 0 (clamp the window)"
        n_fine = int(round((z1 - z0) / dz))
        # pad the FINE count so the total divides the MG 2:1 slicing; the
        # pad depends only on the (constant) window span, not its position
        div = 2 ** max(cfg.mg_levels - 1, 0)
        n_fine += (-(n_lo + n_fine + n_hi)) % div
        z1 = z0 + n_fine * dz
        assert z1 < cfg.box_height, "padded corridor exceeds the domain"
        if cfg.z_wall_dz is not None:
            lo_sizes = cls._wall_tail(z0, dz, cfg.z_wall_dz, n_lo)
            lo = np.concatenate([[0.0], np.cumsum(lo_sizes)[:-1]])
        else:
            lo_sizes = cls._geom_tail(z0, dz, n_lo)
            lo = (z0 - np.cumsum(lo_sizes))[::-1]
            lo[0] = 0.0
        hi_sizes = cls._geom_tail(cfg.box_height - z1, dz, n_hi)
        hi = z1 + np.cumsum(hi_sizes)
        hi[-1] = cfg.box_height
        fine = z0 + dz * np.arange(n_fine + 1)
        zs = np.concatenate([lo, fine, hi])
        assert len(zs) == n_lo + n_fine + n_hi + 1
        assert np.all(np.diff(zs) > 0)
        return zs

    @staticmethod
    def _z_coords(cfg, ny=None) -> np.ndarray:
        if cfg.z_corridor is None:
            return _graded_coords(ny, cfg.box_height, cfg.grade,
                                  cfg.seed_z / cfg.box_height)
        if cfg.z_tail_cells is not None:
            return StreamerModel._z_coords_fixed(cfg)
        z0, z1, dz = cfg.z_corridor
        fine = np.arange(z0, z1 + 0.5 * dz, dz)
        n_lo = max(2, int(round(np.log(max(z0, dz) / dz) / np.log(1.12))))
        lo = np.geomspace(dz, max(z0, dz), n_lo)
        lo = z0 - np.cumsum(lo[::-1])[::-1] + dz  # grow away from corridor
        lo = lo[(lo > 0) & (lo < z0 - 0.5 * dz)]
        hi_len = cfg.box_height - z1
        n_hi = max(2, int(round(np.log(max(hi_len, dz) / dz) / np.log(1.12))))
        hi = z1 + np.cumsum(np.geomspace(dz, hi_len / 3, n_hi))
        hi = hi[hi < cfg.box_height - 0.5 * dz]
        zs = np.unique(np.concatenate(
            [[0.0], lo, fine, hi, [cfg.box_height]]))
        # pad the cell count to a multiple of 2^(mg_levels-1) by splitting
        # the largest intervals, so the multigrid hierarchy can coarsen by
        # exact 2:1 slicing (nested levels -> separable transfers)
        div = 2 ** max(cfg.mg_levels - 1, 0)
        while (len(zs) - 1) % div:
            i = int(np.argmax(np.diff(zs)))
            zs = np.insert(zs, i + 1, 0.5 * (zs[i] + zs[i + 1]))
        return zs

    @staticmethod
    def _r_coords(cfg) -> np.ndarray:
        """Radial node line for `r_corridor`: uniform dr on [0, r1],
        geometric coarsening (ratio ~1.12) out to box_width, cell count
        padded to the multigrid 2:1-slicing multiple like `_z_coords`."""
        r1, dr = cfg.r_corridor
        fine = np.arange(0.0, r1 + 0.5 * dr, dr)
        rest = cfg.box_width - fine[-1]
        n_hi = max(2, int(round(np.log(max(rest, dr) / dr) / np.log(1.12))))
        hi = fine[-1] + np.cumsum(np.geomspace(dr * 1.12, rest / 3, n_hi))
        hi = hi[hi < cfg.box_width - 0.5 * dr]
        rs = np.unique(np.concatenate([fine, hi, [cfg.box_width]]))
        div = 2 ** max(cfg.mg_levels - 1, 0)
        while (len(rs) - 1) % div:
            i = int(np.argmax(np.diff(rs)))
            rs = np.insert(rs, i + 1, 0.5 * (rs[i] + rs[i + 1]))
        return rs

    @classmethod
    def _make_mesh(cls, cfg, nx, ny=None, z_scale: int = 1) -> Mesh:
        if cfg.r_corridor is not None:
            xs = cls._r_coords(cfg)
        else:
            xs = _graded_coords(nx, cfg.box_width, cfg.grade, 0.0)
        if cfg.z_corridor is None:
            zs = cls._z_coords(cfg, ny)
        else:
            z0, z1, dz = cfg.z_corridor
            cfg2 = type(cfg)(**{**cfg.__dict__,
                                "z_corridor": (z0, z1, dz * z_scale),
                                "newton": cfg.newton})
            zs = cls._z_coords(cfg2)
        mesh = rectangle_mesh((0, 0), (cfg.box_width, cfg.box_height),
                              len(xs) - 1, len(zs) - 1)
        ux = np.unique(mesh.coords[:, 0])
        uz = np.unique(mesh.coords[:, 1])
        mesh.coords[:, 0] = np.interp(mesh.coords[:, 0], ux, xs)
        mesh.coords[:, 1] = np.interp(mesh.coords[:, 1], uz, zs)
        return Mesh(mesh.coords, mesh.cells)

    def __init__(self, cfg: StreamerConfig = None, mesh: Optional[Mesh] = None):
        self.cfg = cfg = cfg or StreamerConfig()
        if mesh is None:
            mesh = self._make_mesh(cfg, cfg.nx, cfg.ny)
        self.mesh = mesh
        # boundary list as in `fedm-streamer.py:98-101`
        mark_boundaries(mesh, [
            ["line", 0.0, 0.0, 0.0, cfg.box_width],                   # 1 z=0
            ["line", cfg.box_height, cfg.box_height, 0.0, cfg.box_width],  # 2
            ["line", 0.0, cfg.box_height, 0.0, 0.0],                  # 3 axis
            ["line", 0.0, cfg.box_height, cfg.box_width, cfg.box_width],   # 4
        ])
        self.space = FunctionSpace(mesh, 1)
        self.batch = CellBatch(self.space, quad_degree=cfg.quad_degree,
                               axisymmetric=True, dtype=cfg.dtype)
        self.n_eq = 3

        self._mu_e = compile_expression(cfg.mu_e_expr)
        self._D_e = compile_expression(cfg.D_e_expr)
        self._alpha = compile_expression(cfg.alpha_expr)

        coords = self.space.dof_coords
        cathode = self.space.dofs_where(lambda x: np.isclose(x[:, 1], 0.0))
        anode = self.space.dofs_where(
            lambda x: np.isclose(x[:, 1], cfg.box_height))
        self._phi_bcs = [
            DirichletBC(cathode, 2, 0.0),
            DirichletBC(anode, 2, cfg.U_w),
        ]
        bcs = BCSet(self.space, self.n_eq, self._phi_bcs)

        self.system = CoupledSystem(self.batch, self.n_eq, bcs, cfg.newton)
        self.system.row_scaled = cfg.row_scaled
        self.system.set_cell_kernel(self._cell_kernel)
        # Neumann electron outflow on the electrodes (markers 1 and 2,
        # `fedm-streamer.py:103-104`); axis and outer wall are zero-flux.
        fb = FacetBatch(self.space, markers=[1, 2],
                        quad_degree=cfg.quad_degree, axisymmetric=True,
                        dtype=cfg.dtype)
        self.system.add_facet_kernel(fb, self._electrode_kernel)

        if cfg.transport_zline:
            from ..solvers.stencil import canonical_node_grid

            assert canonical_node_grid(self.space) is not None, (
                "transport_zline needs a canonical tensor-product mesh")
            # electrons (eq 1); ions are reaction-only in the Bagheri
            # scheme (fedm-streamer.py:49). _node_grid is [n_r, n_z] with
            # id = iz*n_r + ir: lines along the last (z) axis, z-neighbor
            # dof stride n_r = grid.shape[0].
            self.system.enable_transport_zline(
                (1,), self._node_grid(self.space))

        self._smg = None
        if cfg.poisson_precond == "zline":
            from ..solvers.linesmoother import ZLineSmoother

            sm = ZLineSmoother(self.system.masked_stiffness_op(2),
                               self._node_grid(self.space),
                               self.space.n_dofs, n_iter=cfg.zline_iters,
                               dtype=cfg.dtype)
            self.system.enable_elliptic_precond(2, solver=sm.solve)
        elif cfg.mg_levels > 1 and self._try_structured_mg():
            pass  # StructuredPoissonMG installed (self._smg)
        elif cfg.mg_levels > 1:
            from ..solvers.multigrid import GeometricMultigrid

            spaces, masks = [self.space], []
            # coarsen by exact 2:1 slicing of the fine level's coordinate
            # lines: levels stay NESTED (zs_c = zs_f[::2]), which lets the
            # V-cycle use separable slice/pad transfers
            # (fem.interpolation.StructuredTransfer) instead of
            # gather/segment-sum ones — and the geometric quality is the
            # same as regenerating the grading at half resolution
            xs_f = np.unique(self.mesh.coords[:, 0])
            zs_f = np.unique(self.mesh.coords[:, 1])
            for lv in range(1, cfg.mg_levels):
                if (len(xs_f) - 1) % 2 or (len(zs_f) - 1) % 2:
                    break
                if (len(xs_f) - 1) // 2 < 4 or (len(zs_f) - 1) // 2 < 4:
                    break
                xs_f, zs_f = xs_f[::2], zs_f[::2]
                m = rectangle_mesh((0, 0), (cfg.box_width, cfg.box_height),
                                   len(xs_f) - 1, len(zs_f) - 1)
                ux, uz = np.unique(m.coords[:, 0]), np.unique(m.coords[:, 1])
                m.coords[:, 0] = np.interp(m.coords[:, 0], ux, xs_f)
                m.coords[:, 1] = np.interp(m.coords[:, 1], uz, zs_f)
                spaces.append(FunctionSpace(Mesh(m.coords, m.cells), 1))
            for sp in spaces:
                c = sp.dof_coords
                masks.append(np.isclose(c[:, 1], 0.0)
                             | np.isclose(c[:, 1], cfg.box_height))
            line_grids = (
                [self._node_grid(sp) for sp in spaces]
                if cfg.poisson_precond == "mg-zline" else None)
            mg = None if len(spaces) < 2 else GeometricMultigrid(
                spaces, masks, axisymmetric=True,
                quad_degree=cfg.quad_degree, dtype=cfg.dtype,
                line_grids=line_grids)
            if mg is not None:
                self.system.enable_elliptic_precond(2, mg=mg)

    def _try_structured_mg(self) -> bool:
        """Install the geometry-functional structured V-cycle
        (solvers.structured_mg.StructuredPoissonMG) when the mesh is a
        canonical tensor-product grid and the z-line flavour is requested.
        Numerically the same cycle as the GeometricMultigrid('mg-zline')
        path — assembled P1 stencils, PCR line smoothing, separable
        transfers, dense coarse inverse — but with host-side (numpy)
        stencil assembly and geometry threaded as jit arguments, the two
        properties the zero-recompile moving window needs."""
        cfg = self.cfg
        if cfg.poisson_precond != "mg-zline":
            return False
        from ..solvers.stencil import canonical_node_grid
        from ..solvers.structured_mg import StructuredPoissonMG

        if canonical_node_grid(self.space) is None:
            return False
        xs = np.unique(self.mesh.coords[:, 0])
        zs = np.unique(self.mesh.coords[:, 1])
        mask_grid = np.zeros((len(xs), len(zs)), bool)
        mask_grid[:, 0] = mask_grid[:, -1] = True  # cathode/anode z-lines
        try:
            smg = StructuredPoissonMG(xs, zs, mask_grid, cfg.mg_levels,
                                      axisymmetric=True, dtype=cfg.dtype)
        except AssertionError:
            return False
        self.system.enable_elliptic_precond(2, mg=smg)
        self._smg = smg
        return True

    # -- moving window (zero-recompile remesh) --------------------------------

    def move_window(self, new_corridor: tuple, state=None):
        """Re-center the fine z-corridor WITHOUT recompiling: rebuild all
        coordinate-derived geometry (cell/facet quadrature tables, MG
        stencil hierarchy) on the host for the new window position — same
        topology, same shapes — and swap it into the running system via
        `CoupledSystem.update_geometry`. With `enable_geom_mode` active on
        the system, the already-compiled Newton-Krylov step executes
        unchanged on the new arrays.

        Returns the remapped `state` (z-linear per-r-line interpolation,
        see `remap_state`) or None when no state was passed. The driver,
        the jitted step functions and the post-accept projection all
        survive — a window move costs ~100 ms of host work."""
        import dataclasses

        cfg = self.cfg
        assert cfg.z_tail_cells is not None, (
            "move_window requires the fixed-topology generator "
            "(StreamerConfig.z_tail_cells)")
        if self._smg is None and getattr(self.system, "_ell", None) is not None:
            raise RuntimeError(
                "move_window would keep STALE geometry: an elliptic "
                "preconditioner is installed but it is not the geometry-"
                "functional StructuredPoissonMG (its engagement needs "
                "cell counts divisible by 2**(mg_levels-1) in BOTH r and "
                "z) — Newton directions after the move would silently "
                "stop reducing the residual")
        zs_old = np.unique(self.mesh.coords[:, 1])
        xs = np.unique(self.mesh.coords[:, 0])
        new_cfg = dataclasses.replace(cfg, z_corridor=tuple(new_corridor))
        zs_new = self._z_coords(new_cfg)
        assert len(zs_new) == len(zs_old), (
            "fixed-topology contract broken: window span changed?")

        mesh = rectangle_mesh((0, 0), (cfg.box_width, cfg.box_height),
                              len(xs) - 1, len(zs_new) - 1)
        ux = np.unique(mesh.coords[:, 0])
        uz = np.unique(mesh.coords[:, 1])
        mesh.coords[:, 0] = np.interp(mesh.coords[:, 0], ux, xs)
        mesh.coords[:, 1] = np.interp(mesh.coords[:, 1], uz, zs_new)
        mesh = Mesh(mesh.coords, mesh.cells)
        mark_boundaries(mesh, [
            ["line", 0.0, 0.0, 0.0, cfg.box_width],
            ["line", cfg.box_height, cfg.box_height, 0.0, cfg.box_width],
            ["line", 0.0, cfg.box_height, 0.0, 0.0],
            ["line", 0.0, cfg.box_height, cfg.box_width, cfg.box_width],
        ])
        space = FunctionSpace(mesh, 1)
        batch = CellBatch(space, quad_degree=cfg.quad_degree,
                          axisymmetric=True, dtype=cfg.dtype)
        fb = FacetBatch(space, markers=[1, 2], quad_degree=cfg.quad_degree,
                        axisymmetric=True, dtype=cfg.dtype)
        geom = {"batches": (batch.geom(), fb.geom())}
        if self._smg is not None:
            geom["ell"] = self._smg.update_geometry(xs, zs_new)
        self.system.update_geometry(geom)

        # host-side references follow the new coordinates
        self.mesh = mesh
        self.space = space
        self.batch.space = space
        self.cfg = new_cfg

        if state is None:
            return None
        return self._remap_z(state, zs_old, zs_new, len(xs))

    @staticmethod
    def _node_grid(space) -> np.ndarray:
        """[n_r, n_z] dof-id grid of a structured 'right' rectangle mesh
        (node id = iz*n_rv + ir by construction in mesh/generators.py) —
        the line layout for z-line relaxation."""
        nxv = len(np.unique(space.mesh.coords[:, 0]))
        nzv = space.n_dofs // nxv
        assert nxv * nzv == space.n_dofs, "mesh is not tensor-product"
        ix, iz = np.meshgrid(np.arange(nxv), np.arange(nzv), indexing="ij")
        return iz * nxv + ix

    # -- coefficient fields at quadrature points ----------------------------

    def _coeffs(self, E_m: Array):
        # NOTE: despite the `N*b` headers in the shipped .dat files, the
        # reference uses these fun:E expressions directly as mu and D with
        # no /N0 (`fedm-streamer.py:237-238`) — they are the Bagheri paper's
        # closed forms for the coefficients themselves.
        mu = self._mu_e(E_m=E_m)
        D = self._D_e(E_m=E_m)
        alpha = self._alpha(E_m=E_m)
        return mu, D, alpha

    # -- kernels ------------------------------------------------------------

    def _cell_kernel(self, cb: CellBatch, delta_e: Array, ctx) -> Array:
        p: StepParams = ctx["params"]
        u_old_e, d_hist_e = ctx["u_old"], ctx["d_hist"]
        u_e = u_old_e + delta_e  # absolute state for exponentials/fields

        E_q = -cb.grad(u_e[..., 2])  # [c, q, dim]
        E_m = jnp.sqrt(jnp.sum(E_q * E_q, axis=-1) + self.cfg.Em_floor**2)
        mu_q, D_q, alpha_q = self._coeffs(E_m)

        ue_q = cb.value(u_e[..., 1])
        ne_q = jnp.exp(ue_q)
        gue_q = cb.grad(u_e[..., 1])
        if self.cfg.stab_diffusion:
            D_q = D_q + (self.cfg.stab_diffusion * 0.5
                         * mu_q * E_m * cb.h[:, None])
        if self.cfg.stab_mode != "off":
            from ..ops.stabilization import directional_h, upwind_diffusion

            h_v = directional_h(E_q, E_m, cb.h_dir)
            D_q = upwind_diffusion(D_q, mu_q * E_m, h_v,
                                   self.cfg.stab_mode, self.cfg.stab_coeff)

        # impact-ionisation source (`fedm-streamer.py:244-245`)
        f_ion = alpha_q * mu_q * E_m * ne_q
        # electron flux, grad_diffusion=False (`fedm-streamer.py:242`)
        Gamma_e = (-D_q[..., None] * ne_q[..., None] * gue_q
                   + self.SIGN[1] * mu_q[..., None] * E_q * ne_q[..., None])

        contrib_i = balance_equation_contrib(
            cb, "reaction", delta_e[..., 0], u_old_e[..., 0],
            d_hist_e[..., 0], p.dt, p.dt_old, f_ion)
        contrib_e = balance_equation_contrib(
            cb, "drift-diffusion-reaction", delta_e[..., 1], u_old_e[..., 1],
            d_hist_e[..., 1], p.dt, p.dt_old, f_ion, Gamma_q=Gamma_e)

        # Poisson: stiffness(grad Phi) - mass(rho/eps0)
        rho_q = (jnp.exp(cb.value(u_e[..., 0])) - ne_q) * (
            elementary_charge / epsilon_0)
        contrib_p = cb.stiffness(cb.grad(u_e[..., 2])) - cb.mass(rho_q)

        return jnp.stack([contrib_i, contrib_e, contrib_p], axis=-1)

    def _electrode_kernel(self, fb: FacetBatch, delta_e: Array, ctx) -> Array:
        """Neumann electron outflow: + 2 pi r (sign mu E . n) e^u v ds
        (`fedm/functions.py:523-524`)."""
        u_e = ctx["u_old"] + delta_e
        E_q = -fb.grad(u_e[..., 2])
        E_m = jnp.sqrt(jnp.sum(E_q * E_q, axis=-1) + self.cfg.Em_floor**2)
        mu_q, _, _ = self._coeffs(E_m)
        En = jnp.einsum("fqd,fd->fq", E_q, fb.normal)
        ne_q = jnp.exp(fb.value(u_e[..., 1]))
        contrib_e = fb.mass(self.SIGN[1] * mu_q * En * ne_q)
        zero = jnp.zeros_like(contrib_e)
        return jnp.stack([zero, contrib_e, zero], axis=-1)

    # -- multi-chip ----------------------------------------------------------

    def distribute(self, device_mesh, axis: str = "space"):
        """Swap the system for a DOF-partitioned `DistributedSystem` (halo
        exchange, 1/N per-device state — `fedm_tpu.parallel.dd`). Call
        before `initial_state()`; the state is then produced in the
        distributed layout."""
        from ..parallel.dd import DistributedSystem

        self.system = DistributedSystem(self.system, device_mesh, axis)
        return self.system

    # -- initial state ------------------------------------------------------

    def initial_state(self) -> TimeState:
        """Gaussian ion seed + uniform electrons (`fedm-streamer.py:169-172`)
        and the initial Poisson solve for Phi (`fedm-streamer.py:205-215`)."""
        cfg = self.cfg
        coords = self.space.dof_coords
        r, z = coords[:, 0], coords[:, 1]
        n_ion = cfg.background + cfg.seed_amplitude * np.exp(
            -(r**2 + (z - cfg.seed_z) ** 2) / cfg.seed_width**2)
        # NOTE: the time-stepping state stays float64 regardless of the
        # compute dtype — the increment formulation depends on forming
        # u - u_old and u_old - u_old1 in full precision (system docstring)
        u_ion = jnp.asarray(np.log(n_ion))
        u_el = jnp.full(self.space.n_dofs, float(np.log(cfg.background)),
                        u_ion.dtype)

        rho_q = (jnp.exp(self.batch.value(self.batch.gather(u_ion)))
                 - jnp.exp(self.batch.value(self.batch.gather(u_el)))) * (
            jnp.asarray(elementary_charge / epsilon_0, self.batch.dtype))
        mask = np.zeros(self.space.n_dofs, dtype=bool)
        g = np.zeros(self.space.n_dofs)
        cathode = np.isclose(coords[:, 1], 0.0)
        anode = np.isclose(coords[:, 1], cfg.box_height)
        mask[cathode | anode] = True
        g[anode] = cfg.U_w
        tol = 1e-12 if self.batch.dtype == jnp.float64 else 1e-6
        # reuse the system's elliptic preconditioner (MG / z-line): plain
        # Jacobi-CG exhausts maxiter on anisotropic corridor meshes, and a
        # silently-unconverged initial field kills the first Newton solve
        inner = getattr(self.system, "inner", self.system)
        precond = inner._ell[1] if inner._ell is not None else None
        phi, relres, _ = solve_poisson(self.batch, rho_q, jnp.asarray(mask),
                                       jnp.asarray(g.astype(
                                           self.batch.dtype)), tol=tol,
                                       maxiter=4000, precond=precond)
        if not float(relres) < max(tol * 100, 1e-5):
            raise RuntimeError(
                f"initial Poisson solve did not converge (relres={relres:.2e})")
        u = jnp.stack([u_ion, u_el, phi.astype(u_ion.dtype)], axis=-1)
        to_dist = getattr(self.system, "to_dist", None)
        if to_dist is not None:
            u = to_dist(u)
        return TimeState(u=u, u_old=u, u_old1=u, t=0.0,
                         dt=cfg.dt_init, dt_old=1e30)

    # -- run ----------------------------------------------------------------

    def remap_state(self, dst_model: "StreamerModel", state,
                    restrict: bool = True):
        """Interpolate a TimeState onto another StreamerModel's mesh —
        the moving-window remesh primitive (docs/STREAMER_STUDY.md round
        6): as the ionisation front crosses the gap, only a ~mm-wide
        window needs the fine dz that resolves 1/alpha at the head
        (~2.5 um at 2.4e7 V/m); re-centering a fine z-corridor on the
        front keeps the dof count CONSTANT while the resolved region
        follows the physics. Both meshes must share their radial node
        lines (same r_corridor/nx); every state column is interpolated
        1D-linearly along z per radial line. Linear interpolation of
        u = ln(n) is a geometric-mean interpolation of the density —
        exactly the P1 log-form representation both meshes use. History
        fields and controller state carry over unchanged, so the BDF2 +
        PID trajectory continues seamlessly."""
        src_c = np.asarray(self.space.dof_coords)
        dst_c = np.asarray(dst_model.space.dof_coords)
        zs = np.unique(src_c[:, 1])
        zd = np.unique(dst_c[:, 1])
        rs = np.unique(src_c[:, 0])
        rd = np.unique(dst_c[:, 0])
        assert len(rs) == len(rd) and np.allclose(rs, rd), (
            "remap_state needs identical radial node lines")
        return self._remap_z(state, zs, zd, len(rs), restrict=restrict)

    def _remap_z(self, state, zs: np.ndarray, zd: np.ndarray, n_r: int,
                 restrict: bool = False):
        """z-wise per-r-line state remap from z-lines `zs` onto `zd`
        (shared core of `remap_state` and `move_window`).

        By default every destination node interpolates z-linearly —
        identity on matching z-planes; this is `move_window`'s mode, the
        one the full 13.24 ns production trajectory was validated on.
        With ``restrict=True`` (`remap_state`, i.e. a cross-resolution
        RESUME onto a different z-line family), destination nodes that
        are locally COARSER than the source instead take the TOP-HAT
        CELL AVERAGE of the source's piecewise-linear field over a
        window of the local destination spacing — the finite-volume
        anti-aliasing restriction. Rationale (measured): point-sampling
        the dz=2.5e-6-resolved post-arrival cathode layer onto the
        dz=1e-5 corridor aliases the boundary layer and hands Newton a
        state it refuses at every dt (runs/bagheri14_tail, zero accepted
        steps; docs/BAGHERI14_RUN.md). The top-hat window is symmetric,
        so linear fields are still reproduced exactly; in the
        log-density representation the average is a geometric mean of
        densities, consistent with the P1 log form both meshes use."""
        import dataclasses

        n_eq = self.n_eq
        W = (_z_remap_weights(zs, zd) if restrict
             else _z_interp_weights(zs, zd))

        def remap(u):
            # node id = iz * n_r + ir (mesh/generators.py layout)
            U = np.asarray(u).reshape(len(zs), n_r * n_eq)
            V = W @ U
            return jnp.asarray(V.reshape(len(zd) * n_r, n_eq))

        return dataclasses.replace(
            state, u=remap(state.u), u_old=remap(state.u_old),
            u_old1=remap(state.u_old1))

    def floor_projection(self) -> Optional[Callable]:
        """Accepted-state projection for `AdaptiveDriver(post_accept=...)`:
        clamps ALL species log-densities at ln(density_floor). Jitted once;
        the clamp runs on whatever layout the state has (replicated or
        distributed — it is elementwise).

        Both species, not just the monitored electrons: the adaptive error
        control watches electrons only (LFA monitor, like the reference's
        `functions.py:1057`), so a wild single-node ION excursion can be
        silently ACCEPTED; once a log-density falls below ~-87, e^u
        underflows f32 to exactly 0 and that dof's Jacobian column is
        identically zero — a structurally singular node block that NaNs
        the preconditioner and walks dt to dt_min (measured: u_ion = -909
        at one annular-rim node, t = 1.597 ns crash autopsy,
        docs/STREAMER_STUDY.md round 6)."""
        if self.cfg.density_floor is None:
            return None
        u_floor = float(np.log(self.cfg.density_floor))
        n_sp = self.n_eq - 1  # all species columns; last column is Phi

        @jax.jit
        def clamp(u):
            return u.at[:, :n_sp].set(jnp.maximum(u[:, :n_sp], u_floor))

        return clamp

    def make_driver(self, error_log: Optional[Path] = None,
                    verbose: bool = False, **kw) -> AdaptiveDriver:
        return AdaptiveDriver(
            self.system, monitor_idx=self.n_eq - 2, ttol=self.cfg.ttol,
            dt_min=self.cfg.dt_min, dt_max=self.cfg.dt_max,
            error_log=error_log, verbose=verbose,
            post_accept=self.floor_projection(), **kw)

    def run(self, T_final: Optional[float] = None,
            error_log: Optional[Path] = None, verbose: bool = False,
            max_steps: int = 100000) -> TimeState:
        T = T_final if T_final is not None else self.cfg.T_final
        driver = self.make_driver(error_log, verbose)
        state = self.initial_state()
        # clamp each attempted step to the horizon so the run lands exactly
        # on T and terminates (an unclamped dt would orbit T forever under
        # the reference's |t-T|/T exit test, `fedm-streamer.py:304`)
        while state.t < T * (1 - 1e-12) and state.n_accepted < max_steps:
            state.dt = min(state.dt, T - state.t)
            state = driver.advance(state, {})
        return state
