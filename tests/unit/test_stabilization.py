"""Upwind stabilisation (ops/stabilization.py): the Peclet-limited
artificial diffusion must (a) keep an under-resolved advected front
monotone where plain Galerkin oscillates, (b) vanish identically where
the mesh resolves the physics, and (c) use the DIRECTIONAL cell size so
anisotropic corridor meshes are not over-smeared."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fedm_tpu.fem import CellBatch, FunctionSpace
from fedm_tpu.fem.dirichlet import BCSet, DirichletBC
from fedm_tpu.mesh import interval_mesh
from fedm_tpu.model.forms import balance_equation_contrib
from fedm_tpu.model.system import CoupledSystem, StepParams
from fedm_tpu.ops.stabilization import directional_h, upwind_diffusion
from fedm_tpu.solvers.newton import NewtonConfig


def test_upwind_diffusion_formula():
    D = jnp.asarray([[1e-3, 1e-3]])
    v = jnp.asarray([[1.0, 1.0]])
    h = jnp.asarray([[1e-1, 1e-6]])
    out = np.asarray(upwind_diffusion(D, v, h, "peclet", 1.0))
    # under-resolved cell: 0.5*v*h = 0.05 dominates; resolved: D unchanged
    np.testing.assert_allclose(out, [[0.05, 1e-3]])
    out_lin = np.asarray(upwind_diffusion(D, v, h, "linear", 1.0))
    np.testing.assert_allclose(out_lin, [[1e-3 + 0.05, 1e-3 + 5e-7]])
    np.testing.assert_allclose(
        np.asarray(upwind_diffusion(D, v, h, "off")), np.asarray(D))


def test_directional_h_anisotropic():
    # field along z on a dz << dr cell must see dz, not dr
    E_q = jnp.asarray([[[0.0, 2.0]]])  # [1 cell, 1 qp, dim]
    E_m = jnp.asarray([[2.0]])
    extents = jnp.asarray([[5e-4, 6e-6]])  # dr, dz
    h = float(directional_h(E_q, E_m, extents)[0, 0])
    assert h == pytest.approx(6e-6)
    # field along r sees dr
    E_q = jnp.asarray([[[2.0, 0.0]]])
    h = float(directional_h(E_q, E_m, extents)[0, 0])
    assert h == pytest.approx(5e-4)


class _Advect1D:
    """Single log-form advection-dominated balance equation on [0, 1]:
    du/dt + div(v n) = small diffusion, steep front IC. Cell Peclet >> 1
    so plain Galerkin oscillates."""

    def __init__(self, n_cells=64, v=1.0, D=1e-5, stab="off"):
        mesh = interval_mesh(n_cells, 0.0, 1.0)
        self.space = FunctionSpace(mesh, 1)
        self.batch = CellBatch(self.space, quad_degree=2)
        self.v, self.D, self.stab = v, D, stab
        inflow = self.space.dofs_where(lambda x: np.isclose(x[:, 0], 0.0))
        bcs = BCSet(self.space, 1, [DirichletBC(inflow, 0, 0.0)])
        self.system = CoupledSystem(
            self.batch, 1, bcs,
            NewtonConfig(rtol=1e-10, linear_tol=1e-10, linear_maxiter=400))
        self.system.set_cell_kernel(self._kernel)

    def _kernel(self, cb, delta_e, ctx):
        p = ctx["params"]
        u_e = ctx["u_old"] + delta_e
        ne = jnp.exp(cb.value(u_e[..., 0]))
        gu = cb.grad(u_e[..., 0])
        E_q = jnp.full_like(gu, self.v)  # constant drift field
        E_m = jnp.full(E_q.shape[:2], abs(self.v), cb.dtype)
        D_q = jnp.full_like(E_m, self.D)
        if self.stab != "off":
            h_v = directional_h(E_q, E_m, cb.h_dir)
            D_q = upwind_diffusion(D_q, E_m, h_v, self.stab)
        Gamma = -D_q[..., None] * ne[..., None] * gu + E_q * ne[..., None]
        c = balance_equation_contrib(
            cb, "drift-diffusion-reaction", delta_e[..., 0],
            ctx["u_old"][..., 0], ctx["d_hist"][..., 0], p.dt, p.dt_old,
            jnp.zeros_like(E_m), Gamma_q=Gamma)
        return c[..., None]

    def run(self, steps=20, dt=1e-3, width=3.0, require_converged=True):
        x = self.space.dof_coords[:, 0]
        # steep front at x=0.3 (tanh over ~3 cells: ~1.5 e-folds/cell,
        # the steepest profile the log-P1 representation can transport)
        h = 1.0 / 64
        u0 = jnp.asarray(
            -4.5 * (1.0 + np.tanh((x - 0.3) / (width * h))))[:, None]
        u, u_old = u0, u0
        dt_old = 1e30
        n_conv = 0
        for _ in range(steps):
            params = StepParams(jnp.asarray(0.0), jnp.asarray(dt),
                                jnp.asarray(dt_old))
            u_new, info = self.system.step(u, u, u_old, {}, params)
            n_conv += bool(info.converged)
            if require_converged:
                assert bool(info.converged)
            u_old, u = u, u_new
            dt_old = dt
        order = np.argsort(x)
        return np.asarray(u[order, 0]), n_conv


def _overshoot(u):
    """Max density above the initial plateau (exp(0)=1): Galerkin ringing
    shows up as exp(u) > 1 spikes behind the front."""
    return float(np.exp(u).max()) - 1.0


def test_peclet_upwinding_keeps_front_monotone():
    # identical under-resolved advection: Pe = v*h/(2D) = 1*(1/64)/2e-5 ~ 780
    u_gal, conv_gal = _Advect1D(stab="off").run(steps=64,
                                                require_converged=False)
    u_upw, conv_upw = _Advect1D(stab="peclet").run(steps=64)
    # plain Galerkin explodes (measured: overshoot ~1e141, most Newton
    # solves fail); Peclet upwinding stays monotone and converges every step
    assert conv_gal < 64
    assert _overshoot(u_gal) > 1.0
    assert conv_upw == 64
    assert _overshoot(u_upw) < 1e-8
    # monotone non-increasing density (no ringing above 1e-6 of the
    # plateau) away from the zero-flux outflow wall, where the vacuum tail
    # physically piles up
    n_upw = np.exp(u_upw)
    assert (np.diff(n_upw[:-4]) <= 1e-6 * n_upw.max()).all()
    # the front advanced (slower than v: sharp log-form advection is
    # representation-limited — see docs/STREAMER_STUDY.md; the streamer's
    # ionisation-driven front does not rely on this mechanism)
    x = np.linspace(0, 1, len(u_upw))
    front_upw = x[np.argmax(n_upw < 0.5)]
    assert front_upw >= 0.3 + 1.0 / 128


def test_peclet_upwinding_inactive_when_resolved():
    # diffusion-dominated: Pe = v*h/(2D) = 0.1*(1/64)/(2*0.05) ~ 0.016
    u_off, _ = _Advect1D(v=0.1, D=0.05, stab="off").run(steps=5)
    u_pec, _ = _Advect1D(v=0.1, D=0.05, stab="peclet").run(steps=5)
    np.testing.assert_allclose(u_pec, u_off, rtol=1e-12, atol=1e-12)
