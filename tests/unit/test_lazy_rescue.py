"""Lazy true-res-rescue semantics (r3 verdict weak #1 / compile cut).

The hot host-iteration program must compile WITHOUT the rescue branch
(the rescue GMRES tripled its compile time, tools/compile_probe.py);
the rescue-enabled variant compiles lazily and only on a non-improving
iteration. On a well-conditioned problem the rescue program must never
be built; the iteration results must be identical to the pre-split
behavior (goldens pin this globally — tests/verification — this checks
the mechanism directly)."""

import jax.numpy as jnp
import numpy as np

from fedm_tpu.models.tof import TimeOfFlight1D, TofConfig
from fedm_tpu.model.system import StepParams
from fedm_tpu.solvers.newton import NewtonConfig


def _model(rescue):
    cfg = TofConfig(dt=1e-11, T_final=2e-10,
                    newton=NewtonConfig(rtol=1e-8, max_iter=20,
                                        linear_tol=1e-8,
                                        linear_maxiter=800,
                                        host_loop=True,
                                        true_res_rescue=rescue))
    return TimeOfFlight1D(cfg, n_cells=100)


def _one_step(m):
    u = m.initial_state()
    p = StepParams(jnp.asarray(m.cfg.t0 + m.cfg.dt),
                   jnp.asarray(m.cfg.dt), jnp.asarray(1e30))
    return m.system.step(u, u, u, {}, p)


def test_rescue_program_not_built_on_healthy_problem():
    m = _model(rescue=1.0)
    u_new, info = _one_step(m)
    assert bool(info.converged)
    # the rescue jit must never have been compiled for an easy solve
    assert m.system._host_iter_rescue_jit is None


def test_hot_program_matches_rescue_disabled_config():
    m1 = _model(rescue=1.0)
    m0 = _model(rescue=0.0)
    u1, i1 = _one_step(m1)
    u0, i0 = _one_step(m0)
    assert bool(i1.converged) and bool(i0.converged)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0),
                               rtol=0, atol=0)  # bitwise: same program
