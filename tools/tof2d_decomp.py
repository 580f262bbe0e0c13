"""Decompose the ToF-2D 0.66% delta vs the reference's pinned L2 error
(VERDICT r3 item 4).

Reference pinned: 0.128997491202745 (`/root/reference/tests/
integrated_tests/time_of_flight/20220707_results/relative error.log:1`,
40x40 / P1 / dt=1e-12 / t in [2.5e-9, 2.6e-9]).

Knobs probed, one at a time from the current default configuration:
  - n_floor: the TPU path floors the initial log-density at peak*1e-8
    (TofConfig.n_floor docstring); the reference hands the raw exp(-208)
    tail to f64 MUMPS,
  - bdf1_steps: the reference's `t > t0 + dt_init` strict comparison
    (`fedm_tof.py:176`) keeps dt_old at the BDF1 sentinel through TWO
    steps, not one,
  - quad_degree: FFC auto-estimates the form degree; we fix it,
  - diagonal: mesh split sensitivity scale (both use dolfin 'right').

Usage: python tools/tof2d_decomp.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

REF = 0.128997491202745


def run(label, nfloor=1e-8, bdf1_steps=1, quad=4, diagonal="right"):
    import jax.numpy as jnp  # noqa: F401

    import fedm_tpu  # noqa: F401
    from fedm_tpu.models import tof as toffm
    from fedm_tpu.models.tof import TimeOfFlight2D, TofConfig

    cfg = TofConfig(t0=2.5e-9, T_final=2.6e-9, dt=1e-12, n_floor=nfloor)
    # patch the mesh diagonal through the generator default
    import fedm_tpu.mesh.generators as gen
    orig = gen.rectangle_mesh

    def gen_patched(p0, p1, nx, ny, diagonal_=diagonal):
        return orig(p0, p1, nx, ny, diagonal=diagonal_)

    toffm.rectangle_mesh = gen_patched
    try:
        m = TimeOfFlight2D(cfg, quad_degree=quad)
    finally:
        toffm.rectangle_mesh = orig

    # variant of _TofBase.run with a configurable BDF1 bootstrap length
    from fedm_tpu.model.system import StepParams
    c = m.cfg
    u = m.initial_state()
    u_old = u
    u_old1 = u
    t = c.t0
    n_steps = int(round((c.T_final - c.t0) / c.dt))
    for k in range(n_steps):
        u_old1, u_old = u_old, u
        t = t + c.dt
        dt_old = 1e30 if k < bdf1_steps else c.dt
        params = StepParams(jnp.asarray(t), jnp.asarray(c.dt),
                            jnp.asarray(dt_old))
        u, info = m.system.step(u_old, u_old, u_old1, {}, params)
        assert bool(info.converged), f"Newton failed at step {k}"
    err = m.relative_l2_error(u, t)
    print(f"{label:<42} err={err:.15f}  vs ref {100*(err/REF-1):+.4f}%",
          flush=True)
    return err


def main():
    import jax.numpy  # noqa: F401

    run("baseline (floor 1e-8, 1xBDF1, q4, right)")
    run("floor 1e-12", nfloor=1e-12)
    run("floor 1e-4", nfloor=1e-4)
    run("2 BDF1 steps (reference's strict >)", bdf1_steps=2)
    run("quad_degree 2", quad=2)
    run("quad_degree 6", quad=6)
    run("diagonal left", diagonal="left")
    run("floor 1e-12 + 2xBDF1", nfloor=1e-12, bdf1_steps=2)


if __name__ == "__main__":
    main()
