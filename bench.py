"""Benchmark: DoF * BDF-steps / second / chip on the 2D streamer.

The north-star metric from BASELINE.md: the reference publishes no
wall-time numbers (`BASELINE.json` "published": {}), so `vs_baseline`
is measured against a documented estimate of the reference's FEniCS/
PETSc+MUMPS per-BDF-step cost on one CPU node for a comparably sized
system (~3 Newton iterations each paying a MUMPS factorisation +
FFC-kernel assembly on ~5e4 unknowns: ~2-4 s/step => ~2e4
DoF*steps/s). Prints exactly one JSON line on stdout.
"""

import json
import sys
import time

# the reference-stack estimate described above [DoF*BDF-steps/s]
REFERENCE_ESTIMATE = 2.0e4


def main():
    import jax
    import jax.numpy as jnp

    from fedm_tpu.models.streamer import StreamerModel, StreamerConfig

    nx, ny = 96, 192
    # f32 fields + f64 Krylov reductions (increment formulation keeps the
    # per-step differences fully precise; verified against the f64 path)
    # mg_levels=0: at this size on TPU the V-cycle's many small coarse-level
    # ops cost more than the ~60 block-Jacobi Krylov iterations they save
    # (measured 99k vs 173k DoF*steps/s); multigrid pays off on CPU (2.9x)
    # and on large/stiff meshes
    cfg = StreamerConfig(nx=nx, ny=ny, dtype=jnp.float32, mg_levels=0)
    model = StreamerModel(cfg)
    model.system.use_gather_scatter()  # ELL assembly: no TPU scatter-adds
    n_unknowns = model.space.n_dofs * model.n_eq
    print(f"bench: streamer {nx}x{ny}, {model.space.n_dofs} nodes, "
          f"{n_unknowns} unknowns on {jax.devices()[0]}", file=sys.stderr)

    driver = model.make_driver()
    state = model.initial_state()

    # warm-up: compiles the jitted step
    t0 = time.perf_counter()
    state = driver.advance(state, {})
    print(f"bench: first step (incl. compile) {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    n_steps = 5
    start_accepted = state.n_accepted
    jax.block_until_ready(state.u)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state = driver.advance(state, {})
    jax.block_until_ready(state.u)
    elapsed = time.perf_counter() - t0
    accepted = state.n_accepted - start_accepted

    rate = n_unknowns * accepted / elapsed
    print(json.dumps({
        "metric": "streamer_dof_bdf_steps_per_sec",
        "value": rate,
        "unit": "DoF*steps/s/chip",
        "vs_baseline": rate / REFERENCE_ESTIMATE,
    }))


if __name__ == "__main__":
    main()
