"""Extended reaction scheme at scale: tens of species, sharded stepping.

BASELINE.json configuration #5 — "streamer/discharge with an extended
He/air-style reaction scheme (tens of species), sharded across a
multi-chip ICI mesh". The reference can only express this by hand-editing
its glow script's species lists; here the equations are GENERATED from a
parsed chemistry tree (`fedm_tpu.models.generic.PlasmaModel`, the same
loop-over-species the reference's `fedm-gd.py:344-385` does in UFL) and
the coupled system is distributed over a `jax.sharding.Mesh` by
DOF-partitioned domain decomposition (ppermute halo exchange).

Run multi-device without hardware via virtual CPU devices:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/extended_scheme.py --devices 8 --species 18

On a real TPU pod slice, drop the env vars; the same code shards over
the chips present.
"""

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--species", type=int, default=18,
                    help="total species count (n_excited + 5)")
    ap.add_argument("--devices", type=int, default=1)
    ap.add_argument("--nx", type=int, default=32)
    ap.add_argument("--ny", type=int, default=64)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("-i", "--file-input", type=Path, default=None,
                    help="existing reference-format file_input tree "
                         "(default: generate the synthetic one)")
    args = ap.parse_args()

    import numpy as np
    import jax

    from fedm_tpu.models.generic import PlasmaConfig, PlasmaModel

    if args.file_input is None:
        from fedm_tpu.models.argon_synth import generate_argon_n_input

        base = Path(tempfile.mkdtemp(prefix="argon_n_input_"))
        root = generate_argon_n_input(base, n_excited=args.species - 5)
        model_name = root.name
        print(f"generated {args.species}-species synthetic tree at {root}")
    else:
        base, model_name = args.file_input.parent, args.file_input.name

    cfg = PlasmaConfig(model=model_name, file_input=base, nx=args.nx,
                       ny=args.ny, mg_levels=0, quad_degree=2)
    m = PlasmaModel(cfg)
    n_unknowns = m.space.n_dofs * m.n_eq
    print(f"{m.n_species} species, {m.n_eq} equations/node, "
          f"{m.space.n_dofs} dofs = {n_unknowns} unknowns, "
          f"{m.P_mat.shape[0]} reactions")

    dsys = None
    if args.devices > 1:
        from jax.sharding import Mesh

        devs = jax.devices()
        assert len(devs) >= args.devices, (
            f"need {args.devices} devices, have {len(devs)} "
            "(JAX_PLATFORMS=cpu XLA_FLAGS="
            "--xla_force_host_platform_device_count=N)")
        mesh = Mesh(np.array(devs[:args.devices]), ("space",))
        dsys = m.distribute(mesh)
        print(f"distributed over {args.devices} devices: "
              f"{dsys.n_own_max} own + {dsys.n_ghost_max} ghost rows/dev")

    driver = m.make_driver()
    state = m.initial_state()
    aux = m._update_aux_jit(state.u)
    t0 = time.perf_counter()
    state = driver.advance(state, aux)
    print(f"first step (incl. compile): {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(args.steps):
        aux = m._update_aux_jit(state.u)
        state = driver.advance(state, aux)
    jax.block_until_ready(state.u)
    dt_step = (time.perf_counter() - t0) / args.steps
    u = np.asarray(dsys.from_dist(state.u)) if dsys else np.asarray(state.u)
    ie = m.ie
    print(f"{state.n_accepted} accepted steps to t={state.t:.3e} "
          f"({state.n_rejected} rejected), {dt_step:.2f} s/step, "
          f"ne_max={np.exp(u[:, ie]).max():.3e} m^-3, "
          f"eps_mean={np.exp(u[:, 0] - u[:, ie]).mean():.2f} eV, "
          f"finite: {np.isfinite(u).all()}")


if __name__ == "__main__":
    main()
