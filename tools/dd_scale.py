"""Scale proof for the DOF-partitioned domain decomposition: step a
large streamer mesh (default 280x560 -> ~473k unknowns, ~8x the round-1
56k-unknown bench mesh) on an 8-device mesh, with per-step timing and
halo metadata printed for the scaling record (docs/DESIGN.md).

Run on a host without 8 chips via virtual CPU devices:

  JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/dd_scale.py [--nx 280 --ny 560]

Per-device state is 1/8-sized; a replicated-state run of the same mesh
would hold the full [n_dofs, 3] state and every Krylov vector on every
device.
"""

import argparse
import os
import sys
import time

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
# force the virtual CPU mesh BEFORE any backend initialisation: this
# deployment's ambient axon (TPU) plugin overrides JAX_PLATFORMS from the
# environment, and jax.devices() freezes the platform choice
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
if len(jax.devices()) < 8:
    print("needs 8 devices")
    sys.exit(1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from fedm_tpu.models.streamer import StreamerModel, StreamerConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=280)
    ap.add_argument("--ny", type=int, default=560)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    mesh = Mesh(np.array(jax.devices()[:8]), ("space",))
    cfg = StreamerConfig(nx=args.nx, ny=args.ny, mg_levels=1)
    model = StreamerModel(cfg)
    n_unknowns = model.system.n_dofs * model.n_eq
    print(f"mesh {args.nx}x{args.ny}: {model.system.n_dofs} dofs, "
          f"{n_unknowns} unknowns ({n_unknowns / 56000:.1f}x bench)")
    dsys = model.distribute(mesh)
    print(f"partition: {dsys.n_own_max} own + {dsys.n_ghost_max} ghost "
          f"rows/device ({dsys.n_ghost_max / dsys.n_own_max:.1%} halo)")
    driver = model.make_driver(verbose=True)
    t0 = time.perf_counter()
    state = model.initial_state()
    print(f"initial state ({time.perf_counter() - t0:.1f}s); stepping...")
    for _ in range(args.steps):
        t0 = time.perf_counter()
        state = driver.advance(state, {})
        print(f"accepted step to t={state.t:.3e} "
              f"({time.perf_counter() - t0:.1f}s wall)")
    u = dsys.from_dist(state.u)
    assert np.isfinite(u).all()
    print(f"OK: {state.n_accepted} steps, state finite, "
          f"err={state.max_error[0]:.3e}")


if __name__ == "__main__":
    main()
