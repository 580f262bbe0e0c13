"""Export flagship-run checkpoint series as ParaView-loadable field series
(VERDICT r3 item 8).

The reference's production scripts write PVD/XDMF time series of the
number densities and potential (`/root/reference/fedm/file_io.py:538-616`,
`fedm-gd.py:264`); the committed flagship artifacts here were npz
checkpoints + logs only. This tool converts a run's checkpoint trail into
the reference's dolfin-File layout (`<out>/<name>/<name>.pvd` +
numbered .vtu snapshots, `fedm/file_io.py:179-184`) with one snapshot per
checkpoint: electrons / ions / potential / |E| for streamer runs,
electron+ion+metastable densities / mean energy / potential for glow.

Each snapshot carries its own mesh (moving-window streamer checkpoints
live on different corridors), which the PVD collection format supports.

Usage:
  python tools/export_series.py --run runs/bagheri14_T --model streamer \
      --out bench_assets/series/bagheri14
  python tools/export_series.py --run runs/glow50 --model glow \
      --out bench_assets/series/glow50
"""

import argparse
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def checkpoint_trail(run: Path):
    """(t-sorted) [(path, state, meta)] for the run's checkpoint files."""
    from fedm_tpu.io.checkpoint import load_checkpoint

    paths = sorted(run.glob("checkpoint_*.npz")) + [run / "checkpoint.npz"]
    out = []
    seen = set()
    for p in paths:
        if not p.exists():
            continue
        st, meta = load_checkpoint(p, with_meta=True)
        key = (st.t, st.n_accepted)
        if key in seen:
            continue
        seen.add(key)
        out.append((p, st, meta))
    out.sort(key=lambda r: r[1].t)
    return out


def streamer_mesh(meta):
    """Rebuild the checkpoint's mesh from its corridor/tail meta."""
    import jax.numpy as jnp

    from fedm_tpu.models.streamer import StreamerModel, StreamerConfig

    corridor = tuple(float(v) for v in meta["z_corridor"])
    tails = (tuple(int(v) for v in meta["z_tail_cells"])
             if "z_tail_cells" in meta else (48, 48))
    wall = float(meta["z_wall_dz"]) if "z_wall_dz" in meta else None
    # default mg_levels: the corridor line counts are rounded to the MG
    # hierarchy's multiples, so overriding it changes the node count and
    # the checkpoint no longer fits the mesh
    cfg = StreamerConfig(dtype=jnp.float32, nx=96, z_corridor=corridor,
                         z_tail_cells=tails, z_wall_dz=wall,
                         r_corridor=(2e-3, 2e-5))
    return StreamerModel(cfg)


def export_streamer(run: Path, out: Path, max_snapshots: int = 0):
    # one COMBINED vtu per snapshot (all four fields share one mesh copy,
    # binary float32): the 101k-dof production meshes make per-variable
    # dolfin layout ~10x larger for an archival artifact
    from fedm_tpu.io.vtu import write_vtu

    snapshots = []
    cache = {}
    trail = checkpoint_trail(run)
    if max_snapshots and len(trail) > max_snapshots:
        idx = np.linspace(0, len(trail) - 1, max_snapshots).round()
        trail = [trail[int(i)] for i in idx]
    for p, st, meta in trail:
        key = (tuple(float(v) for v in meta["z_corridor"]),
               tuple(int(v) for v in meta.get("z_tail_cells", (48, 48))))
        if key not in cache:
            cache[key] = streamer_mesh(meta)
        model = cache[key]
        if model.space.n_dofs != st.u.shape[0]:
            print(f"  skip {p.name}: {st.u.shape[0]} dofs vs mesh "
                  f"{model.space.n_dofs}", flush=True)
            continue
        u = np.asarray(st.u, np.float64)
        mesh = model.mesh
        coords = np.asarray(model.space.dof_coords)
        # |E| from the P1 potential gradient on the structured grid
        rs, zs = np.unique(coords[:, 0]), np.unique(coords[:, 1])
        phi = u[:, 2].reshape(len(rs), len(zs), order="C")
        order = np.lexsort((coords[:, 1], coords[:, 0]))
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        phi_g = u[order, 2].reshape(len(rs), len(zs))
        Er = np.gradient(phi_g, rs, axis=0)
        Ez = np.gradient(phi_g, zs, axis=1)
        Em = np.sqrt(Er**2 + Ez**2).reshape(-1)[inv]
        fields = {"electrons": np.exp(u[:, 1]),
                  "ions": np.exp(u[:, 0]),
                  "potential": u[:, 2],
                  "E_magnitude": Em}
        fname = f"fields{len(snapshots):06d}.vtu"
        write_vtu(out / fname, mesh, fields, binary=True,
                  point_dtype=np.float32)
        snapshots.append((st.t, fname))
        with open(out / "fields.pvd", "w") as f:
            f.write('<?xml version="1.0"?>\n'
                    '<VTKFile type="Collection" version="0.1" '
                    'byte_order="LittleEndian">\n  <Collection>\n')
            for t, fn in snapshots:
                f.write(f'    <DataSet timestep="{t}" part="0" '
                        f'file="{fn}" />\n')
            f.write("  </Collection>\n</VTKFile>\n")
        print(f"  {p.name}: t={st.t:.4e} ({st.n_accepted} steps, "
              f"{st.u.shape[0]} dofs)", flush=True)


def export_glow(run: Path, out: Path, nx=64, ny=64):
    import jax.numpy as jnp  # noqa: F401

    from fedm_tpu.io.vtu import VtuSeriesWriter
    from fedm_tpu.models.glow import GlowDischargeModel, GlowConfig

    model = GlowDischargeModel(GlowConfig(
        model="4_particles",
        file_input=Path("/root/reference/tests/integrated_tests/"
                        "glow_discharge/file_input"),
        nx=nx, ny=ny))
    # state layout (models/generic.py docstring): u0 = ln w_e (energy
    # density), u1..u_{n-2} = ln n_i for species 1.. (background Ar held
    # at N0, not solved), u_{n-1} = Phi; electrons are the LAST species
    names = ["energy_density", "Ar_star_density", "Ar_plus_density",
             "electrons", "potential", "mean_energy"]
    writers = {k: VtuSeriesWriter(k, out) for k in names}
    for p, st, meta in checkpoint_trail(run):
        if model.space.n_dofs != st.u.shape[0]:
            print(f"  skip {p.name}: dof mismatch", flush=True)
            continue
        u = np.asarray(st.u, np.float64)
        ie = u.shape[1] - 2  # electron column (last species)
        fields = {"energy_density": np.exp(u[:, 0]),
                  "Ar_star_density": np.exp(u[:, 1]),
                  "Ar_plus_density": np.exp(u[:, 2]),
                  "electrons": np.exp(u[:, ie]),
                  "potential": u[:, -1],
                  "mean_energy": np.exp(u[:, 0] - u[:, ie])}
        for k, v in fields.items():
            writers[k].write(model.mesh, v, st.t, field_name=k)
        print(f"  {p.name}: t={st.t:.4e} ({st.n_accepted} steps)",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", type=Path, required=True)
    ap.add_argument("--model", choices=["streamer", "glow"],
                    required=True)
    ap.add_argument("--out", type=Path, required=True)
    ap.add_argument("--max-snapshots", type=int, default=0,
                    help="evenly subsample the checkpoint trail "
                         "(archival size control; 0 = all)")
    args = ap.parse_args()
    args.out.mkdir(parents=True, exist_ok=True)
    import fedm_tpu  # noqa: F401

    if args.model == "streamer":
        export_streamer(args.run, args.out, args.max_snapshots)
    else:
        export_glow(args.run, args.out)
    print(f"series written under {args.out}", flush=True)


if __name__ == "__main__":
    main()
