"""Time-of-flight 1D verification run (method of exact solutions).

Counterpart of the reference's `examples/time_of_flight_1D/fedm-tof_1d.py`:
drift-diffusion-reaction for a single electron swarm in log representation,
P2 elements, fixed dt with BDF1 bootstrap then BDF2, relative L2 error vs
the analytic drifting/diffusing/ionising Gaussian written to
`relative error.log` in the reference's format.

Usage: python examples/tof_1d.py [-o OUTPUT_DIR] [--quick]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fedm_tpu.io import files, log, output_files, mesh_statistics  # noqa: E402
from fedm_tpu.models.tof import TimeOfFlight1D, TofConfig  # noqa: E402


def main(output_dir=None, quick=False):
    if output_dir is not None:
        files.output_folder_path = Path(output_dir)

    if quick:
        cfg = TofConfig(dt=1e-11, T_final=3e-10)
        model = TimeOfFlight1D(cfg, n_cells=400)
    else:
        cfg = TofConfig(dt=1e-11, T_final=3e-9)
        model = TimeOfFlight1D(cfg)  # reference config: 4000 cells, P2

    log("properties", files.model_log, "Air", "Time_of_flight",
        ["electrons", "analytical solution"], 9.10938356e-31,
        -1.6021766208e-19)
    log("conditions", files.model_log, cfg.dt, "None", 760.0, 1e-3,
        760.0 * 3.21877e22, 300.0)
    mesh_statistics(model.mesh if hasattr(model, "mesh")
                    else model.space.mesh)
    log("initial time", files.model_log, cfg.t0)

    vtk = output_files("pvd", "number density",
                       ["electrons", "analytical solution"])
    out_times = [k * 10 * cfg.dt for k in range(1, int(
        round(cfg.T_final / cfg.dt)) // 10 + 1)]
    u, errors = model.run(output_times=out_times)

    import numpy as np
    import jax.numpy as jnp

    mesh = model.space.mesh
    h = mesh.hmax()
    for t, err in errors:
        with open(files.error_file, "a") as f:
            f.write(f"h_max = {h}\t dt = {cfg.dt}\t relative_error = {err}\n")
        print(f"t = {t:.4e}  relative_error = {err:.6e}")
    pts = jnp.asarray(model.space.dof_coords)
    n_num = np.exp(np.asarray(u[:, 0]))[: mesh.n_verts]
    n_ex = np.asarray(model.n_analytic(pts, cfg.T_final))[: mesh.n_verts]
    vtk[0].write(mesh, n_num, cfg.T_final)
    vtk[1].write(mesh, n_ex, cfg.T_final)
    print("Finished")
    return errors


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output-dir", default=None)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    main(args.output_dir, args.quick)
