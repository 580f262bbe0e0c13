"""Time-of-flight 2D (axisymmetric) verification run.

Counterpart of the reference's 2D configuration
(`tests/integrated_tests/time_of_flight/fedm_tof.py:63-95`): a point-source
electron swarm drifting along z in cylindrical (r, z), P1 elements on a
40x40 mesh over 2.5e-4 x 5e-4 m, dt = 1e-12, t in [2.5e-9, 2.6e-9],
relative L2 error vs the 3D Gaussian analytic solution written in the
reference's `relative error.log` format. The reference CI pins
L2 = 0.128997 for this exact configuration
(`20220707_results/relative error.log`); this driver reproduces 0.1299
(discretisation-dominated, `tests/verification/test_tof.py`).

Usage: python examples/tof_2d.py [-o OUTPUT_DIR] [--quick]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fedm_tpu.io import files, log, output_files, mesh_statistics  # noqa: E402
from fedm_tpu.models.tof import TimeOfFlight2D, TofConfig  # noqa: E402


def main(output_dir=None, quick=False):
    if output_dir is not None:
        files.output_folder_path = Path(output_dir)

    if quick:
        cfg = TofConfig(t0=2.5e-9, T_final=2.52e-9, dt=1e-12)
        model = TimeOfFlight2D(cfg, nx=20, ny=20)
    else:
        model = TimeOfFlight2D()  # reference test config: 40x40, P1

    cfg = model.cfg
    log("properties", files.model_log, "Air", "Time_of_flight",
        ["electrons", "analytical solution"], 9.10938356e-31,
        -1.6021766208e-19)
    log("conditions", files.model_log, cfg.dt, "None", 760.0, 1e-3,
        760.0 * 3.21877e22, 300.0)
    mesh_statistics(model.space.mesh)
    log("initial time", files.model_log, cfg.t0)

    vtk = output_files("pvd", "number density",
                       ["electrons", "analytical solution"])
    u, errors = model.run(output_times=[cfg.T_final])

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
