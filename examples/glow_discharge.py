"""Argon glow discharge run (LMEA, parsed reaction scheme).

Counterpart of `examples/glow_discharge/fedm-gd.py`: the full feature set —
speclist/reacscheme/LUT front-end, semi-implicit coefficients, electron
energy equation, secondary emission, ramped cathode voltage, adaptive BDF2
with PID, XDMF/HDF5 checkpoint output of the densities and PVD of the
potential, reaction-matrix and conditions logging.

By default generates the synthetic argon input tree (see
`fedm_tpu.models.argon_synth`); pass `-i` to point at an existing
reference-format `file_input` directory (e.g. one containing the Becker et
al. tables).

Usage: python examples/glow_discharge.py [-i FILE_INPUT] [-o OUT] [--quick]
"""

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from fedm_tpu.io import files, log, output_files, mesh_statistics  # noqa: E402
from fedm_tpu.io.output import OutputSeries, file_output  # noqa: E402
from fedm_tpu.io.checkpoint import save_checkpoint  # noqa: E402
from fedm_tpu.models.glow import GlowDischargeModel, GlowConfig  # noqa: E402


def main(file_input=None, output_dir=None, quick=False, T_final=None):
    if output_dir is not None:
        files.output_folder_path = Path(output_dir)
    if file_input is None:
        from fedm_tpu.models.argon_synth import generate_argon_input

        file_input = Path(tempfile.mkdtemp(prefix="argon_input_"))
        generate_argon_input(file_input)
        print(f"generated synthetic argon input tree at {file_input}")

    if quick:
        cfg = GlowConfig(file_input=file_input, nx=24, ny=24, ttol=2e-3,
                         T_final=1e-11)
    else:
        cfg = GlowConfig(file_input=file_input)
    if T_final is not None:
        cfg.T_final = T_final

    model = GlowDischargeModel(cfg)
    log("conditions", files.model_log, cfg.dt_init, cfg.U_w, cfg.p0,
        cfg.gap_length, cfg.N0, cfg.Tgas)
    log("properties", files.model_log, "Ar", cfg.model, model.species,
        model.masses, model.signs)
    log("matrices", files.model_log, model.G_mat, model.L_mat, model.P_mat)
    mesh_statistics(model.mesh)
    log("initial time", files.model_log, 0.0)

    names = ["Ar_star", "Ar_plus", "electrons"]
    xdmf = output_files("xdmf", "number density", names, mesh=model.mesh)
    vtk_phi = output_files("pvd", "potential", ["Phi"])
    series = [OutputSeries(vtk_phi[0], lambda u: u[:, 4], kind="pvd",
                           field_name="Phi")]
    for k, (w, name) in enumerate(zip(xdmf, names)):
        series.append(OutputSeries(
            w, lambda u, k=k: np.exp(u[:, k + 1]), kind="xdmf"))

    t_output_list = [1e-11, 1e-10, 1e-9, 1e-8, 1e-7, 1e-6, 1e-5]
    t_output_step_list = [1e-11, 1e-10, 1e-9, 1e-8, 1e-7, 1e-6, 1e-6]
    t_out, step = t_output_step_list[0], t_output_list[0]

    driver = model.make_driver(error_log=files.error_file, verbose=True)
    state = model.initial_state()
    while state.t < cfg.T_final:
        t_old = state.t
        aux = model._update_aux_jit(state.u)
        state = driver.advance(state, aux)
        log("time", files.model_log, state.t)
        t_out, step = file_output(
            state.t, t_old, t_out, step, t_output_list, t_output_step_list,
            series, np.asarray(state.u), np.asarray(state.u_old),
            mesh=model.mesh, unit="us")
    save_checkpoint(files.output_folder_path / "checkpoint.npz", state)
    print(f"Finished: {state.n_accepted} steps ({state.n_rejected} rejected), "
          f"checkpoint written")
    return state


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--file-input", default=None)
    ap.add_argument("-o", "--output-dir", default=None)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("-T", "--T-final", type=float, default=None)
    args = ap.parse_args()
    main(args.file_input, args.output_dir, args.quick, args.T_final)
