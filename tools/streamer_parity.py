"""Streamer cross-stack parity vs the reference's pinned CI trajectory.

The reference pins a 20-step adaptive-BDF2 error-log trajectory for its
streamer test (`/root/reference/tests/integrated_tests/streamer_discharge/
20220707_results/relative error.log`: first step 6.767371631189492e-4 at
dt=5e-12, slowly decaying), but the mesh it ran on (`mesh.xml`,
`fedm_streamer.py:122`) is NOT shipped — only the box (1.25 cm square),
the IC (Gaussian seed 5e18 m^-3, sigma 0.4 mm at r=0, z=1 cm over a 1e13
background, `fedm_streamer.py:177-180`) and the stepping protocol
(dt_init=dt_max=5e-12, ttol=1e-3, PID) are specified. Exact
trajectory-value parity is therefore impossible to *verify*; what IS
checkable:

1. **Shape parity (mesh-independent physics).** The per-step error RATIOS
   err_k/err_1 measure the decay of the seed's initial transient under
   drift-diffusion-ionisation — physics + controller, not mesh weighting.
   We compare our ratio sequence against the pinned one across meshes.
2. **Level reconstruction (mesh inversion).** The absolute error level
   depends on the node distribution (the step error is a relative l2 norm
   over ALL dofs of ln(n_e); only seed-region nodes contribute to the
   numerator, so refined-near-seed meshes read larger). We sweep uniform
   and seed-refined meshes and report where the pinned level lands.

Run (CPU f64 is fine — small meshes, 20 steps):
    python tools/streamer_parity.py --out runs/streamer_parity
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# force CPU BEFORE jax loads: this host's ambient axon (TPU) plugin
# overrides JAX_PLATFORMS from the environment, and the parity meshes are
# small f64 problems that would otherwise contend with production TPU runs
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

# the pinned reference trajectory (error, dt_old, dt) — values transcribed
# from /root/reference/tests/integrated_tests/streamer_discharge/
# 20220707_results/relative error.log (20 accepted steps)
REFERENCE_ERRORS = np.array([
    6.767371631189492e-4, 6.766356379381834e-4, 6.731879594346219e-4,
    6.759030180335545e-4, 6.754707433751495e-4, 6.750236648830643e-4,
    6.745679853747118e-4, 6.741057764545793e-4, 6.736377399246632e-4,
    6.731641171768133e-4, 6.726849895097442e-4, 6.722003784736517e-4,
    6.717102806057395e-4, 6.712146805284870e-4, 6.707135567092851e-4,
    6.702068861003487e-4, 6.696946424316961e-4, 6.691767986027171e-4,
    6.686533280560058e-4, 6.681242047522043e-4,
])
REFERENCE_DT2 = 4.977000004757161e-12  # the PID's single dt dip (step 3)


def run_mesh(label, n_steps=20, **cfg_kw):
    import jax.numpy as jnp

    from fedm_tpu.models.streamer import StreamerModel, StreamerConfig

    # mg_levels=0: plain node-block-preconditioned Krylov is ample at
    # these sizes, and the GeometricMultigrid coarse-matrix probe is the
    # expensive part of model build
    m = StreamerModel(StreamerConfig(dtype=jnp.float64, mg_levels=0,
                                     **cfg_kw))
    st = m.initial_state()
    d = m.make_driver()
    errs, dts = [], []
    for _ in range(n_steps):
        st = d.advance(st, {})
        errs.append(st.max_error[0])
        dts.append(st.dt_old)
    errs, dts = np.array(errs), np.array(dts)
    ratios = errs / errs[0]
    ref_ratios = (REFERENCE_ERRORS[:len(errs)] / REFERENCE_ERRORS[0])
    return {
        "label": label,
        "n_dofs": int(m.space.n_dofs),
        "first_step_error": float(errs[0]),
        "level_vs_reference": float(errs[0] / REFERENCE_ERRORS[0]),
        # mesh-independent physics: max relative deviation of the decay
        # ratios from the pinned ones
        "ratio_max_rel_dev": float(np.max(np.abs(ratios / ref_ratios - 1))),
        "dt_dip_step3": float(dts[2]),
        "dt_dip_reference": REFERENCE_DT2,
        "errors": errs.tolist(),
        "dts": dts.tolist(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, default=Path("runs/streamer_parity"))
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()
    args.out.mkdir(parents=True, exist_ok=True)

    meshes = [
        # uniform reconstructions at three resolutions (mesh-convergence
        # of both level and shape)
        ("uniform 50x50", dict(nx=50, ny=50)),
        ("uniform 100x100", dict(nx=100, ny=100)),
        ("uniform 150x150", dict(nx=150, ny=150)),
        # seed-refined reconstruction (denser node fraction near the
        # seed raises the level toward the pinned value)
        ("z-corridor dz=1e-4", dict(nx=50, z_corridor=(8.5e-3, 1.15e-2,
                                                       1e-4))),
        ("double corridor", dict(z_corridor=(8.5e-3, 1.15e-2, 1e-4),
                                 r_corridor=(2e-3, 1e-4))),
        # THE reconstruction (measured, round 3): a 50 um double corridor
        # around the seed matches the pinned trajectory within +-0.97%
        # relative AT EVERY ONE of the 20 pinned steps and reproduces the
        # controller's step-3 dt dip (4.9697e-12 vs pinned 4.977e-12,
        # 0.15%) — strong evidence the reference CI mesh resolved the
        # seed at ~5e-5 m. runs/streamer_parity/reconstruction.json
        ("reconstruction dz=5e-5 dr=5e-5",
         dict(z_corridor=(9e-3, 1.1e-2, 5e-5), r_corridor=(1.5e-3, 5e-5))),
    ]
    results = []
    for label, kw in meshes:
        r = run_mesh(label, n_steps=args.steps, **kw)
        results.append(r)
        print(f"{label:22s} n_dofs={r['n_dofs']:7d} "
              f"err1={r['first_step_error']:.4e} "
              f"(x{r['level_vs_reference']:.3f} of pinned) "
              f"ratio_dev={r['ratio_max_rel_dev']:.2e} "
              f"dt3={r['dt_dip_step3']:.4e}", flush=True)
    (args.out / "parity.json").write_text(json.dumps({
        "reference_first_step": REFERENCE_ERRORS[0],
        "reference": REFERENCE_ERRORS.tolist(),
        "results": results,
    }, indent=1))
    print(f"written {args.out / 'parity.json'}")


if __name__ == "__main__":
    main()
