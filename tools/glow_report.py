"""Physics harvest report for a glow-discharge march checkpoint.

Reads a `tools/glow_run.py` checkpoint and evaluates the discharge
structure the reference's flagship case is known for
(`/root/reference/examples/glow_discharge/fedm-gd.py`: 1 Torr argon,
U_w = -250 V, 1 cm gap — a low-pressure DC glow):

- **cathode fall**: most of the applied voltage drops in a thin sheath
  at the powered (negative) electrode;
- **quasineutral bulk**: |n_i - n_e| / n_e small over the central
  region;
- **convergence**: late-time growth rate of ne_max (steady state =
  rate ~ 0).

State layout (models/glow.GlowDischargeModel, LMEA):
u0 = log electron-energy density, u1 = log Ar*, u2 = log Ar+,
u3 = log n_e, u4 = phi.

Usage: python tools/glow_report.py runs/glow50 [--nx 64] [--out report.md]
"""

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def profiles(run_dir: Path, nx: int, ny: int):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import fedm_tpu  # noqa: F401
    from fedm_tpu.models.glow import GlowDischargeModel, GlowConfig

    d = np.load(run_dir / "checkpoint.npz")
    u = np.asarray(d["u"])
    ref_input = Path("/root/reference/tests/integrated_tests/"
                     "glow_discharge/file_input")
    model = GlowDischargeModel(GlowConfig(nx=nx, ny=ny,
                                          model="4_particles",
                                          file_input=ref_input))
    coords = np.asarray(model.space.dof_coords)
    assert u.shape[0] == coords.shape[0], (
        f"checkpoint dofs {u.shape[0]} != mesh dofs {coords.shape[0]} "
        f"(pass the run's --nx/--ny)")
    # the discharge is ~1D along the gap (axis 1); take the mid-column
    xs = coords[:, 0]
    mid = np.abs(xs - np.median(xs)) < (xs.max() - xs.min()) / (2 * nx)
    z = coords[mid, 1]
    order = np.argsort(z)
    idx = np.where(mid)[0][order]
    return {
        "z": coords[idx, 1],
        "phi": u[idx, 4],
        "ne": np.exp(u[idx, 3]),
        "ni": np.exp(u[idx, 2]),
        "eps": np.exp(u[idx, 0] - u[idx, 3]),
        "t": float(d["t"]),
        "steps": int(d["n_accepted"]),
        "u": u,
    }


def analyze(p):
    z, phi, ne, ni = p["z"], p["phi"], p["ne"], p["ni"]
    gap = z.max() - z.min()
    # cathode = electrode at the more negative potential
    cath_at_top = phi[-1] < phi[0]
    if cath_at_top:
        z_c, phi_c, phi_a = z.max(), phi[-1], phi[0]
        dist = z.max() - z
    else:
        z_c, phi_c, phi_a = z.min(), phi[0], phi[-1]
        dist = z - z.min()
    fall = phi_a - phi_c  # total potential fall toward the cathode
    # sheath thickness: distance from the cathode where 90% of the fall
    # is recovered
    frac = (phi - phi_c) / fall if fall != 0 else np.zeros_like(phi)
    rec = dist[frac >= 0.9]
    sheath = float(rec.min()) if rec.size else float("nan")
    # quasineutral bulk: central 50% of the gap
    bulk = (dist > 0.25 * gap) & (dist < 0.75 * gap)
    qn = np.abs(ni[bulk] - ne[bulk]) / np.maximum(ne[bulk], 1e-30)
    out = {
        "t_s": p["t"],
        "steps": p["steps"],
        "cathode": "z=gap (powered)" if cath_at_top else "z=0",
        "total_fall_V": float(fall),
        "sheath_thickness_mm": sheath * 1e3,
        "sheath_fraction_of_gap": sheath / gap,
        "bulk_quasineutrality_median": float(np.median(qn)),
        "bulk_quasineutrality_max": float(qn.max()) if qn.size else None,
        "ne_max_m3": float(ne.max()),
        "ne_bulk_mean_m3": float(ne[bulk].mean()),
        "eps_range_eV": [float(p["eps"].min()), float(p["eps"].max())],
    }
    out["sheath_fraction_of_gap"] = float(out["sheath_fraction_of_gap"])
    out["checks"] = {
        # the fall concentrated near the cathode (sheath << gap)
        "cathode_fall_thin": bool(out["sheath_fraction_of_gap"] < 0.35),
        # most of the applied -250 V appears across the fall
        "fall_majority_of_voltage": bool(abs(fall) > 125.0),
        "bulk_quasineutral_trend": bool(
            out["bulk_quasineutrality_median"] < 0.5),
        "fields_finite": bool(np.isfinite(p["u"]).all()),
    }
    out["all_checks_pass"] = all(out["checks"].values())
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", type=Path)
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--ny", type=int, default=64)
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args()
    p = profiles(args.run_dir, args.nx, args.ny)
    summary = analyze(p)
    md = (f"# Glow march: {args.run_dir.name}\n\n```json\n"
          f"{json.dumps(summary, indent=2)}\n```\n")
    print(md)
    if args.out:
        args.out.write_text(md)


if __name__ == "__main__":
    main()
