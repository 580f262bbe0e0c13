"""Extract the Bagheri case-1 benchmark curves L(t), v(t), Emax(t) from
flagship-run logs (VERDICT r3 item 2).

The benchmark paper (Bagheri et al., PSST 27 (2018) 095002 — cited at
`/root/reference/examples/streamer_discharge/fedm-streamer.py:2,38-39`)
publishes streamer position / velocity / maximal-field curves vs time;
the reference FEDM's claim to fame is matching them. This tool turns the
production runs' report streams (t, front_z, Emax, ne_max at 10-25-step
cadence) into a plot-ready CSV for point-by-point overlay:

  t_s, front_z_m, L_m (= z_seed - front_z), v_m_s (central difference),
  Emax_V_m, ne_max_m3

plus a summary table at round ns marks. The published curves themselves
cannot be digitized in this environment (zero network egress, and the
repo carries no table of them); quantitative parity vs the reference
IMPLEMENTATION is covered separately by the reconstructed CI-trajectory
test (+-0.97%, `tests/verification/test_streamer_reference_trajectory.py`).
The CSV commits the framework's own curves so any holder of the paper
can overlay them directly.

Usage:
  python tools/bagheri_curves.py --logs runs/bagheri14/driver.log \
      runs/bagheri14_ref/nohup.log --out bench_assets/streamer_parity/
"""

import argparse
import re
import sys
from pathlib import Path

import numpy as np

ROW = re.compile(
    r"t=([\d.e+-]+) dt=([\d.e+-]+) steps=(\d+) .*?"
    r"ne_max=([\d.e+-]+) front_z=([\d.nae+-]+) Emax=([\d.e+-]+)")

Z_SEED = 1e-2  # Gaussian seed position (fedm-streamer.py:169-172 analog)


def parse_logs(paths):
    rows = {}
    for p in paths:
        for line in Path(p).read_text(errors="replace").splitlines():
            m = ROW.search(line)
            if not m:
                continue
            t, dt, steps, ne, fz, em = m.groups()
            key = (float(t), int(steps))
            rows[key] = (float(t), int(steps), float(ne),
                         float(fz), float(em))
    return sorted(rows.values())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logs", nargs="+", required=True)
    ap.add_argument("--out", type=Path,
                    default=Path("bench_assets/streamer_parity"))
    ap.add_argument("--name", default="bagheri14_curves")
    args = ap.parse_args()
    rows = parse_logs(args.logs)
    if not rows:
        sys.exit("no report rows found")
    t = np.array([r[0] for r in rows])
    ne = np.array([r[2] for r in rows])
    fz = np.array([r[3] for r in rows])
    em = np.array([r[4] for r in rows])
    L = np.where(np.isfinite(fz), Z_SEED - fz, np.nan)
    # front velocity: central differences on the finite-front segment
    # (dedup replayed rows: resume replays repeat t values)
    v = np.full_like(t, np.nan)
    ok = np.isfinite(fz) & (fz > 0)
    idx = np.where(ok)[0]
    idx = idx[np.concatenate([[True], np.diff(t[idx]) > 0])]
    if len(idx) > 2:
        ti, fi = t[idx], fz[idx]
        vi = -np.gradient(fi, ti)
        v[idx] = vi
    args.out.mkdir(parents=True, exist_ok=True)
    csv = args.out / f"{args.name}.csv"
    with open(csv, "w") as f:
        f.write("t_s,front_z_m,L_m,v_m_s,Emax_V_m,ne_max_m3\n")
        for i in range(len(t)):
            f.write(f"{t[i]:.6e},{fz[i]:.6e},{L[i]:.6e},"
                    f"{v[i]:.6e},{em[i]:.6e},{ne[i]:.6e}\n")
    print(f"{len(t)} rows -> {csv}")

    # summary at ns marks (the paper's plotting cadence)
    print(f"{'t [ns]':>7} {'front_z [mm]':>13} {'L [mm]':>8} "
          f"{'v [1e5 m/s]':>12} {'Emax [MV/m]':>12} {'ne_max':>10}")
    for tn in np.arange(1.0, 14.5, 1.0):
        i = int(np.argmin(np.abs(t - tn * 1e-9)))
        if abs(t[i] - tn * 1e-9) > 2e-10:
            continue
        print(f"{t[i]*1e9:7.2f} {fz[i]*1e3:13.3f} {L[i]*1e3:8.3f} "
              f"{v[i]/1e5 if np.isfinite(v[i]) else float('nan'):12.2f} "
              f"{em[i]/1e6:12.2f} {ne[i]:10.2e}")
    # headline physics checks (the bagheri_report.py bands, restated)
    mid = ok & (fz > 2e-3) & (fz < 8e-3)
    if mid.any():
        print(f"mid-gap velocity range: {np.nanmin(v[mid]):.3e} .. "
              f"{np.nanmax(v[mid]):.3e} m/s "
              f"(case-1 band 1e5..2e6 m/s)")
        print(f"head field range (mid-gap): {em[mid].min():.3e} .. "
              f"{em[mid].max():.3e} V/m (band 8e6..3e7)")
    bridged = np.isfinite(fz) & (fz <= 1e-6)
    if bridged.any():
        print(f"cathode arrival: t ~= {t[bridged][0]*1e9:.2f} ns "
              f"(first bridged report row)")


if __name__ == "__main__":
    main()
