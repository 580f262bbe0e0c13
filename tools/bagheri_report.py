"""Harvest report for a Bagheri streamer run directory.

Parses the `t=... front_z=... Emax=...` trajectory lines of
`driver.log` (written by tools/bagheri_run.py --report-every) and emits:

- a markdown table of the trajectory at ~1 ns marks with the
  finite-difference front velocity;
- physics sanity checks against the Bagheri case-1 trajectory shape
  (the reference's flagship benchmark,
  /root/reference/examples/streamer_discharge/fedm-streamer.py:67):
  monotone cathode-directed front advance, accelerating velocity in the
  1e5-2e6 m/s band, head field in the 8-30 MV/m band, channel density
  plateauing at O(1e20) m^-3 with no mesh-limited spike (the round-2
  failure mode was ne_max four orders above the channel density).

Usage: python tools/bagheri_report.py runs/bagheri14 [--out report.md]
"""

import argparse
import json
import re
from pathlib import Path

LINE = re.compile(
    r"^t=(?P<t>[0-9.e+-]+) dt=(?P<dt>[0-9.e+-]+) steps=(?P<steps>\d+) "
    r"rej=(?P<rej>\d+) esc=(?P<esc>\d+) (?:stall=(?P<stall>\d+) )?"
    r"ne_max=(?P<ne>[0-9.e+-]+) "
    r"front_z=(?P<fz>[0-9.e+na-]+) Emax=(?P<em>[0-9.e+-]+)")


def parse(run_dir: Path, logs=None):
    rows = []
    paths = (logs if logs
             else [p for p in (run_dir / "driver.log",) if p.exists()]
             or sorted(run_dir.glob("nohup*.log")))
    text = "\n".join(Path(p).read_text(errors="replace")
                     for p in paths)
    for ln in text.splitlines():
        m = LINE.match(ln.strip())
        if not m:
            continue
        d = {k: (0.0 if v is None else
                 float(v) if k != "steps" else int(v))
             for k, v in m.groupdict().items()}
        rows.append(d)
    # resume overlap: keep the LAST occurrence of each step count
    dedup = {}
    for d in rows:
        dedup[(d["steps"], round(d["t"], 18))] = d
    rows = sorted(dedup.values(), key=lambda d: d["t"])
    return rows


def velocity(rows):
    """Finite-difference front velocity between consecutive samples with
    valid front positions (m/s, positive toward the cathode at z=0)."""
    out = []
    prev = None
    for d in rows:
        fz = d["fz"]
        if fz != fz:  # nan: front not yet formed
            out.append(None)
            continue
        if prev is None:
            out.append(None)
        else:
            dt = d["t"] - prev["t"]
            out.append((prev["fz"] - fz) / dt if dt > 0 else None)
        prev = d
    return out


def report(run_dir: Path, logs=None):
    rows = parse(run_dir, logs)
    if not rows:
        raise SystemExit(f"no trajectory lines in {run_dir}/driver.log")
    vels = velocity(rows)

    # ~1 ns marks + the final sample
    marks, next_t = [], 0.0
    for i, d in enumerate(rows):
        if d["t"] >= next_t or i == len(rows) - 1:
            marks.append((d, vels[i]))
            next_t = d["t"] + 1e-9
    if marks[-1][0] is not rows[-1]:
        marks.append((rows[-1], vels[-1]))

    lines = ["| t [ns] | steps | rej | front z [mm] | v_front [1e5 m/s] "
             "| Emax [MV/m] | ne_max [1e20 m^-3] |",
             "|---|---|---|---|---|---|---|"]
    for d, v in marks:
        fz = "-" if d["fz"] != d["fz"] else f"{d['fz'] * 1e3:.3f}"
        vv = "-" if v is None else f"{v / 1e5:.2f}"
        lines.append(
            f"| {d['t'] * 1e9:.3f} | {d['steps']} | {int(d['rej'])} | {fz} "
            f"| {vv} | {d['em'] / 1e6:.1f} | {d['ne'] / 1e20:.3f} |")
    table = "\n".join(lines)

    last = rows[-1]
    checks = {}
    # ALL physics checks are SEGMENT-AWARE (round-4 verdict weak #4): the
    # trajectory-shape checks describe the PROPAGATION phase (front still
    # above the cathode) and must not run on post-arrival rows — a finish
    # segment that is post-arrival by construction (front_z=0 throughout)
    # would otherwise read as a physics failure. Post-arrival rows get
    # their own check set (sheath densification, field collapse).
    prop_iv = [(d, v) for d, v in zip(rows, vels)
               if d["fz"] == d["fz"] and d["fz"] > 1e-6]
    pvs = [v for _, v in prop_iv if v is not None]
    pfzs = [d["fz"] for d, _ in prop_iv]
    if len(pfzs) >= 2:
        checks["front_monotone_toward_cathode"] = all(
            b <= a + 1e-6 for a, b in zip(pfzs, pfzs[1:]))
    if len(pvs) >= 2:
        checks["velocity_band_1e5_2e6"] = (
            1e5 <= sorted(pvs)[len(pvs) // 2] <= 2e6)
        # acceleration: median of the last quarter vs the first quarter
        q = max(1, len(pvs) // 4)
        checks["front_accelerating"] = (
            sorted(pvs[-q:])[q // 2] > sorted(pvs[:q])[q // 2])
    prop = [d for d, _ in prop_iv]
    ems = [d["em"] for d in prop]
    if ems:
        checks["head_field_band_8_30_MV_per_m"] = (
            8e6 <= max(ems) <= 3e7)
    nes = [d["ne"] for d in prop[-20:]]
    if nes:
        # the round-2 mesh-limited failure was ne_max ~ 4e24
        checks["no_mesh_limited_density_spike"] = max(nes) < 1e21
    bridged = [d for d in rows if d["fz"] == 0.0]
    if bridged:
        checks["gap_bridged"] = True
        summary_extra = {
            "arrival_t_ns": bridged[0]["t"] * 1e9,
            "final_sheath_ne_max": bridged[-1]["ne"],
        }
        if len(bridged) >= 3:
            # post-arrival physics: the cathode sheath densifies toward
            # O(1e22-1e23) m^-3 while the head field, screened by the
            # conducting channel, collapses out of the propagation band
            nes_b = [d["ne"] for d in bridged]
            checks["sheath_densification"] = (
                nes_b[-1] >= nes_b[0]
                and all(b >= 0.85 * a for a, b in zip(nes_b, nes_b[1:])))
            checks["post_arrival_field_collapse"] = (
                bridged[-1]["em"] < 8e6)
    else:
        summary_extra = {}
    checks["zero_escalations"] = all(d["esc"] == 0 for d in rows)

    summary = {
        **summary_extra,
        "t_final_ns": last["t"] * 1e9,
        "steps": last["steps"],
        "rejected": int(last["rej"]),
        "front_z_mm": None if last["fz"] != last["fz"] else last["fz"] * 1e3,
        "Emax_MV_per_m": last["em"] / 1e6,
        "ne_max_1e20": last["ne"] / 1e20,
        "checks": checks,
        "all_checks_pass": all(checks.values()),
    }
    return table, summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", type=Path)
    ap.add_argument("--out", type=Path, default=None,
                    help="write markdown report here (default: stdout only)")
    ap.add_argument("--logs", nargs="*", type=Path, default=None,
                    help="explicit report-log files (default: driver.log, "
                         "else nohup*.log in the run dir)")
    args = ap.parse_args()
    table, summary = report(args.run_dir, args.logs)
    md = (f"# Bagheri streamer run: {args.run_dir.name}\n\n"
          f"{table}\n\n## Summary\n\n```json\n"
          f"{json.dumps(summary, indent=2)}\n```\n")
    print(md)
    if args.out:
        args.out.write_text(md)


if __name__ == "__main__":
    main()
