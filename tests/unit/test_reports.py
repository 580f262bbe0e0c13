"""Harvest-report parsers (tools/bagheri_report.py): trajectory line
parsing, resume-overlap dedup, front velocity, and the Bagheri case-1
shape checks."""

import importlib.util
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, ROOT / "tools" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_bagheri_report_parse_and_checks(tmp_path):
    br = _load("bagheri_report")
    log = tmp_path / "driver.log"
    log.write_text("\n".join([
        "mesh: 101065 dofs (303195 unknowns)",
        "t=1.0000e-09 dt=5.000e-12 steps=200 rej=0 esc=0 "
        "ne_max=4.000e+19 front_z=nan Emax=9.000e+06 [0.50 steps/s]",
        "t=2.0000e-09 dt=5.000e-12 steps=400 rej=1 esc=0 "
        "ne_max=1.000e+20 front_z=9.0000e-03 Emax=1.500e+07 [0.40 steps/s]",
        # resume overlap: same step count seen twice — keep the last
        "t=3.0000e-09 dt=4.000e-12 steps=600 rej=2 esc=0 "
        "ne_max=2.000e+20 front_z=8.6000e-03 Emax=1.700e+07 [0.30 steps/s]",
        "t=3.0000e-09 dt=4.000e-12 steps=600 rej=2 esc=0 "
        "ne_max=2.000e+20 front_z=8.6000e-03 Emax=1.700e+07 [0.30 steps/s]",
        "t=4.0000e-09 dt=4.000e-12 steps=800 rej=2 esc=0 "
        "ne_max=2.100e+20 front_z=8.1000e-03 Emax=1.800e+07 [0.30 steps/s]",
    ]))
    rows = br.parse(tmp_path)
    assert [r["steps"] for r in rows] == [200, 400, 600, 800]
    vels = br.velocity(rows)
    # front_z 9.0 -> 8.6 mm over 1 ns = 4e5 m/s toward the cathode
    assert abs(vels[2] - 4e5) / 4e5 < 1e-9
    table, summary = br.report(tmp_path)
    assert summary["steps"] == 800
    assert summary["checks"]["front_monotone_toward_cathode"]
    assert summary["checks"]["front_accelerating"]
    assert summary["checks"]["no_mesh_limited_density_spike"]
    assert "| t [ns] |" in table


def test_bagheri_report_flags_density_spike(tmp_path):
    br = _load("bagheri_report")
    log = tmp_path / "driver.log"
    log.write_text(
        "t=1.0000e-09 dt=5.000e-12 steps=200 rej=0 esc=0 "
        "ne_max=4.000e+24 front_z=9.0000e-03 Emax=1.500e+07 "
        "[0.50 steps/s]\n")
    _, summary = br.report(tmp_path)
    assert not summary["checks"]["no_mesh_limited_density_spike"]


def test_bagheri_report_post_arrival_segment_all_green(tmp_path):
    """Segment-awareness (round-4 verdict weak #4): a finish segment that
    is post-arrival by construction (front_z=0 throughout) must get the
    post-arrival check set (sheath densification, field collapse) and
    NONE of the propagation-shape checks — it used to read as a physics
    failure because velocity/acceleration ran on all rows."""
    br = _load("bagheri_report")
    log = tmp_path / "driver.log"
    log.write_text("\n".join([
        "t=1.3100e-08 dt=1.000e-12 steps=4300 rej=130 esc=0 stall=0 "
        "ne_max=2.000e+21 front_z=0.0000e+00 Emax=1.600e+07 [0.10 steps/s]",
        "t=1.3400e-08 dt=1.000e-12 steps=4350 rej=140 esc=0 stall=0 "
        "ne_max=5.000e+22 front_z=0.0000e+00 Emax=6.000e+06 [0.10 steps/s]",
        "t=1.3670e-08 dt=1.000e-12 steps=4440 rej=151 esc=0 stall=0 "
        "ne_max=1.100e+23 front_z=0.0000e+00 Emax=3.300e+06 [0.10 steps/s]",
    ]))
    _, summary = br.report(tmp_path)
    checks = summary["checks"]
    assert "velocity_band_1e5_2e6" not in checks
    assert "front_accelerating" not in checks
    assert "front_monotone_toward_cathode" not in checks
    assert checks["gap_bridged"]
    assert checks["sheath_densification"]
    assert checks["post_arrival_field_collapse"]
    assert summary["all_checks_pass"]


def test_bagheri_report_flags_sheath_regression(tmp_path):
    """A post-arrival segment whose sheath density COLLAPSES (or whose
    field re-intensifies into the propagation band) fails its checks."""
    br = _load("bagheri_report")
    log = tmp_path / "driver.log"
    log.write_text("\n".join([
        "t=1.3100e-08 dt=1.000e-12 steps=4300 rej=130 esc=0 stall=0 "
        "ne_max=1.100e+23 front_z=0.0000e+00 Emax=1.600e+07 [0.10 steps/s]",
        "t=1.3400e-08 dt=1.000e-12 steps=4350 rej=140 esc=0 stall=0 "
        "ne_max=5.000e+22 front_z=0.0000e+00 Emax=2.000e+07 [0.10 steps/s]",
        "t=1.3670e-08 dt=1.000e-12 steps=4440 rej=151 esc=0 stall=0 "
        "ne_max=2.000e+21 front_z=0.0000e+00 Emax=2.500e+07 [0.10 steps/s]",
    ]))
    _, summary = br.report(tmp_path)
    assert not summary["checks"]["sheath_densification"]
    assert not summary["checks"]["post_arrival_field_collapse"]
    assert not summary["all_checks_pass"]
