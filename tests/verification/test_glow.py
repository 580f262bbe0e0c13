"""Glow discharge (LMEA) golden-trajectory + golden-field regression.

Reproduces the reference's regression pattern
(`tests/integrated_tests/glow_discharge/test_glow_discharge.py`): the
adaptive-dt error trajectory must match a pinned run, and fields must match
pinned fields at L1/L2 < 1e-5, Linf < 1e-3 relative. Goldens are pinned
from this framework's own first verified run (SURVEY.md section 7: exact
parity with the reference's MUMPS-backed trajectories is not meaningful
across linear-algebra stacks; trajectory *shape* vs the reference is
checked separately).
"""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from fedm_tpu.models.argon_synth import generate_argon_input
from fedm_tpu.models.glow import GlowDischargeModel, GlowConfig

GOLDEN = Path(__file__).parent.parent / "golden"


def l1(x):
    return np.mean(np.abs(x))


def l2(x):
    return np.sqrt(np.mean(x**2))


def linf(x):
    return np.max(np.abs(x))


@pytest.fixture(scope="module")
def glow_run(tmp_path_factory):
    base = tmp_path_factory.mktemp("argon_input")
    generate_argon_input(base)
    cfg = GlowConfig(file_input=base, nx=24, ny=24, ttol=2e-3)
    m = GlowDischargeModel(cfg)
    st = m.initial_state()
    err_log = tmp_path_factory.mktemp("out") / "relative error.log"
    driver = m.make_driver(error_log=err_log)
    for _ in range(6):
        aux = m._update_aux_jit(st.u)
        st = driver.advance(st, aux)
    return m, st, err_log


def test_glow_error_trajectory_matches_golden(glow_run):
    _, _, err_log = glow_run
    got = pd.read_csv(err_log, sep=r"\s+", header=None).to_numpy()
    ref = pd.read_csv(GOLDEN / "glow_relative_error.log", sep=r"\s+",
                      header=None).to_numpy()
    assert got.shape == ref.shape
    assert np.allclose(got, ref, rtol=1e-5)


def test_glow_fields_match_golden(glow_run):
    _, st, _ = glow_run
    ref = np.load(GOLDEN / "glow_final_state.npz")
    u = np.asarray(st.u)
    assert st.t == pytest.approx(float(ref["t"]), rel=1e-10)
    for k in range(u.shape[1]):
        scale = np.max(np.abs(ref["u"][:, k])) or 1.0
        err = (u[:, k] - ref["u"][:, k]) / scale
        assert l1(err) < 1e-5, f"component {k}"
        assert l2(err) < 1e-5, f"component {k}"
        assert linf(err) < 1e-3, f"component {k}"


def test_glow_trajectory_shape_vs_reference(glow_run):
    """The reference's pinned run grows dt 1e-13 -> 7.55e-12 in 6 accepted
    steps with monotone error growth (`tests/integrated_tests/
    glow_discharge/20220707_results/relative error.log`); the same PID
    dynamics must emerge here (different chemistry data -> same structure,
    not same numbers)."""
    _, st, err_log = glow_run
    got = pd.read_csv(err_log, sep=r"\s+", header=None).to_numpy()
    assert st.n_rejected == 0
    assert got.shape[0] == 6
    dts = got[:, 2]
    assert dts[0] == 1e-13
    assert 3e-12 < dts[-1] < 3e-11  # ~70x growth, reference reaches 7.55e-12
    assert (np.diff(dts) > 0).all()
    errs = got[:, 0]
    assert (errs < 2e-3).all()  # every step under ttol (none rejected)


def test_glow_physics_sanity(glow_run):
    m, st, _ = glow_run
    u = np.asarray(st.u)
    assert np.isfinite(u).all()
    # mean energy stays physical (0.1..20 eV)
    eps = np.exp(u[:, 0] - u[:, 3])
    assert 0.1 < eps.min() and eps.max() < 20.0
    # potential bounded by the (ramped) applied voltage
    assert u[:, 4].min() >= m.cfg.U_w - 1.0
    assert u[:, 4].max() <= 1.0
