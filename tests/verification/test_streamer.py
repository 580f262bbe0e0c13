"""Streamer golden-trajectory + golden-field regression (the reference's
streamer test pattern, `tests/integrated_tests/streamer_discharge/
test_streamer_discharge.py`, with self-pinned goldens — the reference's
own streamer fixtures are incomplete as shipped, SURVEY.md section 4)."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from fedm_tpu.models.streamer import StreamerModel, StreamerConfig

GOLDEN = Path(__file__).parent.parent / "golden"

# the reference CI's first-step error for ITS config (unshipped finer
# mesh): 6.767e-4 decreasing (20220707_results); ours on the 24x40 test
# mesh: 2.205e-4 decreasing — same structure
REFERENCE_FIRST_STEP = 6.767371631189492e-4


@pytest.fixture(scope="module")
def streamer_run(tmp_path_factory):
    m = StreamerModel(StreamerConfig(nx=24, ny=40))
    st = m.initial_state()
    err_log = tmp_path_factory.mktemp("out") / "relative error.log"
    d = m.make_driver(error_log=err_log)
    for _ in range(10):
        st = d.advance(st, {})
    return m, st, err_log


def test_streamer_error_trajectory_matches_golden(streamer_run):
    _, _, err_log = streamer_run
    got = pd.read_csv(err_log, sep=r"\s+", header=None).to_numpy()
    ref = pd.read_csv(GOLDEN / "streamer_relative_error.log", sep=r"\s+",
                      header=None).to_numpy()
    assert got.shape == ref.shape
    assert np.allclose(got, ref, rtol=1e-5)


def test_streamer_fields_match_golden(streamer_run):
    _, st, _ = streamer_run
    ref = np.load(GOLDEN / "streamer_final_state.npz")
    u = np.asarray(st.u)
    assert st.t == pytest.approx(float(ref["t"]), rel=1e-12)
    for k in range(u.shape[1]):
        scale = np.max(np.abs(ref["u"][:, k])) or 1.0
        err = (u[:, k] - ref["u"][:, k]) / scale
        assert np.mean(np.abs(err)) < 1e-5
        assert np.sqrt(np.mean(err**2)) < 1e-5
        assert np.max(np.abs(err)) < 1e-3


def test_streamer_trajectory_shape_vs_reference(streamer_run):
    _, st, err_log = streamer_run
    got = pd.read_csv(err_log, sep=r"\s+", header=None).to_numpy()
    errs, dts = got[:, 0], got[:, 2]
    # dt pinned at dt_max = 5e-12 (as in the reference trajectory) and a
    # slowly-decreasing error sequence of the same order of magnitude
    assert (dts == 5e-12).all()
    assert (np.diff(errs) < 0).all()
    assert 0.05 * REFERENCE_FIRST_STEP < errs[0] < 2 * REFERENCE_FIRST_STEP
    assert st.n_rejected == 0


def test_streamer_physics_sanity(streamer_run):
    m, st, _ = streamer_run
    u = np.asarray(st.u)
    assert np.isfinite(u).all()
    # ionisation: electron density must grow above the background
    assert np.exp(u[:, 1]).max() > 1.5 * m.cfg.background
    # the positive ion space charge lifts Phi above the anode value near
    # the seed (physical); it stays within a factor of the applied voltage
    assert -1.0 <= u[:, 2].min() and u[:, 2].max() <= 2.0 * m.cfg.U_w


def test_stabilised_streamer_steps():
    """Artificial-diffusion option (docs/STREAMER_STUDY.md): steps accept
    and the stabilised electron profile stays finite and bounded by the
    unstabilised one's extremes."""
    import jax.numpy as jnp

    m0 = StreamerModel(StreamerConfig(nx=16, ny=24))
    m1 = StreamerModel(StreamerConfig(nx=16, ny=24, stab_diffusion=1.0))
    s0, s1 = m0.initial_state(), m1.initial_state()
    d0, d1 = m0.make_driver(), m1.make_driver()
    for _ in range(3):
        s0 = d0.advance(s0, {})
        s1 = d1.advance(s1, {})
    u0, u1 = np.asarray(s0.u), np.asarray(s1.u)
    assert np.isfinite(u1).all()
    assert s1.n_accepted == 3
    # stabilisation diffuses: the electron peak cannot exceed the plain one
    assert np.exp(u1[:, 1]).max() <= np.exp(u0[:, 1]).max() * 1.01
