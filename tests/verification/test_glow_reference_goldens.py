"""Cross-stack parity vs the reference's OWN pinned glow goldens.

Runs the reference test configuration (4_particles, 100x100 crossed,
ttol=2e-3, T=1e-11 — `/root/reference/tests/integrated_tests/
glow_discharge/fedm_gd.py`) and holds this framework to the reference
test's tolerances against the 2022-07-07 CI fields
(`test_glow_discharge.py:55-62`). Measured round-4 agreement is
~1e-10 relative (docs/GLOW_STUDY.md, golden-parity section); the pinned
assertions leave an order of headroom for platform drift while staying
orders below the reference's own 1e-5/1e-3 tolerances.

Skipped when the reference tree is not present.
"""

from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

REF = Path("/root/reference/tests/integrated_tests/glow_discharge")
GOLD = REF / "20220707_results"

pytestmark = pytest.mark.skipif(not GOLD.is_dir(),
                                reason="reference goldens not available")


@pytest.fixture(scope="module")
def parity_run():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "glow_golden_parity",
        Path(__file__).parents[2] / "tools" / "glow_golden_parity.py")
    ggp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ggp)

    from fedm_tpu.models.glow import GlowDischargeModel, GlowConfig
    from fedm_tpu.timestepping import AdaptiveDriver

    T = 1e-11
    cfg = GlowConfig(model="4_particles", file_input=REF / "file_input",
                     nx=100, ny=100, ttol=2e-3, dt_init=1e-13, T_final=T)
    model = GlowDischargeModel(cfg)
    driver = AdaptiveDriver(model.system, monitor_idx=0, ttol=2e-3,
                            dt_min=cfg.dt_min, dt_max=cfg.dt_max)
    state = model.initial_state()
    errs, dts = [], []
    # the reference loop overshoots T; its pinned fields are the
    # time-interpolated output between the bracketing accepted states
    t_prev, u_prev = state.t, np.asarray(state.u)
    while state.t < T:
        t_prev, u_prev = state.t, np.asarray(state.u)
        aux = model._update_aux_jit(state.u)
        state = driver.advance(state, aux)
        errs.append(state.max_error[0])
        dts.append(state.dt_old)
    u_new = np.asarray(state.u)
    u_at_T = u_prev + (T - t_prev) * (u_new - u_prev) / (state.t - t_prev)
    return ggp, model, u_at_T, np.asarray(errs), np.asarray(dts)


def test_trajectory_matches_reference(parity_run):
    _, _, _, errs, dts = parity_run
    ref = np.loadtxt(GOLD / "relative error.log")
    assert len(errs) == len(ref)
    np.testing.assert_allclose(errs, ref[:, 0], rtol=1e-5)
    np.testing.assert_allclose(dts, ref[:, 2], rtol=1e-5)


@pytest.mark.parametrize("key", ["Ar_1p0", "Ar_star", "Ar_plus",
                                 "electrons"])
def test_fields_match_reference_goldens(parity_run, key):
    ggp, model, u_at_T, _, _ = parity_run
    coords = model.space.dof_coords
    lnN0 = np.log(model.cfg.N0)
    ours = {"Ar_1p0": np.full(model.space.n_dofs, lnN0),
            "Ar_star": u_at_T[:, 1], "Ar_plus": u_at_T[:, 2],
            "electrons": u_at_T[:, 3]}[key]
    snaps = ggp.read_golden(key)
    geo, vec = snaps[-1]
    m = ggp.match_nodes(geo, coords)
    err = (ours[m] - vec) / vec
    # reference tolerances: L1/L2 < 1e-5, Linf < 1e-3; we pin 1e-9/1e-8 —
    # measured agreement is another order below even that
    assert np.mean(np.abs(err)) < 1e-9
    assert np.sqrt(np.mean(err ** 2)) < 1e-9
    assert np.max(np.abs(err)) < 1e-8
