"""Method-of-exact-solutions verification (the reference's ToF gate,
SURVEY.md section 4 item b / section 6 baseline table)."""

import numpy as np
import pytest

from fedm_tpu.models.tof import TimeOfFlight1D, TimeOfFlight2D, TofConfig

# the reference CI's pinned result for the 40x40 / dt=1e-12 / T=2.6ns config
# (`tests/integrated_tests/time_of_flight/20220707_results/relative error.log`)
REFERENCE_L2 = 0.128997491202745


def test_tof_2d_matches_reference_pinned_error():
    m = TimeOfFlight2D()  # defaults = the reference test configuration
    _, errs = m.run(output_times=[2.6e-9])
    t, err = errs[0]
    assert abs(t - 2.6e-9) < 1e-15
    # same discretisation (P1 'right'-diagonal 40x40, BDF2, converged
    # assembly quadrature, the reference metric's q4 error projection):
    # measured 0.129043 vs pinned 0.128997 (+0.035%). The residual is the
    # reference's 2-step BDF1 bootstrap (its strict `t > t0+dt` switch,
    # fedm_tof.py:176, worth -0.011pp) + FFC-vs-Gauss rule residue; the
    # full decomposition is tools/tof2d_decomp.py (r3 verdict item 4).
    assert err == pytest.approx(REFERENCE_L2, rel=1e-3)


def test_tof_1d_accuracy():
    # short run, two resolutions: the error (time-discretisation dominated
    # at this dt) must be small at both
    cfg = TofConfig(dt=1e-11, T_final=2e-10)
    _, errs_c = TimeOfFlight1D(cfg, n_cells=200).run(output_times=[2e-10])
    _, errs_f = TimeOfFlight1D(cfg, n_cells=400).run(output_times=[2e-10])
    assert errs_c[0][1] < 6e-3
    assert errs_f[0][1] < 6e-3


def test_tof_1d_dt_refinement():
    # quartering dt must cut the (time-dominated) error by well over 2x
    # for a BDF2 scheme
    base = dict(n_cells=800)
    cfg1 = TofConfig(dt=2e-11, T_final=2e-10)
    cfg2 = TofConfig(dt=5e-12, T_final=2e-10)
    _, e1 = TimeOfFlight1D(cfg1, **base).run(output_times=[2e-10])
    _, e2 = TimeOfFlight1D(cfg2, **base).run(output_times=[2e-10])
    assert e2[0][1] < 0.5 * e1[0][1]
