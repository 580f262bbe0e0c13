"""Streamer cross-stack parity vs the reference's pinned CI trajectory
(round-2 verdict item 6).

The reference pins a 20-step error-log trajectory
(`/root/reference/tests/integrated_tests/streamer_discharge/
20220707_results/relative error.log`) but not the mesh it ran on
(`mesh.xml` is absent upstream). `tools/streamer_parity.py` reconstructs
it: a 50 um double corridor around the Gaussian seed matches the pinned
trajectory within +-0.97% relative at every pinned step and reproduces
the PID controller's step-3 dt dip to 0.15%. This test pins the first
five steps of that reconstruction (the level, the decay onset, and the
dip) so the cross-stack agreement cannot silently drift.
"""

import numpy as np
import pytest

from tools.streamer_parity import REFERENCE_ERRORS, run_mesh

pytestmark = pytest.mark.slow


def test_reconstruction_tracks_pinned_trajectory():
    r = run_mesh("reconstruction", n_steps=5,
                 z_corridor=(9e-3, 1.1e-2, 5e-5),
                 r_corridor=(1.5e-3, 5e-5))
    errs = np.array(r["errors"])
    rel = errs / REFERENCE_ERRORS[:5] - 1
    # measured round 3: max +0.97% (runs/streamer_parity/reconstruction
    # .json); guard with headroom against platform-level drift
    assert np.max(np.abs(rel)) < 2e-2, rel
    # the controller's step-3 dt dip (a pure PID artifact of the error
    # level — fires only when err1 is within ~1.5x of ttol)
    assert r["dts"][2] == pytest.approx(4.977e-12, rel=5e-3)
    assert r["dts"][0] == pytest.approx(5e-12, rel=1e-12)
