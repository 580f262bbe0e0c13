"""Glow discharge on the reference's REAL `4_particles` input tree
(Becker et al. argon chemistry) — parser validation against the actual
artifact plus the adaptive-dt trajectory-shape gate vs the reference's
pinned golden log (`tests/integrated_tests/glow_discharge/
20220707_results/relative error.log`: dt grows 1e-13 -> 7.55e-12 in 6
accepted steps, errors 6.77e-6 -> 1.06e-4, none rejected).

The synthetic-chemistry regression (test_glow.py) pins this framework's
own goldens; this module proves the chemistry front-end on the reference's
on-disk files and that the same PID dt dynamics emerge on the real data.
"""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

REF = Path("/root/reference/tests/integrated_tests/glow_discharge")
FILE_INPUT = REF / "file_input"
GOLDEN_LOG = REF / "20220707_results" / "relative error.log"

pytestmark = pytest.mark.skipif(not FILE_INPUT.is_dir(),
                                reason="reference input tree not mounted")


def test_parsers_on_real_4_particles_tree():
    from fedm_tpu.chemistry import (
        rate_coefficient_file_names, reaction_matrices,
        read_energy_loss, read_particle_properties, read_speclist)
    from fedm_tpu.chemistry.parsers import read_dependences

    path = FILE_INPUT / "4_particles"
    n_sp, species, prop_files, tc_names = read_speclist(path)
    assert n_sp == 4
    assert species == ["Ar[1p0]", "Ar[*]", "Ar[+]", "e"]
    masses, signs = read_particle_properties(prop_files, "4_particles",
                                             file_input=FILE_INPUT)
    assert signs == [0, 0, 1, -1]
    # Ar mass = 39.948 amu (species/Ar.cfg)
    assert masses[0] == pytest.approx(39.948 * 1.66053906660e-27, rel=1e-4)

    P, L, G = reaction_matrices(path, species)
    k_files = rate_coefficient_file_names(path)
    u_loss = read_energy_loss(path)
    n_r = len(k_files)
    assert P.shape == (n_r, n_sp) and L.shape == P.shape and G.shape == P.shape
    # every reaction consumes something and the scheme includes ionisation
    assert (P.sum(axis=1) > 0).all()
    deps = read_dependences(k_files)
    assert all(d in ("const", "const.", "Umean", "E/N", "Te", "ElecDist")
               or str(d).startswith("fun") for d in deps)
    # the 4_particles scheme is Umean-tabulated (Becker et al. data)
    assert "Umean" in deps
    # energy losses: ionisation threshold 15.76 eV appears
    assert any(abs(u - 15.76) < 0.2 for u in np.atleast_1d(u_loss))


def test_transport_tables_real_tree():
    from fedm_tpu.chemistry import TransportCoefficients, read_speclist

    path = FILE_INPUT / "4_particles"
    _, _, _, tc_names = read_speclist(path)
    mob = TransportCoefficients.read(tc_names, "mobility", "4_particles",
                                     file_input=FILE_INPUT)
    dif = TransportCoefficients.read(tc_names, "Diffusion", "4_particles",
                                     file_input=FILE_INPUT)
    # electron transport is Umean-tabulated; ion mobility E/N-tabulated
    assert mob[3].dependence == "Umean"
    assert dif[3].dependence == "Umean"
    assert mob[2].dependence in ("E/N", "Umean")
    # missing Ar mobility tolerated as 0 (reference read_transport semantics)
    assert mob[0].dependence in (0, "const", "const.")
    import jax.numpy as jnp

    en = jnp.asarray([1.0, 3.0, 5.0])
    mu_e = np.asarray(mob[3].evaluate(N0=3.21877e22, energy=en, like=en))
    assert (mu_e > 0).all() and np.isfinite(mu_e).all()


@pytest.fixture(scope="module")
def real_glow_run(tmp_path_factory):
    from fedm_tpu.models.glow import GlowDischargeModel, GlowConfig

    cfg = GlowConfig(model="4_particles", file_input=FILE_INPUT,
                     nx=24, ny=24, ttol=2e-3)
    m = GlowDischargeModel(cfg)
    st = m.initial_state()
    err_log = tmp_path_factory.mktemp("out") / "relative error.log"
    driver = m.make_driver(error_log=err_log)
    for _ in range(6):
        aux = m._update_aux_jit(st.u)
        st = driver.advance(st, aux)
    return m, st, err_log


def test_real_chemistry_trajectory_shape_vs_reference_golden(real_glow_run):
    """Same run conditions as the reference test variant (4_particles,
    1 Torr, -250 V, ttol=2e-3, dt0=1e-13; mesh coarsened 100x100->24x24):
    the dt-growth trajectory must have the reference's pinned shape —
    monotone PID growth, no rejections, tens-of-x dt growth in 6 steps."""
    _, st, err_log = real_glow_run
    got = pd.read_csv(err_log, sep=r"\s+", header=None).to_numpy()
    ref = pd.read_csv(GOLDEN_LOG, sep=r"\s+", header=None).to_numpy()
    assert st.n_rejected == 0
    assert got.shape[0] == 6 == ref.shape[0]
    # identical protocol: BDF1 bootstrap (dt_old sentinel 1e30), dt0=1e-13
    assert got[0, 1] == ref[0, 1] == 1e30
    assert got[0, 2] == ref[0, 2] == 1e-13
    # dt grows monotonically to the same order as the pinned 7.55e-12
    assert (np.diff(got[:, 2]) > 0).all()
    assert 0.2 * ref[-1, 2] < got[-1, 2] < 5.0 * ref[-1, 2]
    # errors stay under ttol with the same leading order as the golden
    assert (got[:, 0] < 2e-3).all()
    assert 0.05 * ref[0, 0] < got[0, 0] < 20.0 * ref[0, 0]


def test_real_chemistry_physics_sanity(real_glow_run):
    m, st, _ = real_glow_run
    u = np.asarray(st.u)
    assert np.isfinite(u).all()
    eps = np.exp(u[:, 0] - u[:, 3])
    assert 0.1 < eps.min() and eps.max() < 20.0
    assert u[:, 4].min() >= m.cfg.U_w - 1.0 and u[:, 4].max() <= 1.0
