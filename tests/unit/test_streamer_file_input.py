"""StreamerModel.from_file_input: the reference's benchmark_model input
tree format (fun:E transport expressions) drives the model directly."""

import numpy as np
import pytest

from fedm_tpu.models.streamer import StreamerModel

HEADER = "# Dependence:  {dep}\n"

SPECLIST = """\
neutrals    file: neutrals.cfg
ions        file: ions.cfg
e           file: electrons.cfg
"""


@pytest.fixture
def benchmark_tree(tmp_path):
    model = tmp_path / "benchmark_model"
    (model / "transport_coefficients").mkdir(parents=True)
    (model / "species").mkdir()
    (model / "speclist.cfg").write_text(SPECLIST)
    for sp, z, mass in [("neutrals", 0, 4.7e-26), ("ions", 1, 4.7e-26),
                        ("electrons", -1, 9.10938356e-31)]:
        (model / "species" / f"{sp}.cfg").write_text(
            f"Z    = {z}\nMass = {mass}\nNmom = 2\n")
    tc = model / "transport_coefficients"
    # Bagheri et al. closed forms (published formulas)
    (tc / "e_Nb.dat").write_text(HEADER.format(dep="fun:E")
                                 + "2.3987*E_m**(-0.26)\n")
    (tc / "e_ND.dat").write_text(HEADER.format(dep="fun:E")
                                 + "4.3628e-3*E_m**(0.22)\n")
    (tc / "ions_Nb.dat").write_text(HEADER.format(dep="const") + "0.0\n")
    (tc / "ions_ND.dat").write_text(HEADER.format(dep="const") + "0.0\n")
    (tc / "neutrals_Nb.dat").write_text(HEADER.format(dep="const") + "0.0\n")
    (tc / "neutrals_ND.dat").write_text(HEADER.format(dep="const") + "0.0\n")
    (tc / "alpha.dat").write_text(
        HEADER.format(dep="fun:E")
        + "(1.1944e6 + 4.3666e26 * E_m**(-3))*exp(-2.73e7/E_m)-340.75\n")
    return tmp_path


def test_from_file_input_runs(benchmark_tree):
    m = StreamerModel.from_file_input(benchmark_tree, nx=10, ny=14)
    assert m.SIGN == (1.0, -1.0)  # LFA dropped the neutrals
    st = m.initial_state()
    d = m.make_driver()
    st = d.advance(st, {})
    assert st.n_accepted == 1
    assert np.isfinite(np.asarray(st.u)).all()
    # the compiled expressions match the built-in defaults numerically
    import jax.numpy as jnp

    E = jnp.asarray(2.5e6)
    assert float(m._mu_e(E_m=E)) == pytest.approx(
        2.3987 * 2.5e6 ** (-0.26), rel=1e-12)
    assert float(m._alpha(E_m=E)) == pytest.approx(
        (1.1944e6 + 4.3666e26 * 2.5e6**-3) * np.exp(-2.73e7 / 2.5e6)
        - 340.75, rel=1e-12)
