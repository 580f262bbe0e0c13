"""Parsers + coefficient machinery + source terms, against synthesized
input trees in the reference's on-disk formats (SURVEY.md section 2,
components 21-25)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fedm_tpu.chemistry import (
    read_speclist, reaction_matrices, rate_coefficient_file_names,
    read_energy_loss, read_transport_coefficients, read_particle_properties,
    read_rate_coefficients, read_dependences,
    reaction_rates, species_sources, energy_source_factors,
    Coefficient, RateCoefficients,
)
from fedm_tpu.ops.exprs import compile_expression, ExpressionError

SPECLIST = """\
# species list
Ar[1p0]   file: Ar_1p0.cfg
Ar[*]     file: Ar_star.cfg
Ar[+]     file: Ar_plus.cfg
e         file: electrons.cfg

nInd = [0, 1]
iInd = 2
eInd = 3
"""

REACSCHEME = """\
# 3 level argon model
Ar[1p0] + e   -> Ar[*] + e              Type: ex    Uin: 11.55   Qfile: Q1.dat  kfile: k_001.dat
Ar[1p0] + e   -> Ar[+] + e + e          Type: io    Uin: 15.76   Qfile: Q2.dat  kfile: k_002.dat
Ar[*] + e     -> Ar[1p0] + e            Type: deex  Uin: -11.55  Qfile: Q3.dat  kfile: k_003.dat
Ar[*] + Ar[*] -> Ar[+] + e + Ar[1p0]    Type: chio  Uin: -7.34   Qfile: Q5.dat  kfile: k_005.dat
Ar[*]         -> 0                      Type: loss  Uin: 0       Qfile: Q6.dat  kfile: k_lifetime.dat
"""

LUT = """\
# Description: rate coefficient
# Dependence:  Umean
1.0   0.0
2.0   1.0
4.0   5.0
"""

CONST_DAT = """\
# Dependence:  const
2.5e5
"""


@pytest.fixture
def input_tree(tmp_path):
    model = tmp_path / "argon"
    (model / "rate_coefficients").mkdir(parents=True)
    (model / "transport_coefficients").mkdir()
    (model / "species").mkdir()
    (model / "speclist.cfg").write_text(SPECLIST)
    (model / "reacscheme.cfg").write_text(REACSCHEME)
    for name in ["k_001.dat", "k_002.dat", "k_003.dat", "k_005.dat"]:
        (model / "rate_coefficients" / name).write_text(LUT)
    (model / "rate_coefficients" / "k_lifetime.dat").write_text(CONST_DAT)
    for sp, (z, m) in {
        "Ar_1p0": (0, 6.63352088e-26), "Ar_star": (0, 6.63352088e-26),
        "Ar_plus": (1, 6.63352032e-26), "electrons": (-1, 9.10938356e-31),
    }.items():
        (model / "species" / f"{sp}.cfg").write_text(
            f"Z    = {z}\nMass = {m}\nNmom = 2\n")
    # transport: diffusion for all, mobility only for ion + electrons
    for sp in ["Ar_1p0", "Ar_star", "Ar_plus", "electrons"]:
        (model / "transport_coefficients" / f"{sp}_ND.dat").write_text(
            "# Dependence:  const\n1.0e22\n")
    (model / "transport_coefficients" / "Ar_plus_Nb.dat").write_text(
        "# Dependence:  E/N\n1.0 1e24\n100.0 5e24\n")
    (model / "transport_coefficients" / "electrons_Nb.dat").write_text(
        "# Dependence:  Umean\n1.0 1e25\n10.0 2e25\n")
    return tmp_path, model


def test_read_speclist(input_tree):
    _, model = input_tree
    n, names, prop_files, tc = read_speclist(model)
    assert n == 4
    assert names == ["Ar[1p0]", "Ar[*]", "Ar[+]", "e"]
    assert prop_files == ["Ar_1p0.cfg", "Ar_star.cfg", "Ar_plus.cfg",
                          "electrons.cfg"]
    assert tc == ["Ar_1p0", "Ar_star", "Ar_plus", "electrons"]


def test_reaction_matrices(input_tree):
    _, model = input_tree
    species = ["Ar[1p0]", "Ar[*]", "Ar[+]", "e"]
    P, L, G = reaction_matrices(model, species)
    # reaction 0: Ar + e -> Ar* + e : power counts loss side
    np.testing.assert_array_equal(P[0], [1, 0, 0, 1])
    np.testing.assert_array_equal(L[0], [1, 0, 0, 0])
    np.testing.assert_array_equal(G[0], [0, 1, 0, 0])
    # reaction 1: Ar + e -> Ar+ + 2e : gains one e and one ion
    np.testing.assert_array_equal(L[1], [1, 0, 0, 0])
    np.testing.assert_array_equal(G[1], [0, 0, 1, 1])
    # reaction 3: Ar* + Ar* -> Ar+ + e + Ar : second order in Ar*
    np.testing.assert_array_equal(P[3], [0, 2, 0, 0])
    np.testing.assert_array_equal(L[3], [0, 2, 0, 0])
    np.testing.assert_array_equal(G[3], [1, 0, 1, 1])
    # reaction 4: Ar* -> 0 : pure loss
    np.testing.assert_array_equal(L[4], [0, 1, 0, 0])
    np.testing.assert_array_equal(G[4], [0, 0, 0, 0])


def test_rate_files_energy_loss_and_tables(input_tree):
    _, model = input_tree
    k_files = rate_coefficient_file_names(model)
    assert [f.name for f in k_files] == [
        "k_001.dat", "k_002.dat", "k_003.dat", "k_005.dat", "k_lifetime.dat"]
    u_loss = read_energy_loss(model)
    assert u_loss == [11.55, 15.76, -11.55, -7.34, 0.0]
    deps = read_dependences(k_files)
    assert deps == ["Umean", "Umean", "Umean", "Umean", "const"]
    kxs, kys = read_rate_coefficients(k_files, deps)
    np.testing.assert_allclose(kxs[0], [1.0, 2.0, 4.0])
    assert kys[4] == 2.5e5


def test_transport_coefficients_missing_mobility(input_tree):
    tmp, model = input_tree
    names = ["Ar_1p0", "Ar_star", "Ar_plus", "electrons"]
    kx, ky, deps = read_transport_coefficients(
        names, "mobility", "argon", file_input=tmp)
    assert deps == [0, 0, "E/N", "Umean"]  # missing files tolerated as 0
    kx, ky, deps = read_transport_coefficients(
        names, "Diffusion", "argon", file_input=tmp)
    assert deps == ["const"] * 4
    # diffusion without the file raises
    with pytest.raises(FileNotFoundError):
        read_transport_coefficients(["missing"], "Diffusion", "argon",
                                    file_input=tmp)


def test_particle_properties(input_tree):
    tmp, model = input_tree
    M, Z = read_particle_properties(
        ["Ar_plus.cfg", "electrons.cfg"], "argon", file_input=tmp)
    assert Z == [1.0, -1.0]
    assert M == [6.63352032e-26, 9.10938356e-31]


def test_coefficient_dependences():
    like = jnp.ones(5)
    energy = jnp.asarray([1.0, 1.5, 2.0, 3.0, 4.0])
    c = Coefficient("Umean", [1.0, 2.0, 4.0], [0.0, 1.0, 5.0], kind="rate")
    got = c.evaluate(energy=energy)
    np.testing.assert_allclose(np.asarray(got), [0.0, 0.5, 1.0, 3.0, 5.0])
    # transport scales by 1/N0
    ct = Coefficient("const", 0.0, 1e24, kind="transport")
    assert float(ct.evaluate(N0=1e22, like=like)[0]) == pytest.approx(100.0)
    # ESR: Einstein relation
    mu = jnp.full(5, 0.3)
    ce = Coefficient("ESR", kind="transport")
    got = ce.evaluate(Tgas=300.0, mu=mu)
    from fedm_tpu.constants import kB, elementary_charge
    np.testing.assert_allclose(np.asarray(got), kB * 300.0 * 0.3 /
                               elementary_charge)
    # table_gradient preserves transport scaling
    cg = Coefficient("Umean", [1.0, 2.0, 3.0], [2.0, 4.0, 6.0],
                     kind="transport").table_gradient()
    np.testing.assert_allclose(
        np.asarray(cg.evaluate(N0=2.0, energy=jnp.asarray([1.5]))), [1.0])


def test_sources_match_bruteforce():
    rng = np.random.default_rng(0)
    n_r, n_sp, n_pts = 5, 4, 7
    P = rng.integers(0, 3, (n_r, n_sp))
    L = rng.integers(0, 2, (n_r, n_sp))
    G = rng.integers(0, 2, (n_r, n_sp))
    k = rng.random((n_pts, n_r))
    n = rng.random((n_pts, n_sp)) + 0.5
    rates = reaction_rates(jnp.asarray(k), P, jnp.log(jnp.asarray(n)))
    expect = k * np.prod(n[:, None, :] ** P[None], axis=-1)
    np.testing.assert_allclose(np.asarray(rates), expect, rtol=1e-12)
    f = species_sources(rates, L, G)
    expect_f = np.einsum("pr,rs->ps", expect, (G - L))
    np.testing.assert_allclose(np.asarray(f), expect_f, rtol=1e-12)


def test_energy_source_sentinels():
    me = jnp.asarray([2.0, 3.0])
    u_loss = [11.55, 7.5e77, 9.5e99, 1.0]
    fac = energy_source_factors(u_loss, me, Ei=15.76)
    np.testing.assert_allclose(np.asarray(fac[:, 0]), 11.55)
    np.testing.assert_allclose(np.asarray(fac[:, 1]), 15.76 - np.asarray(me))
    np.testing.assert_allclose(np.asarray(fac[:, 2]), np.asarray(me))
    np.testing.assert_allclose(np.asarray(fac[:, 3]), 1.0)


def test_expression_compiler_streamer_forms():
    mu = compile_expression("2.3987*E_m**(-0.26)")
    got = float(mu(E_m=jnp.asarray(1e6)))
    assert got == pytest.approx(2.3987 * 1e6 ** (-0.26), rel=1e-12)
    alpha = compile_expression(
        "(1.1944e6 + 4.3666e26 * E_m**(-3))*exp(-2.73e7/E_m)-340.75")
    e = 5e6
    expect = (1.1944e6 + 4.3666e26 * e**-3) * np.exp(-2.73e7 / e) - 340.75
    assert float(alpha(E_m=jnp.asarray(e))) == pytest.approx(expect, rel=1e-12)


def test_expression_compiler_rejects_malicious():
    for bad in [
        "__import__('os').system('rm -rf /')",
        "open('/etc/passwd')",
        "(lambda: 1)()",
        "x.mean()",
        "[1,2,3]",
    ]:
        with pytest.raises(ExpressionError):
            compile_expression(bad)


def test_elecdist_rate_coefficient_evaluates():
    # ElecDist: parsed as a two-column table by the reference
    # (file_io.py:374) but unusable at runtime there (functions.py:698);
    # here it interpolates on the mean electron energy
    import jax.numpy as jnp
    from fedm_tpu.chemistry.coefficients import Coefficient

    kx = jnp.asarray([0.0, 1.0, 2.0, 4.0])
    ky = jnp.asarray([0.0, 2.0, 4.0, 8.0])
    c = Coefficient("ElecDist", kx, ky, kind="rate")
    en = jnp.asarray([0.5, 3.0])
    out = np.asarray(c.evaluate(energy=en))
    np.testing.assert_allclose(out, [1.0, 6.0], rtol=1e-12)
