"""Standalone parity components from SURVEY.md section 2 that are not
exercised through the model paths."""

import numpy as np
import jax.numpy as jnp
import pytest

from fedm_tpu.model.approximation import modify_approximation_vars
from fedm_tpu.model.forms import Max, Min, boundary_flux
from fedm_tpu.fem import FunctionSpace, CellBatch, FacetBatch
from fedm_tpu.fem.postprocess import normal_vector, boundary_gradient
from fedm_tpu.mesh import rectangle_mesh, interval_mesh, mark_boundaries
from fedm_tpu.mesh.io_xml import read_dolfin_xml, write_dolfin_xml
from fedm_tpu.io import output_files, mesh_statistics
from fedm_tpu.solvers.elliptic import solve_poisson


def test_modify_approximation_vars():
    # mirrors the reference's only unit test
    # (tests/unit_tests/functions/test_modify_approximation_vars.py)
    species = ["e-energy", "Ar", "e"]
    masses = [1.0, 2.0, 3.0]
    charges = [0.0, 0.0, -1.0]
    n, neq, sp, m, c = modify_approximation_vars("LFA", 3, species[:],
                                                 masses[:], charges[:])
    assert (n, neq) == (2, 3)
    assert sp == ["Ar", "e"] and m == [2.0, 3.0] and c == [0.0, -1.0]
    n, neq, sp, m, c = modify_approximation_vars("LMEA", 3, species[:],
                                                 masses[:], charges[:])
    assert (n, neq) == (3, 4)
    assert sp == species
    with pytest.raises(ValueError):
        modify_approximation_vars("bogus", 3, species[:], masses[:],
                                  charges[:])


def test_max_min_branch_free():
    a = jnp.asarray([1.0, -2.0, 3.0])
    b = jnp.asarray([0.5, 5.0, 3.0])
    np.testing.assert_allclose(np.asarray(Max(a, b)), [1.0, 5.0, 3.0])
    np.testing.assert_allclose(np.asarray(Min(a, b)), [0.5, -2.0, 3.0])


def test_boundary_flux_dispatch():
    mesh = rectangle_mesh((0, 0), (1, 1), 2, 2)
    space = FunctionSpace(mesh, 1)
    fb = FacetBatch(space)
    u_q = jnp.zeros((fb.scale.shape[0], fb.n_q))
    mu_q = jnp.ones_like(u_q)
    En_q = jnp.full_like(u_q, 2.0)
    # zero flux contributes nothing regardless of other args
    assert boundary_flux(fb, "zero flux", "drift-diffusion-reaction",
                         "Heavy", 1.0, mu_q, En_q, u_q, 0.0) == 0.0
    # Neumann + non-drift equation falls through to 0 (reference behaviour)
    assert boundary_flux(fb, "Neumann", "diffusion-reaction", "Heavy",
                         1.0, mu_q, En_q, u_q, 0.0) == 0.0
    # Neumann drift: sign*mu*(E.n)*e^u
    got = boundary_flux(fb, "Neumann", "drift-diffusion-reaction",
                        "electrons", -1.0, mu_q, En_q, u_q, 0.0)
    np.testing.assert_allclose(np.asarray(got), -2.0)
    # flux source, heavy ddr: (1-r)/(1+r)(0.5 vth + |mu E.n|)e^u
    got = boundary_flux(fb, "flux source", "drift-diffusion-reaction",
                        "Heavy", 1.0, mu_q, En_q, u_q, gamma=0.0,
                        r_coeff=0.5, vth=4.0)
    np.testing.assert_allclose(np.asarray(got), (0.5 / 1.5) * (2.0 + 2.0))
    # flux source, electrons: subtract secondary emission
    got = boundary_flux(fb, "flux source", "drift-diffusion-reaction",
                        "electrons", -1.0, mu_q, En_q, u_q, gamma=0.06,
                        r_coeff=0.3, vth=4.0, Ion_flux=10.0)
    expect = (0.7 / 1.3) * (2.0 + 2.0) - 2 * 0.06 * 10.0 / 1.3
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-12)
    # underscored bc_type accepted with correction (reference warns)
    assert boundary_flux(fb, "zero_flux", "reaction", "Heavy", 1.0,
                         mu_q, En_q, u_q, 0.0) == 0.0
    with pytest.raises(ValueError):
        boundary_flux(fb, "bogus", "reaction", "Heavy", 1.0, mu_q, En_q,
                      u_q, 0.0)


def test_normal_vector_projection():
    mesh = rectangle_mesh((0, 0), (1, 1), 6, 6)
    space = FunctionSpace(mesh, 1)
    n = np.asarray(normal_vector(space))
    coords = space.dof_coords
    # consistent-mass projection smears corner normals along the edge with
    # geometric decay (same behaviour as the reference's Normal_vector);
    # away from corners the normal is accurate
    left = np.isclose(coords[:, 0], 0) & (coords[:, 1] > 0.35) & (coords[:, 1] < 0.65)
    np.testing.assert_allclose(n[left], [[-1.0, 0.0]] * left.sum(), atol=0.02)
    top = np.isclose(coords[:, 1], 1) & (coords[:, 0] > 0.35) & (coords[:, 0] < 0.65)
    np.testing.assert_allclose(n[top], [[0.0, 1.0]] * top.sum(), atol=0.02)
    # interior nodes have zero normal
    interior = (coords[:, 0] > 0.01) & (coords[:, 0] < 0.99) & \
        (coords[:, 1] > 0.01) & (coords[:, 1] < 0.99)
    np.testing.assert_allclose(n[interior], 0.0)


def test_boundary_gradient_recovers_linear_field():
    # solve -lap(phi) = 0 with phi = z -> E_n = d(phi)/dn = +1 on top
    mesh = rectangle_mesh((0, 0), (1, 1), 8, 8)
    mark_boundaries(mesh, [
        ["line", 0.0, 0.0, 0.0, 1.0], ["line", 1.0, 1.0, 0.0, 1.0],
        ["line", 0.0, 1.0, 0.0, 0.0], ["line", 0.0, 1.0, 1.0, 1.0]])
    space = FunctionSpace(mesh, 1)
    batch = CellBatch(space, quad_degree=2)
    coords = space.dof_coords
    phi = jnp.asarray(coords[:, 1])
    zeros_q = jnp.zeros_like(batch.scale)
    En = boundary_gradient(batch, space, phi, zeros_q, extract_markers=[2],
                           epsilon=1.0, quad_degree=2)
    top = np.isclose(coords[:, 1], 1.0)
    np.testing.assert_allclose(np.asarray(En)[top], -1.0, atol=1e-8)


def test_dolfin_xml_roundtrip(tmp_path):
    mesh = rectangle_mesh((0, 0), (2, 1), 3, 2, "crossed")
    write_dolfin_xml(tmp_path / "m.xml", mesh)
    got = read_dolfin_xml(tmp_path / "m.xml")
    np.testing.assert_allclose(got.coords, mesh.coords)
    np.testing.assert_array_equal(got.cells, mesh.cells)
    m1 = interval_mesh(4, 0, 1)
    write_dolfin_xml(tmp_path / "i.xml", m1)
    got = read_dolfin_xml(tmp_path / "i.xml")
    assert got.dim == 1 and got.n_cells == 4


def test_output_files_factory_and_mesh_statistics(tmp_path):
    mesh = rectangle_mesh((0, 0), (1, 1), 2, 2)
    w = output_files("pvd", "number density", ["electrons", "ions"],
                     output_dir=tmp_path)
    assert len(w) == 2
    w[0].write(mesh, np.zeros(mesh.n_verts), 0.0)
    assert (tmp_path / "number density" / "electrons" / "electrons.pvd").exists()
    wx = output_files("xdmf", "number density", ["Ar"], mesh=mesh,
                      output_dir=tmp_path)
    wx[0].write_checkpoint(np.ones(mesh.n_verts), 0.0)
    assert (tmp_path / "number density" / "Ar" / "Ar.h5").exists()
    with pytest.raises(ValueError):
        output_files("csv", "x", ["y"], output_dir=tmp_path)
    info = mesh_statistics(mesh, output_dir=tmp_path)
    assert "Number of elements is: 8" in info
    assert (tmp_path / "mesh" / "mesh info.txt").exists()
