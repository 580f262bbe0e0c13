import numpy as np
import pytest

from fedm_tpu.mesh import rectangle_mesh, interval_mesh
from fedm_tpu.io.vtu import VtuSeriesWriter, write_vtu, read_vtu
from fedm_tpu.io.xdmf import XdmfH5Writer, read_checkpoints
from fedm_tpu.io.output import OutputSeries, file_output
from fedm_tpu.io.checkpoint import save_checkpoint, load_checkpoint
from fedm_tpu.io.files import Files
from fedm_tpu.timestepping.driver import TimeState


def test_vtu_roundtrip(tmp_path):
    mesh = rectangle_mesh((0, 0), (1, 1), 3, 4)
    vals = np.arange(mesh.n_verts, dtype=float) * 0.5
    write_vtu(tmp_path / "a.vtu", mesh, {"density": vals})
    got = read_vtu(tmp_path / "a.vtu", "density")
    np.testing.assert_allclose(got, vals)


def test_vtu_series_and_pvd(tmp_path):
    mesh = interval_mesh(5, 0, 1)
    w = VtuSeriesWriter("electrons", tmp_path)
    for k in range(3):
        w.write(mesh, np.full(mesh.n_verts, float(k)), t=k * 1e-9)
    pvd = (tmp_path / "electrons" / "electrons.pvd").read_text()
    assert pvd.count("<DataSet") == 3
    assert "electrons000002.vtu" in pvd
    got = read_vtu(tmp_path / "electrons" / "electrons000001.vtu", "electrons")
    np.testing.assert_allclose(got, 1.0)


def test_xdmf_h5_layout_matches_reference_reader(tmp_path):
    """The h5 must satisfy the reference's read pattern
    h5[key][subkey]['vector'] (testing_utils.py:22-25)."""
    import h5py

    mesh = rectangle_mesh((0, 0), (1, 1), 2, 2)
    w = XdmfH5Writer("Ar_plus", tmp_path, mesh=mesh)
    for k in range(2):
        w.write_checkpoint(np.full(mesh.n_verts, k + 1.0), t=k * 0.1)
    with h5py.File(tmp_path / "Ar_plus" / "Ar_plus.h5") as h5:
        subkeys = list(h5["Ar_plus"])
        vecs = [np.asarray(h5["Ar_plus"][s]["vector"]) for s in subkeys]
    assert len(vecs) == 2
    got = read_checkpoints(tmp_path / "Ar_plus" / "Ar_plus.h5", "Ar_plus")
    np.testing.assert_allclose(got[1], 2.0)
    assert (tmp_path / "Ar_plus" / "Ar_plus.xdmf").exists()


def test_file_output_interpolates_and_switches_cadence(tmp_path):
    mesh = interval_mesh(3, 0, 1)
    writer = XdmfH5Writer("n", tmp_path, mesh=mesh)
    series = [OutputSeries(writer, lambda u: u, kind="xdmf")]
    t_out_list = [4e-9, 1e-8]
    step_list = [1e-9, 4e-9]
    # step from t_old=0 (u=0) to t=2.5e-9 (u=2.5): outputs at 1e-9 and 2e-9
    u_old = np.zeros(mesh.n_verts)
    u_new = np.full(mesh.n_verts, 2.5)
    t_out, step = file_output(2.5e-9, 0.0, 1e-9, 1e-9, t_out_list, step_list,
                              series, u_new, u_old, unit="s")
    snaps = read_checkpoints(tmp_path / "n" / "n.h5", "n")
    assert len(snaps) == 2
    np.testing.assert_allclose(snaps[0], 1.0)  # linear interp at t=1e-9
    np.testing.assert_allclose(snaps[1], 2.0)
    assert t_out == pytest.approx(3e-9)
    # cadence switches to step_list[i] once t_out crosses 0.999*t_out_list[i]
    # (reference thresholds, file_io.py:610-613)
    u_old2, u_new2 = u_new, np.full(mesh.n_verts, 6.0)
    t_out, step = file_output(1.05e-8, 2.5e-9, t_out, step, t_out_list,
                              step_list, series, u_new2, u_old2, unit="s")
    assert step == 4e-9


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    st = TimeState(u=jnp.ones((5, 2)), u_old=jnp.zeros((5, 2)),
                   u_old1=jnp.full((5, 2), 2.0), t=1e-9, dt=1e-12,
                   dt_old=2e-12, max_error=[1e-4, 2e-4, 3e-4],
                   n_accepted=7, n_rejected=2)
    save_checkpoint(tmp_path / "ck.npz", st)
    got = load_checkpoint(tmp_path / "ck.npz")
    np.testing.assert_allclose(np.asarray(got.u), 1.0)
    assert got.t == 1e-9 and got.dt == 1e-12 and got.dt_old == 2e-12
    assert got.max_error == [1e-4, 2e-4, 3e-4]
    assert got.n_accepted == 7 and got.n_rejected == 2


def test_files_singleton_semantics(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    f = Files()
    with pytest.raises(RuntimeError):
        f.file_input = tmp_path / "missing"
    out = tmp_path / "out"
    f.output_folder_path = out
    assert out.is_dir()
    # error file truncated once per run, then appendable
    p = f.error_file
    assert p.exists() and p.read_text() == ""
    p.write_text("data")
    assert f.error_file.read_text() == "data"  # second access: no truncate
    assert f.model_log.name == "model.log"
