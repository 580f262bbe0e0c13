"""BASELINE.json configuration #5: an extended reaction scheme with TENS
of species, built by the generic model builder and STEPPED SHARDED over
the 8-virtual-device mesh.

The reference's promise (and this framework's) is that the discretised
equations are GENERATED from the parsed chemistry; the scale-out payoff
is running a tens-of-species tree distributed. 18 species = 19 coupled
equations per node through `models.generic.PlasmaModel` +
`PlasmaModel.distribute` (DOF-partitioned DD, ppermute halos).
"""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from fedm_tpu.models.argon_synth import generate_argon_n_input
from fedm_tpu.models.generic import PlasmaConfig, PlasmaModel


@pytest.fixture(scope="module")
def model18(tmp_path_factory):
    base = tmp_path_factory.mktemp("argon18_input")
    generate_argon_n_input(base, n_excited=13)
    cfg = PlasmaConfig(model="argon_synth18", file_input=base, nx=8, ny=8,
                       mg_levels=0, quad_degree=2)
    return PlasmaModel(cfg)


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), ("space",))


def test_metadata(model18):
    m = model18
    assert m.n_species == 18 and m.n_eq == 19
    # level names must not alias in the substring-count convention
    assert m.species[1] == "Ar[L01]"
    assert m.species_types[-1] == "electrons"
    # every level got excitation + stepwise-ionisation + deexcitation +
    # loss, plus the 7 shared reactions and the elastic channel
    assert m.P_mat.shape == (4 * 13 + 7 + 1, 18)


def test_extended_scheme_steps_sharded(model18):
    m = model18
    mesh = _mesh(8)
    dsys = m.distribute(mesh)
    driver = m.make_driver()
    state = m.initial_state()
    assert len(state.u.sharding.device_set) == 8
    for _ in range(3):
        aux = m._update_aux_jit(state.u)
        state = driver.advance(state, aux)
    assert state.n_accepted == 3
    u = np.asarray(dsys.from_dist(state.u))
    assert np.isfinite(u).all()
    # 18 species alive: electron density positive, energy finite
    eps = np.exp(u[:, 0] - u[:, m.ie])
    assert (eps > 0).all() and np.isfinite(eps).all()
