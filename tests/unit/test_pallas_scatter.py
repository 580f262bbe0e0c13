"""Pallas ELL-scatter kernel: interpreter-mode correctness + backend probe."""

import numpy as np
import jax.numpy as jnp

from fedm_tpu.ops.pallas_scatter import (pallas_ell_scatter,
                                         pallas_scatter_supported)


def test_interpret_mode_matches_reference():
    rng = np.random.default_rng(0)
    n_flat, n_dofs, val = 301, 100, 7
    flat = np.concatenate([rng.standard_normal(n_flat), [0.0]])
    idx = rng.integers(0, n_flat, (n_dofs, val))
    # sprinkle sentinel entries (padding)
    idx[rng.random((n_dofs, val)) < 0.2] = n_flat
    out = pallas_ell_scatter(jnp.asarray(flat, jnp.float32),
                             jnp.asarray(idx, jnp.int32), tile=32,
                             interpret=True)
    ref = flat[idx].sum(axis=1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_backend_probe_is_safe():
    # must never raise, whatever the backend supports
    assert pallas_scatter_supported() in (True, False)
