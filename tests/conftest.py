"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths run without TPU hardware (SURVEY.md section 4: the upgrade
over the reference's untested MPI path).

Gotchas this file works around:
- installed pytest plugins (jaxtyping) import jax during plugin load,
  BEFORE conftest runs — env-var-backed jax configs are already frozen, so
  the platform must be forced via jax.config.update (valid until the first
  backend initialisation);
- the ambient environment pins JAX_PLATFORMS to a TPU backend ('axon');
- XLA_FLAGS is read at backend init, so setting it here is still in time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_collection_modifyitems(config, items):
    """Tiering: everything under tests/verification and tests/parallel is
    compile-heavy (whole-model fixtures, minutes each) and marked `slow`;
    `./run_tests.sh` runs the quick tier (`-m "not slow"`), `--all` the full
    suite. Individual unit tests can also opt in with
    @pytest.mark.slow."""
    import pytest

    for item in items:
        p = str(item.fspath)
        if "/verification/" in p or "/parallel/" in p:
            item.add_marker(pytest.mark.slow)
