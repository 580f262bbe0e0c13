"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths run without TPU hardware (SURVEY.md section 4: the upgrade
over the reference's untested MPI path)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
