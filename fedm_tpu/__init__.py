"""fedm_tpu — a TPU-native plasma fluid-Poisson modelling framework.

A ground-up JAX/XLA re-design of the capabilities of FEDM (Finite Element
Discharge Modelling; Jovanovic, Loffhagen, Becker, PSST 32 044003 (2023)):
automated generation of discretised residuals for Poisson's equation coupled
to an arbitrary number of particle balance equations, source terms built from
parsed chemical reaction schemes, and stiff variable-step BDF2 time
integration with PID step-size control.

Where the reference (/root/reference) stacks pure Python on FEniCS/PETSc/MUMPS
with MPI domain decomposition, this framework is array-native:

- the state is a dense ``u[n_dofs, n_eq]`` array (log-densities + potential),
- element residual kernels are jitted JAX functions (gather -> einsum ->
  segment_sum) differentiated with ``jax.jvp`` for Newton-Krylov,
- transport/rate coefficients live on device (``jnp.interp`` lookups fused
  into the residual),
- multi-chip scaling shards mesh cells over a ``jax.sharding.Mesh`` with XLA
  collectives instead of MPI ghost exchange.

Float64 is enabled at import (the physics spans ~e13..e19 m^-3 even in log
form, and the reference stack is float64 throughout); set environment
variable ``FEDM_TPU_NO_X64=1`` before import to opt out (e.g. for bf16/f32
performance experiments on TPU).
"""

import os

import jax

# Backend override that actually works under the axon sitecustomize: the
# ambient environment pins JAX_PLATFORMS to the tunneled TPU backend and a
# site hook re-registers it at interpreter start, so the env var alone is
# not enough (tests/conftest.py gotcha list). FEDM_TPU_PLATFORM=cpu forces
# the platform via jax.config BEFORE backend initialisation — used to run
# CPU-side tools (e.g. the glow horizon march) concurrently with a TPU job.
if os.environ.get("FEDM_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["FEDM_TPU_PLATFORM"])

if not os.environ.get("FEDM_TPU_NO_X64"):
    jax.config.update("jax_enable_x64", True)

# On TPU, f32 contractions default to bf16 MXU passes; FEM assembly and the
# stiff chemistry are far too cancellation-sensitive for that. Force full
# f32 matmul precision library-wide (the hot einsums have tiny contraction
# dims and never exploit the MXU anyway).
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: the jitted Newton-Krylov step on the
# production meshes costs minutes of compile per (mesh, dtype) — on TPU the
# f64-emulation fallback alone measured 619 s. Caching amortises it across
# process restarts (bench restarts, resumed runs, escalation systems).
# FEDM_TPU_NO_COMPILE_CACHE=1 opts out; FEDM_TPU_COMPILE_CACHE overrides the
# location.
if not os.environ.get("FEDM_TPU_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "FEDM_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "fedm_tpu",
                     "xla_cache"))
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except (OSError, AttributeError):  # read-only FS / older jax: best effort
        pass

from . import constants  # noqa: E402

__version__ = "0.1.0"
__all__ = ["constants"]
