"""Coupled transient system: residual/Jacobian/preconditioner automation.

This is the TPU-native counterpart of the reference's "coupled approach":
all equations (energy + species + Poisson) in one mixed space solved
monolithically each step (`examples/glow_discharge/fedm-gd.py:344-413`).
The state is a dense `u[n_dofs, n_eq]` array; a model contributes

  cell_kernel(batch, u_e, ctx)  -> [n_cells, n_local, n_eq]
  facet kernels (per marked boundary)
                                -> [n_f, n_local, n_eq]

written with the building blocks in `forms.py`. From those kernels this
class derives, automatically via autodiff:

- the global residual (gather -> kernel -> segment_sum scatter, Dirichlet
  rows masked to u - g),
- the Jacobian action (`jax.linearize` in the Newton solver — the analog of
  the reference's symbolic `derivative(F, u_new, u)`, `fedm-gd.py:402`),
- a node-block Jacobi preconditioner: the exact per-dof n_eq x n_eq
  diagonal blocks of the Jacobian, assembled by pushing the local tangent
  basis through the kernels with vmapped `jax.jvp`. This captures the stiff
  local chemistry/time coupling that makes the reference lean on MUMPS
  (SURVEY.md "hard parts") while staying matrix-free on TPU.

`ctx` passed to kernels contains gathered history/auxiliary fields (any aux
entry shaped [n_dofs, ...] is gathered per batch; everything else passes
through) plus scalar step parameters under 'params'.
"""

from __future__ import annotations

from typing import Callable, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..fem.assembly import CellBatch, FacetBatch
from ..fem.dirichlet import BCSet
from ..solvers.newton import NewtonConfig, newton_krylov

Array = jax.Array


class StepParams(NamedTuple):
    """Scalar step parameters (all jit-traced: changing dt does not
    recompile, SURVEY.md 'hard parts' / dynamic control flow)."""

    t: Array
    dt: Array
    dt_old: Array


class CoupledSystem:
    def __init__(
        self,
        cell_batch: CellBatch,
        n_eq: int,
        bcs: BCSet,
        newton: NewtonConfig = NewtonConfig(),
        use_block_precond: bool = True,
    ):
        self.cell_batch = cell_batch
        self.n_eq = n_eq
        self.n_dofs = cell_batch.n_dofs
        self.bcs = bcs
        self.newton = newton
        self.use_block_precond = use_block_precond
        self.cell_kernel: Optional[Callable] = None
        self.facet_kernels: List[Tuple[FacetBatch, Callable]] = []
        self._step_jit = None
        self.spmd: Optional[Tuple] = None  # (jax Mesh, axis name)

    def set_cell_kernel(self, fn: Callable) -> None:
        self.cell_kernel = fn

    def add_facet_kernel(self, batch: FacetBatch, fn: Callable) -> None:
        self.facet_kernels.append((batch, fn))

    # -- context ------------------------------------------------------------

    def _make_ctx(self, batch, u_old, u_old1, aux: Dict, params: StepParams):
        def maybe_gather(v):
            if isinstance(v, jax.Array) and v.ndim >= 1 and v.shape[0] == self.n_dofs:
                return batch.gather(v)
            return v

        ctx = {name: maybe_gather(v) for name, v in aux.items()}
        ctx["u_old"] = batch.gather(u_old)
        ctx["u_old1"] = batch.gather(u_old1)
        ctx["params"] = params
        return ctx

    def _batches(self):
        yield self.cell_batch, self.cell_kernel
        yield from self.facet_kernels

    # -- multi-chip sharding ------------------------------------------------

    def shard(self, device_mesh, axis: str = "space") -> None:
        """Distribute element/facet work over `device_mesh[axis]` — the
        TPU-native replacement for the reference's MPI mesh partitioning
        (SURVEY.md section 2.4): per-cell data is sharded along the leading
        axis, the state stays replicated, and assembly becomes local
        segment-sums + one psum over the axis. Collectives ride ICI; the
        Krylov/Newton iterations outside operate on replicated arrays."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = device_mesh.shape[axis]
        for batch, _ in self._batches():
            batch.pad_to(n_dev)
            sharded = tuple(
                jax.device_put(a, NamedSharding(device_mesh, P(axis)))
                for a in batch.shard_arrays()
            )
            batch.local_view(*sharded)  # validate shapes
            for f, a in zip(batch.SHARD_FIELDS, sharded):
                setattr(batch, f, a)
        self.spmd = (device_mesh, axis)
        self._step_jit = None

    def _assemble(self, u, u_old, u_old1, aux: Dict, params: StepParams):
        """Raw (un-BC'd) residual assembly over all batches; SPMD-aware."""
        if self.spmd is None:
            out = jnp.zeros((self.n_dofs, self.n_eq), u.dtype)
            for batch, kernel in self._batches():
                ctx = self._make_ctx(batch, u_old, u_old1, aux, params)
                out = out + batch.scatter(kernel(batch, batch.gather(u), ctx))
            return out

        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        device_mesh, axis = self.spmd
        batches = list(self._batches())
        flat_arrays, array_specs, counts = [], [], []
        for batch, _ in batches:
            arrs = batch.shard_arrays()
            flat_arrays += list(arrs)
            array_specs += [P(axis)] * len(arrs)
            counts.append(len(arrs))

        def body(u, u_old, u_old1, aux, params, *arrays):
            out = jnp.zeros((self.n_dofs, self.n_eq), u.dtype)
            i = 0
            for (batch, kernel), c in zip(batches, counts):
                local = batch.local_view(*arrays[i : i + c])
                i += c
                ctx = self._make_ctx_local(local, u_old, u_old1, aux, params)
                out = out + local.scatter(kernel(local, local.gather(u), ctx))
            return jax.lax.psum(out, axis)

        fn = shard_map(
            body, mesh=device_mesh,
            in_specs=(P(), P(), P(), P(), P(), *array_specs),
            out_specs=P(),
        )
        return fn(u, u_old, u_old1, aux, params, *flat_arrays)

    def _make_ctx_local(self, batch, u_old, u_old1, aux, params):
        return self._make_ctx(batch, u_old, u_old1, aux, params)

    # -- residual -----------------------------------------------------------

    def make_residual_fn(self, u_old, u_old1, aux: Dict, params: StepParams):
        g = self.bcs.values(params.t)

        def F(u):
            out = self._assemble(u, u_old, u_old1, aux, params)
            return self.bcs.apply_to_residual(out, u, g)

        return F

    def residual(self, u, u_old, u_old1, aux: Dict, params: StepParams):
        return self.make_residual_fn(u_old, u_old1, aux, params)(u)

    # -- node-block Jacobi preconditioner ------------------------------------

    def _jacobian_blocks(self, u, u_old, u_old1, aux, params):
        """Exact per-dof diagonal blocks B[n, i, j] = dF_i/du_j at dof n;
        SPMD-aware like `_assemble`."""
        if self.spmd is not None:
            from jax.sharding import PartitionSpec as P
            from jax import shard_map

            device_mesh, axis = self.spmd
            batches = list(self._batches())
            flat_arrays, array_specs, counts = [], [], []
            for batch, _ in batches:
                arrs = batch.shard_arrays()
                flat_arrays += list(arrs)
                array_specs += [P(axis)] * len(arrs)
                counts.append(len(arrs))

            def body(u, u_old, u_old1, aux, params, *arrays):
                local_batches = []
                i = 0
                for (batch, kernel), c in zip(batches, counts):
                    local_batches.append(
                        (batch.local_view(*arrays[i : i + c]), kernel))
                    i += c
                blocks = self._local_blocks(
                    local_batches, u, u_old, u_old1, aux, params)
                return jax.lax.psum(blocks, axis)

            blocks = shard_map(
                body, mesh=device_mesh,
                in_specs=(P(), P(), P(), P(), P(), *array_specs),
                out_specs=P(),
            )(u, u_old, u_old1, aux, params, *flat_arrays)
        else:
            blocks = self._local_blocks(
                list(self._batches()), u, u_old, u_old1, aux, params)
        # Dirichlet rows -> identity rows
        eye_rows = jnp.eye(self.n_eq, dtype=u.dtype)[None]
        return jnp.where(self.bcs.mask[:, :, None], eye_rows, blocks)

    def _local_blocks(self, batches, u, u_old, u_old1, aux, params):
        blocks = jnp.zeros((self.n_dofs, self.n_eq, self.n_eq), u.dtype)
        for batch, kernel in batches:
            ctx = self._make_ctx(batch, u_old, u_old1, aux, params)
            u_e = batch.gather(u)
            n_local = u_e.shape[1]
            basis = jnp.eye(n_local * self.n_eq, dtype=u.dtype).reshape(
                -1, n_local, self.n_eq
            )

            def push(tan, u_e=u_e, batch=batch, kernel=kernel, ctx=ctx):
                f = lambda ue: kernel(batch, ue, ctx)
                return jax.jvp(
                    f, (u_e,), (jnp.broadcast_to(tan, u_e.shape),)
                )[1]

            J = jax.vmap(push)(basis)  # [nl*ne, n_elems, nl, ne]
            J = J.reshape(n_local, self.n_eq, -1, n_local, self.n_eq)
            # keep only same-local-node blocks: [n_elems, nl, ne_out, ne_in]
            diag = jnp.stack(
                [J[a, :, :, a, :] for a in range(n_local)], axis=0
            ).transpose(2, 0, 3, 1)
            flat = diag.reshape(-1, self.n_eq, self.n_eq)
            blocks = blocks + jax.ops.segment_sum(
                flat, batch.dofs.reshape(-1), num_segments=self.n_dofs
            )
        return blocks

    def block_precond_builder(self, u_old, u_old1, aux, params):
        from ..solvers.precond import block_apply, invert_blocks

        def build(u):
            blocks = self._jacobian_blocks(u, u_old, u_old1, aux, params)
            inv = invert_blocks(blocks)
            return lambda r: block_apply(inv, r)

        return build

    # -- one attempted BDF step ---------------------------------------------

    def _step(self, u_guess, u_old, u_old1, aux, params: StepParams):
        F = self.make_residual_fn(u_old, u_old1, aux, params)
        pb = (
            self.block_precond_builder(u_old, u_old1, aux, params)
            if self.use_block_precond
            else None
        )
        return newton_krylov(F, u_guess, self.newton, pb)

    def step(self, u_guess, u_old, u_old1, aux, params: StepParams):
        """One attempted nonlinear solve at (t, dt). Jitted on first call;
        dt/dt_old/t are traced so the adaptive driver never recompiles."""
        if self._step_jit is None:
            self._step_jit = jax.jit(self._step)
        return self._step_jit(u_guess, u_old, u_old1, aux, params)
