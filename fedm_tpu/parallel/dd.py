"""DOF-partitioned domain decomposition with halo exchange.

The TPU-native counterpart of DOLFIN's distributed mesh + PETSc ghosted
vectors (`/root/reference/fedm/functions.py:621-637`,
SURVEY.md section 2.4): the state, every Krylov vector and the block
preconditioner are sharded over the device mesh — per-device arrays are
1/N-sized — and each residual/Jacobian evaluation exchanges only halo
values with neighbouring shards via `ppermute` (ICI neighbours), instead
of the replicated-state full-field `psum` of `CoupledSystem.shard`.

Layout
------
Cells are partitioned with the native greedy graph-growing partitioner
(`fedm_tpu.native.partition_graph`, the SCOTCH role in DOLFIN). Each dof
is owned by one part (the minimum part index over the cells containing
it). Device-local dof numbering:

  [0, n_own_max)                     owned dofs (padded with phantoms)
  [n_own_max, n_own_max+n_ghost_max) ghost dofs (sorted by global id)
  n_ext-1                            trash row (padded elements scatter
                                     here; reads return 0)

The global distributed state is ``u_dist[N*n_own_max, n_eq]`` with a
``NamedSharding(mesh, P(axis))`` on axis 0 — row ``p*n_own_max + s`` is
owned slot ``s`` of device ``p``. Phantom rows behave like Dirichlet rows
with value 0, so every solver path keeps them exactly zero.

Halo exchange
-------------
For each distinct ring shift ``d`` (owner part -> needing part distance,
usually 1 for a good partition) two index tables are prebuilt, aligned
lane-for-lane on sender and receiver by sorting the shared dofs by global
id:

  forward  (fill ghosts):   payload = own[send_idx];  ppermute(+d);
                            ghosts[recv_idx] = payload
  reverse  (reduce adds):   payload = ghost_contrib[recv_idx] * mask;
                            ppermute(-d);  own[send_idx] += payload

Krylov dot products and norms need no hand-written collectives: the
vectors are jax-sharded arrays, so XLA GSPMD inserts the psum of partial
reductions automatically (scaling-book recipe: annotate shardings, let
XLA place collectives).
"""

from __future__ import annotations

import copy
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..mesh.reorder import cell_adjacency_csr
from ..model.system import CoupledSystem, StepParams
from ..native import partition_graph
from ..solvers.newton import newton_krylov

Array = jax.Array


def _mode_rows(a: np.ndarray, n_parts: int) -> np.ndarray:
    """Row-wise mode of small integer arrays (facet part = majority owner
    of its dofs)."""
    cnt = np.zeros((a.shape[0], n_parts), np.int32)
    rows = np.arange(a.shape[0])
    for j in range(a.shape[1]):
        cnt[rows, a[:, j]] += 1
    return cnt.argmax(axis=1).astype(np.int32)


class DistributedSystem:
    """Drop-in for `CoupledSystem` with 1/N-sized per-device state.

    Same `.step(u_guess, u_old, u_old1, aux, params)` contract, but all
    `[n_dofs, ...]` arrays (state, aux fields) live in the distributed
    layout — convert with `to_dist` / `from_dist`.
    """

    def __init__(self, system: CoupledSystem, device_mesh, axis: str = "space"):
        self.inner = system
        self.device_mesh = device_mesh
        self.axis = axis
        self.n_eq = system.n_eq
        self.newton = system.newton
        self.use_block_precond = system.use_block_precond
        self._step_jit = None

        N = int(device_mesh.shape[axis])
        self.n_parts = N
        n_dofs = system.n_dofs
        batches = list(system._batches())
        if system.spmd is not None:
            raise ValueError("distribute before CoupledSystem.shard/pad_to")

        # -- cell partition + dof ownership (host, once) ---------------------
        mesh = system.cell_batch.space.mesh
        rowptr, colidx = cell_adjacency_csr(mesh)
        cell_part = partition_graph(rowptr, colidx, N)

        cb_dofs = np.asarray(system.cell_batch.dofs)
        owner = np.full(n_dofs, N, np.int32)
        np.minimum.at(owner, cb_dofs.reshape(-1),
                      np.repeat(cell_part, cb_dofs.shape[1]).astype(np.int32))
        owner[owner == N] = 0  # dofs in no cell (cannot happen for P1/P2)

        counts = np.bincount(owner, minlength=N)
        n_own_max = int(counts.max())
        order = np.argsort(owner, kind="stable")
        starts = np.concatenate([[0], np.cumsum(counts)])
        slot = np.empty(n_dofs, np.int64)
        slot[order] = np.arange(n_dofs) - starts[owner[order]]

        self.n_own_max = n_own_max
        self.n_dofs_dist = N * n_own_max
        slot_of = owner.astype(np.int64) * n_own_max + slot
        dist_src = np.full(self.n_dofs_dist, n_dofs, np.int64)
        dist_src[slot_of] = np.arange(n_dofs)
        self._slot_of = slot_of          # global dof -> dist row
        self._dist_src = dist_src        # dist row -> global dof (n_dofs=phantom)

        # -- element parts and per-part ghost sets ---------------------------
        el_parts = []
        for batch, _ in batches:
            if batch is system.cell_batch:
                el_parts.append(np.asarray(cell_part, np.int32))
            else:
                el_parts.append(_mode_rows(owner[np.asarray(batch.dofs)], N))

        ghost: List[np.ndarray] = []
        for p in range(N):
            refs = [np.asarray(b.dofs)[pe == p].ravel()
                    for (b, _), pe in zip(batches, el_parts)]
            refs = (np.unique(np.concatenate(refs)) if any(len(r) for r in refs)
                    else np.zeros(0, np.int64))
            ghost.append(refs[owner[refs] != p].astype(np.int64))
        n_ghost_max = max((len(g) for g in ghost), default=0)
        self.n_ghost_max = int(n_ghost_max)
        self.n_ext = n_own_max + self.n_ghost_max + 1  # + trash row
        trash = self.n_ext - 1

        # -- distributed element batches (reordered by part, padded) ---------
        self._batch_meta = []   # (template, kernel, n_arrays)
        self._batch_arrays: List[Array] = []
        shard_1d = NamedSharding(device_mesh, P(axis))
        for (batch, kernel), pe in zip(batches, el_parts):
            c = np.bincount(pe, minlength=N)
            c_max = max(int(c.max()), 1)
            src = np.full(N * c_max, -1, np.int64)
            ord_el = np.argsort(pe, kind="stable")
            st = np.concatenate([[0], np.cumsum(c)])
            pos = np.arange(len(pe)) - st[pe[ord_el]]
            src[pe[ord_el].astype(np.int64) * c_max + pos] = ord_el
            pad = src < 0
            src_c = np.where(pad, 0, src)
            row_part = np.repeat(np.arange(N), c_max)

            template = copy.copy(batch)
            template.n_dofs = self.n_ext
            template.gather_idx = None
            arrays = []
            for f in batch._SHARD_FIELDS:
                a = np.asarray(getattr(batch, f))[src_c]
                if f == "scale":
                    a = np.where(pad[:, None], 0.0, a)
                elif f == "dofs":
                    gpos = np.empty(a.shape, np.int64)
                    for p in range(N):
                        rows = row_part == p
                        gpos[rows] = np.searchsorted(ghost[p], a[rows])
                    local = np.where(owner[a] == row_part[:, None],
                                     slot[a], n_own_max + gpos)
                    a = np.where(pad[:, None], trash, local).astype(np.int32)
                    template.dofs = jnp.asarray(a)  # for build_scatter_meta
                arrays.append(jax.device_put(
                    jnp.asarray(a, getattr(batch, f).dtype), shard_1d))
            self._batch_meta.append((template, kernel, len(arrays)))
            self._batch_arrays += arrays

        # -- halo-exchange tables ---------------------------------------------
        shared: Dict[tuple, np.ndarray] = {}
        for dst in range(N):
            g = ghost[dst]
            o = owner[g]
            for sp in np.unique(o):
                shared[(int(sp), dst)] = g[o == sp]  # sorted by global id
        self._shifts = []      # (perm_fwd, perm_rev)
        self._shift_arrays = []  # send_idx, recv_idx, recv_mask per shift
        for d in sorted({(dst - sp) % N for (sp, dst) in shared}):
            S = max(len(shared.get((i, (i + d) % N), ())) for i in range(N))
            if S == 0:
                continue
            send = np.zeros((N, S), np.int32)
            recv = np.full((N, S), self.n_ghost_max, np.int32)
            mask = np.zeros((N, S), np.float64)
            for i in range(N):
                lst = shared.get((i, (i + d) % N))
                if lst is not None and len(lst):
                    send[i, :len(lst)] = slot[lst]
                lst2 = shared.get(((i - d) % N, i))
                if lst2 is not None and len(lst2):
                    recv[i, :len(lst2)] = np.searchsorted(ghost[i], lst2)
                    mask[i, :len(lst2)] = 1.0
            self._shifts.append((
                [(i, (i + d) % N) for i in range(N)],
                [(i, (i - d) % N) for i in range(N)],
            ))
            self._shift_arrays += [
                jax.device_put(jnp.asarray(send), shard_1d),
                jax.device_put(jnp.asarray(recv), shard_1d),
                jax.device_put(jnp.asarray(mask, self.dtype), shard_1d),
            ]

        # -- BCs in distributed layout ---------------------------------------
        mask_np = np.asarray(system.bcs.mask)
        mask_pad = np.concatenate(
            [mask_np, np.ones((1, self.n_eq), bool)])  # phantoms: identity rows
        self.mask_dist = jax.device_put(
            jnp.asarray(mask_pad[dist_src]), shard_1d)
        self._dist_src_j = jax.device_put(jnp.asarray(dist_src), shard_1d)
        self._slot_of_j = jnp.asarray(slot_of)

    # -- layout conversion ----------------------------------------------------

    def to_dist(self, u) -> Array:
        """[n_dofs, ...] (original numbering) -> sharded [N*n_own_max, ...];
        phantom rows are zero."""
        u = jnp.asarray(u)
        pad = jnp.zeros((1,) + u.shape[1:], u.dtype)
        out = jnp.concatenate([u, pad])[self._dist_src]
        return jax.device_put(out, NamedSharding(self.device_mesh,
                                                 P(self.axis)))

    def from_dist(self, ud) -> np.ndarray:
        return np.asarray(ud)[self._slot_of]

    def gather_global(self, ud: Array) -> Array:
        """Device-side from_dist: sharded dist-layout array -> replicated
        array in the original dof numbering (an all-gather under GSPMD).
        For once-per-accepted-step work like the glow model's coefficient
        interpolation, not for inner-loop use."""
        return jnp.asarray(ud)[self._slot_of_j]

    def scatter_aux(self, aux: Dict) -> Dict:
        """Convert an aux dict of [n_dofs, ...] arrays to the distributed
        layout (non-field entries pass through)."""
        n = len(self._slot_of)

        def conv(v):
            if isinstance(v, jax.Array) and v.ndim >= 1 and v.shape[0] == n:
                return self.to_dist(v)
            return v

        return {k: conv(v) for k, v in aux.items()}

    # -- pieces shared by residual and block assembly --------------------------

    @property
    def dtype(self):
        return self.inner.dtype

    def use_gather_scatter(self) -> None:
        """Switch local scatters to the ELL gather+sum layout (one metadata
        block per device shard)."""
        arrays, meta = [], []
        i = 0
        for template, kernel, n_arr in self._batch_meta:
            batch_arrs = self._batch_arrays[i:i + n_arr]
            i += n_arr
            if template.gather_idx is None:
                template.build_scatter_meta(self.n_parts)
                batch_arrs = list(batch_arrs) + [jax.device_put(
                    template.gather_idx,
                    NamedSharding(self.device_mesh, P(self.axis)))]
            meta.append((template, kernel, len(batch_arrs)))
            arrays += list(batch_arrs)
        self._batch_meta, self._batch_arrays = meta, arrays
        self._step_jit = None

    def _halo_fill(self, x, shift_arrs):
        """Device-local [n_own_max, ...] -> [n_ext, ...] with ghosts filled
        from their owners (forward exchange) and a zero trash row."""
        gh = jnp.zeros((self.n_ghost_max + 1,) + x.shape[1:], x.dtype)
        for k, (perm_fwd, _) in enumerate(self._shifts):
            send = shift_arrs[3 * k][0]
            recv = shift_arrs[3 * k + 1][0]
            payload = x[send]
            recvd = jax.lax.ppermute(payload, self.axis, perm_fwd)
            gh = gh.at[recv].set(recvd)
        zero = jnp.zeros((1,) + x.shape[1:], x.dtype)
        return jnp.concatenate([x, gh[: self.n_ghost_max], zero])

    def _halo_reduce(self, r_ext, shift_arrs):
        """[n_ext, ...] local scatter result -> [n_own_max, ...] with ghost
        contributions returned to their owners (reverse exchange)."""
        r_own = r_ext[: self.n_own_max]
        gh = r_ext[self.n_own_max: self.n_own_max + self.n_ghost_max]
        for k, (_, perm_rev) in enumerate(self._shifts):
            send = shift_arrs[3 * k][0]
            recv = shift_arrs[3 * k + 1][0]
            mask = shift_arrs[3 * k + 2][0]
            payload = gh[recv]  # out-of-range pad clamps; masked next
            payload = payload * mask.reshape(
                mask.shape + (1,) * (payload.ndim - 1)).astype(payload.dtype)
            recvd = jax.lax.ppermute(payload, self.axis, perm_rev)
            r_own = r_own.at[send].add(recvd)
        return r_own

    def _make_ctx(self, local, u_old_ext, d_hist_ext, aux_ext, params):
        ctx = {}
        for k, v in aux_ext.items():
            if isinstance(v, jax.Array) and v.ndim >= 1 and \
                    v.shape[0] == self.n_ext:
                ctx[k] = local.gather(v)
            else:
                ctx[k] = v
        ctx["u_old"] = local.gather(u_old_ext)
        ctx["d_hist"] = local.gather(d_hist_ext)
        ctx["params"] = params
        return ctx

    def _aux_spec(self, aux):
        return {k: (P(self.axis) if (hasattr(v, "ndim") and v.ndim >= 1
                                     and v.shape[0] == self.n_dofs_dist)
                    else P())
                for k, v in aux.items()}

    def _spmd_call(self, body_inner, delta, u_old, d_hist, aux, params):
        """Run `body_inner(locals...) -> [n_own_max, ...]` under shard_map
        with halo metadata and batch arrays threaded through."""
        n_shift = len(self._shift_arrays)
        ax = self.axis

        def body(delta_b, u_old_b, d_hist_b, aux_b, params_b, *rest):
            shift_arrs = rest[:n_shift]
            batch_arrs = rest[n_shift:]
            return body_inner(delta_b, u_old_b, d_hist_b, aux_b, params_b,
                              shift_arrs, batch_arrs)

        in_specs = (P(ax), P(ax), P(ax), self._aux_spec(aux), P(),
                    *([P(ax)] * n_shift),
                    *([P(ax)] * len(self._batch_arrays)))
        fn = shard_map(body, mesh=self.device_mesh, in_specs=in_specs,
                       out_specs=P(ax))
        return fn(delta, u_old, d_hist, aux, params,
                  *self._shift_arrays, *self._batch_arrays)

    def _local_batches(self, batch_arrs):
        out, i = [], 0
        for template, kernel, n_arr in self._batch_meta:
            out.append((template.local_view(*batch_arrs[i:i + n_arr]), kernel))
            i += n_arr
        return out

    # -- residual ---------------------------------------------------------------

    def _assemble(self, delta, u_old, d_hist, aux, params):
        def inner(delta_b, u_old_b, d_hist_b, aux_b, params_b,
                  shift_arrs, batch_arrs):
            delta_ext = self._halo_fill(delta_b, shift_arrs)
            u_old_ext = self._halo_fill(u_old_b, shift_arrs)
            d_hist_ext = self._halo_fill(d_hist_b, shift_arrs)
            aux_ext = {k: (self._halo_fill(v, shift_arrs)
                           if (isinstance(v, jax.Array) and v.ndim >= 1
                               and v.shape[0] == self.n_own_max) else v)
                       for k, v in aux_b.items()}
            out = jnp.zeros((self.n_ext, self.n_eq), delta_b.dtype)
            for local, kernel in self._local_batches(batch_arrs):
                ctx = self._make_ctx(local, u_old_ext, d_hist_ext, aux_ext,
                                     params_b)
                out = out + local.scatter(
                    kernel(local, local.gather(delta_ext), ctx))
            return self._halo_reduce(out, shift_arrs)

        return self._spmd_call(inner, delta, u_old, d_hist, aux, params)

    def _values_dist(self, t) -> Array:
        g = self.inner.bcs.values(t)
        gpad = jnp.concatenate([g, jnp.zeros((1, self.n_eq), g.dtype)])
        return gpad[self._dist_src_j]

    def _cast_inputs(self, u_guess, u_old, u_old1, aux, params):
        dtype = self.dtype
        delta0 = (u_guess - u_old).astype(dtype)
        d_hist = (u_old - u_old1).astype(dtype)
        g = self._values_dist(params.t)
        bc_shift = (u_old - g).astype(dtype)
        u_old_c = u_old.astype(dtype)

        def cast(v):
            if isinstance(v, jax.Array) and jnp.issubdtype(v.dtype,
                                                           jnp.floating):
                return v.astype(dtype)
            return v

        aux_c = {k: cast(v) for k, v in aux.items()}
        params_c = StepParams(*(jnp.asarray(x, dtype) for x in params))
        return delta0, u_old_c, d_hist, aux_c, params_c, bc_shift

    def make_delta_residual_fn(self, u_old, d_hist, aux, params, bc_shift):
        def R(delta):
            out = self._assemble(delta, u_old, d_hist, aux, params)
            return jnp.where(self.mask_dist, delta + bc_shift, out)

        return R

    def make_residual_fn(self, u_old, u_old1, aux, params):
        _, u_old_c, d_hist, aux_c, params_c, bc_shift = self._cast_inputs(
            u_old, u_old, u_old1, aux, params)
        R = self.make_delta_residual_fn(u_old_c, d_hist, aux_c, params_c,
                                        bc_shift)

        def F(u):
            return R((u - u_old).astype(self.dtype))

        return F

    def residual(self, u, u_old, u_old1, aux, params):
        return self.make_residual_fn(u_old, u_old1, aux, params)(u)

    # -- distributed elliptic (Poisson-block) preconditioner ---------------------

    def _dist_stiffness_op(self, eq: int):
        """The masked Laplacian of component `eq` as a linear operator on
        dist-layout [n_dofs_dist] vectors: halo-exchanged local stiffness
        matvecs, identity on Dirichlet/phantom rows. No O(n_dofs)
        replicated arrays — the distributed counterpart of
        `CoupledSystem.masked_stiffness_op`."""
        mask = self.mask_dist[:, eq]
        n_shift = len(self._shift_arrays)
        ax = self.axis

        def body(x_b, *rest):
            shift_arrs = rest[:n_shift]
            batch_arrs = rest[n_shift:]
            x_ext = self._halo_fill(x_b, shift_arrs)
            # cell batch only: facet kernels do not contribute to the
            # Laplacian
            local, _ = self._local_batches(batch_arrs)[0]
            out = jnp.zeros((self.n_ext,), x_b.dtype)
            out = out + local.scatter(
                local.stiffness(local.grad(local.gather(x_ext))))
            return self._halo_reduce(out, shift_arrs)

        in_specs = (P(ax), *([P(ax)] * n_shift),
                    *([P(ax)] * len(self._batch_arrays)))
        fn = shard_map(body, mesh=self.device_mesh, in_specs=in_specs,
                       out_specs=P(ax))

        def A(x):
            x_in = jnp.where(mask, 0.0, x).astype(self.dtype)
            Ax = fn(x_in, *self._shift_arrays, *self._batch_arrays)
            return jnp.where(mask, x, Ax)

        return A

    def enable_distributed_elliptic(self, eq: int, degree: int = 12,
                                    ratio: float = 30.0,
                                    power_iters: int = 40) -> None:
        """Augment the node-block preconditioner with a DISTRIBUTED
        Chebyshev solve of the `eq` component's Laplacian — replaces the
        replicated all-gathered V-cycle fallback (`block_precond_builder`)
        so the dd step holds no O(n_dofs) replicated arrays. The Chebyshev
        polynomial is a fixed linear operator (BiCGStab-safe) built on the
        Jacobi-scaled halo-exchanged matvec; dot products in the power
        iteration reduce over the sharded layout via GSPMD."""
        from ..solvers.chebyshev import chebyshev_solver, power_iteration_lmax

        # Jacobi diagonal of the masked stiffness, assembled on the host
        # in the original numbering (setup-time, once), then distributed
        b = self.inner.cell_batch
        g = np.asarray(b.grads)
        g2 = np.sum(g * g, axis=-1)
        scale = np.asarray(b.scale)
        if g2.shape[1] == 1:
            contrib = scale.sum(axis=1)[:, None] * g2[:, 0]
        else:
            contrib = np.einsum("cq,cqa->ca", scale, g2)
        acc = np.zeros(self.inner.n_dofs)
        np.add.at(acc, np.asarray(b.dofs).reshape(-1), contrib.reshape(-1))
        mask_np = np.asarray(self.inner.bcs.mask[:, eq])
        dtilde = np.where(mask_np | (acc == 0), 1.0, acc)
        dtilde_d = self.to_dist(jnp.asarray(dtilde, self.dtype))
        # phantom rows: identity (to_dist zero-fills them)
        dtilde_d = jnp.where(dtilde_d == 0, 1.0, dtilde_d)

        A = self._dist_stiffness_op(eq)
        At = jax.jit(lambda x: A(x) / dtilde_d)
        lmax = power_iteration_lmax(At, self.n_dofs_dist, iters=power_iters)
        cheb = chebyshev_solver(At, lmax / ratio, 1.05 * lmax, degree)
        self._dist_ell = (eq, lambda r: cheb(r / dtilde_d))
        self._step_jit = None

    _dist_ell = None

    # -- node-block Jacobi preconditioner ----------------------------------------

    def _jacobian_blocks(self, delta, u_old, d_hist, aux, params):
        def inner(delta_b, u_old_b, d_hist_b, aux_b, params_b,
                  shift_arrs, batch_arrs):
            delta_ext = self._halo_fill(delta_b, shift_arrs)
            u_old_ext = self._halo_fill(u_old_b, shift_arrs)
            d_hist_ext = self._halo_fill(d_hist_b, shift_arrs)
            aux_ext = {k: (self._halo_fill(v, shift_arrs)
                           if (isinstance(v, jax.Array) and v.ndim >= 1
                               and v.shape[0] == self.n_own_max) else v)
                       for k, v in aux_b.items()}
            ne = self.n_eq
            blocks = jnp.zeros((self.n_ext, ne, ne), delta_b.dtype)
            for local, kernel in self._local_batches(batch_arrs):
                ctx = self._make_ctx(local, u_old_ext, d_hist_ext, aux_ext,
                                     params_b)
                u_e = local.gather(delta_ext)
                n_local = u_e.shape[1]
                basis = jnp.eye(n_local * ne, dtype=delta_b.dtype).reshape(
                    -1, n_local, ne)

                def push(tan, u_e=u_e, local=local, kernel=kernel, ctx=ctx):
                    f = lambda ue: kernel(local, ue, ctx)
                    return jax.jvp(
                        f, (u_e,), (jnp.broadcast_to(tan, u_e.shape),))[1]

                J = jax.vmap(push)(basis)
                J = J.reshape(n_local, ne, -1, n_local, ne)
                diag = jnp.stack(
                    [J[a, :, :, a, :] for a in range(n_local)], axis=0
                ).transpose(2, 0, 3, 1)
                flat = diag.reshape(-1, ne, ne)
                blocks = blocks + jax.ops.segment_sum(
                    flat, local.dofs.reshape(-1), num_segments=self.n_ext)
            return self._halo_reduce(blocks, shift_arrs)

        blocks = self._spmd_call(inner, delta, u_old, d_hist, aux, params)
        eye_rows = jnp.eye(self.n_eq, dtype=delta.dtype)[None]
        return jnp.where(self.mask_dist[:, :, None], eye_rows, blocks)

    def block_precond_builder(self, u_old, d_hist, aux, params):
        from ..solvers.precond import block_apply, invert_blocks

        ell = self.inner._ell

        def build(delta):
            blocks = self._jacobian_blocks(delta, u_old, d_hist, aux, params)
            inv = invert_blocks(blocks)
            if self._dist_ell is not None:
                # fully distributed path (enable_distributed_elliptic):
                # the Chebyshev solve operates on the sharded column
                # directly — no O(n_dofs) replicated arrays anywhere in
                # the dd step
                eq, ell_solve = self._dist_ell

                def M_dist(r):
                    y = block_apply(inv, r)
                    return y.at[:, eq].set(
                        ell_solve(r[:, eq]).astype(y.dtype))

                return M_dist
            if ell is None:
                return lambda r: block_apply(inv, r)
            eq, ell_solve = ell

            def M(r):
                y = block_apply(inv, r)
                # LEGACY fallback: the inherited single-chip MG solve runs
                # replicated on the original numbering (all-gather one
                # column, scatter back) — prefer
                # `enable_distributed_elliptic` for production dd runs.
                r_glob = r[self._slot_of_j, eq]
                y_col = ell_solve(r_glob)
                y_pad = jnp.concatenate(
                    [y_col, jnp.zeros((1,), y_col.dtype)])
                return y.at[:, eq].set(y_pad[self._dist_src_j])

            return M

        return build

    # -- one attempted BDF step ---------------------------------------------------

    def _step(self, u_guess, u_old, u_old1, aux, params: StepParams):
        (delta0, u_old_c, d_hist, aux_c, params_c,
         bc_shift) = self._cast_inputs(u_guess, u_old, u_old1, aux, params)
        R = self.make_delta_residual_fn(u_old_c, d_hist, aux_c, params_c,
                                        bc_shift)
        pb = (self.block_precond_builder(u_old_c, d_hist, aux_c, params_c)
              if self.use_block_precond else None)
        delta, info = newton_krylov(R, delta0, self.newton, pb)
        return u_old + delta.astype(u_old.dtype), info

    def step(self, u_guess, u_old, u_old1, aux, params: StepParams):
        if self._step_jit is None:
            self._step_jit = jax.jit(self._step)
        return self._step_jit(u_guess, u_old, u_old1, aux, params)


def distribute(system: CoupledSystem, device_mesh,
               axis: str = "space") -> DistributedSystem:
    return DistributedSystem(system, device_mesh, axis)
