"""Batched element assembly: the jitted compute path.

This is the TPU-native replacement for DOLFIN's C++ assembly loops and the
FFC-generated element kernels (SURVEY.md section 2.3). Every weak-form
integral the reference builds symbolically in UFL
(`/root/reference/fedm/functions.py:240-528`) becomes a composition of three
array ops, all fused by XLA:

  gather   u_e = u[cell_dofs]                    [n_cells, n_local, ...]
  einsum   values/gradients at quadrature points (dense, MXU-friendly)
  scatter  segment_sum back to global dofs       [n_dofs, ...]

Element kernels are written as functions of the *gathered* values `u_e`, so
`jax.jvp` provides the Jacobian action (what `derivative(F, u, du)` provides
symbolically in the reference, `examples/glow_discharge/fedm-gd.py:402`) and
`jax.jacfwd` over the per-cell kernel yields the node-block Jacobian diagonal
used as the Newton-Krylov preconditioner.

Axisymmetric weighting: the reference multiplies every integrand by `2*pi*r`
with `r = x[0]` in cylindrical coordinates and `r = 0.5/pi` (i.e. weight 1)
in planar problems (`fedm/functions.py:357`, `fedm-tof_1d.py`); here that is
folded into the per-quadrature-point `scale` once at setup.
"""

from __future__ import annotations

from typing import Callable, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import pi
from .elements import cell_quadrature, facet_quadrature, tabulate
from .space import FunctionSpace

Array = jax.Array


def _scale_like(scale: Array, s: Array) -> Array:
    """Broadcast scale [c, q] against s [c, q, ...]."""
    extra = s.ndim - 2
    return scale.reshape(scale.shape + (1,) * extra)


class CellBatch:
    """Precomputed cell-integral data for one function space + quadrature.

    Device arrays:
      N      [n_q, n_local]              reference shape values
      grads  [n_cells, g, n_local, dim]  physical shape gradients (g=1 for
                                         affine P1, g=n_q otherwise)
      scale  [n_cells, n_q]              w_q * |detJ| * (2*pi*r | 1)
      x_q    [n_cells, n_q, dim]         physical quadrature points
      dofs   [n_cells, n_local]
    """

    def __init__(self, space: FunctionSpace, quad_degree: int = 4,
                 axisymmetric: bool = False, dtype=None):
        dtype = jax.dtypes.canonicalize_dtype(jnp.float64 if dtype is None
                                              else dtype)
        mesh = space.mesh
        self.space = space
        self.axisymmetric = axisymmetric
        self.dtype = dtype
        pts, wts = cell_quadrature(space.cell_type, quad_degree)
        N, dN = tabulate(space.cell_type, space.degree, pts)
        self.n_q = len(wts)
        self.n_local = space.n_local
        self.n_dofs = space.n_dofs
        self.dim = mesh.dim

        x_cells = mesh.coords[mesh.cells]  # [n_cells, dim+1, dim]
        x0 = x_cells[:, 0]
        J = np.stack([x_cells[:, i + 1] - x0 for i in range(mesh.dim)], axis=2)
        if mesh.dim == 1:
            detJ = J[:, 0, 0]
            invJ = (1.0 / detJ)[:, None, None]
        else:
            detJ = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
            invJ = (
                np.stack(
                    [
                        np.stack([J[:, 1, 1], -J[:, 0, 1]], axis=1),
                        np.stack([-J[:, 1, 0], J[:, 0, 0]], axis=1),
                    ],
                    axis=1,
                )
                / detJ[:, None, None]
            )
        absdetJ = np.abs(detJ)

        # physical gradients: dN_phys[q, a, d] = dN[q, a, k] invJ[k, d]
        grads = np.einsum("qak,ckd->cqad", dN, invJ)
        if space.degree == 1:
            grads = grads[:, :1]  # q-independent for affine P1

        # physical quadrature points (vertex interpolation is exact, affine)
        Nv, _ = tabulate(space.cell_type, 1, pts)
        x_q = np.einsum("qa,cad->cqd", Nv, x_cells)

        scale = wts[None, :] * absdetJ[:, None]
        if axisymmetric:
            scale = scale * (2.0 * pi * x_q[:, :, 0])

        self.N = jnp.asarray(N, dtype)
        self.grads = jnp.asarray(grads, dtype)
        self.scale = jnp.asarray(scale, dtype)
        self.x_q = jnp.asarray(x_q, dtype)
        self.dofs = jnp.asarray(space.cell_dofs, jnp.int32)
        # cell size h (max vertex distance), for h-scaled stabilisation terms
        self.h = jnp.asarray(mesh.cell_h(), dtype)
        # per-cell directional extents, for anisotropy-aware upwinding
        self.h_dir = jnp.asarray(mesh.cell_extents(), dtype)

    # -- sharding support ---------------------------------------------------
    # The per-cell arrays form the shardable leading axis; `local_view`
    # rebinds them to a device-local shard inside `shard_map` (see
    # fedm_tpu.parallel.shard).

    _SHARD_FIELDS = ("grads", "scale", "x_q", "dofs", "h", "h_dir")
    gather_idx = None  # optional ELL scatter metadata [n_blocks, n_dofs, v]
    _meta_blocks = 1

    # -- geometry-as-arguments support ---------------------------------------
    # The coordinate-DERIVED float arrays (everything that changes when mesh
    # node positions move while the topology stays fixed). Threading these
    # through jitted functions as ARGUMENTS instead of closed-over constants
    # is what makes the moving-window remesh zero-recompile
    # (model/system.CoupledSystem.enable_geom_mode): a window move swaps
    # arrays of identical shapes, and the compiled executable is reused.
    # `dofs`/`gather_idx`/`_structured` stay static — topology.

    _GEOM_FIELDS = ("grads", "scale", "x_q", "h", "h_dir")

    def geom(self) -> tuple:
        return tuple(getattr(self, f) for f in self._GEOM_FIELDS)

    def with_geom(self, arrays: tuple) -> "CellBatch":
        import copy

        view = copy.copy(self)
        for f, a in zip(self._GEOM_FIELDS, arrays):
            setattr(view, f, a)
        return view

    @property
    def SHARD_FIELDS(self):
        if self.gather_idx is not None:
            return self._SHARD_FIELDS + ("gather_idx",)
        return self._SHARD_FIELDS

    def shard_arrays(self):
        return tuple(getattr(self, f) for f in self.SHARD_FIELDS)

    def local_view(self, *arrays) -> "CellBatch":
        import copy

        view = copy.copy(self)
        view._structured = None  # shards use ELL/segment-sum scatter
        for f, a in zip(self.SHARD_FIELDS, arrays):
            setattr(view, f, a)
        return view

    def pad_to(self, multiple: int) -> None:
        """Pad the cell axis to a multiple of `multiple` with zero-weight
        duplicates of cell 0 (scale=0 -> no contribution, dofs valid)."""
        n = self.scale.shape[0]
        target = -(-n // multiple) * multiple
        extra = target - n
        # the cell axis is about to be treated as shardable blocks either
        # way: the global grid layout no longer describes it, even when no
        # padding is needed (sharded local views must not inherit it)
        self._structured = None
        if extra == 0:
            return
        for f in self._SHARD_FIELDS:
            a = getattr(self, f)
            pad = jnp.repeat(a[:1], extra, axis=0)
            if f == "scale":
                pad = jnp.zeros_like(pad)
            setattr(self, f, jnp.concatenate([a, pad], axis=0))
        if self.gather_idx is not None:
            self.build_scatter_meta(self._meta_blocks)

    # -- gather-based (ELL) assembly ----------------------------------------

    def build_scatter_meta(self, n_blocks: int = 1) -> None:
        """Switch `scatter` from scatter-add segment-sum to a pure
        gather+sum: per destination dof, the (static) flat positions of its
        contributions, padded with a sentinel that reads an appended zero
        row. TPU executes gathers far better than scatter-adds — this is
        the ELL-layout assembly of SURVEY.md section 7 stage 9.

        With `n_blocks` > 1 the metadata is built per contiguous cell block
        (one per device shard) with block-local flat indices; the leading
        axis then shards alongside the other per-cell arrays.
        """
        dofs = np.asarray(self.dofs)
        L = dofs.size // n_blocks  # flat contributions per block
        flat = dofs.reshape(n_blocks, L)
        max_val = 0
        for b in range(n_blocks):
            max_val = max(max_val, int(np.bincount(
                flat[b], minlength=self.n_dofs).max()))
        idx = np.full((n_blocks, self.n_dofs, max_val), L, dtype=np.int64)
        for b in range(n_blocks):
            order = np.argsort(flat[b], kind="stable")
            sorted_d = flat[b][order]
            seg_start = np.searchsorted(sorted_d, np.arange(self.n_dofs))
            ranks = np.arange(L) - seg_start[sorted_d]
            idx[b, sorted_d, ranks] = order
        self.gather_idx = jnp.asarray(idx, jnp.int32)
        self._meta_blocks = n_blocks

    # -- structured (tensor-product grid) assembly ---------------------------

    _structured = None  # (nx, ny) when slice/pad gather/scatter is active

    def set_structured(self, nx: int, ny: int) -> None:
        """Switch gather/scatter to static slice / pad+add operations on the
        [ny+1, nx+1] vertex grid of a `rectangle_mesh(..., 'right')` (P1).

        This removes ALL index chasing from the hot assembly path: gather
        becomes six contiguous slices of the grid, scatter six padded adds —
        pure VPU work. Measured on the 55k-node Bagheri bench mesh (TPU
        v5e) the unstructured ELL path pays ~100x over HBM speed-of-light
        for the same data movement. Valid only for the canonical generator
        ordering (validated here); sharded local views fall back to their
        ELL/segment-sum paths automatically.
        """
        assert self.space.degree == 1, "structured assembly is P1-only"
        n_cells = self.dofs.shape[0]
        assert n_cells == 2 * nx * ny, "cell count mismatch"
        # validate canonical ordering: vid = iy*(nx+1)+ix, lower block then
        # upper block, each y-major (mesh/generators.py rectangle_mesh)
        ix, iy = np.meshgrid(np.arange(nx), np.arange(ny), indexing="xy")
        vid = lambda dx, dy: ((iy + dy) * (nx + 1) + ix + dx).ravel()
        expect = np.concatenate([
            np.stack([vid(0, 0), vid(1, 0), vid(1, 1)], axis=1),   # ll lr ur
            np.stack([vid(0, 0), vid(1, 1), vid(0, 1)], axis=1),   # ll ur ul
        ])
        assert np.array_equal(np.asarray(self.dofs), expect), (
            "cell ordering is not the canonical rectangle_mesh('right') "
            "layout; structured assembly unavailable")
        self._structured = (nx, ny)
        # (dy, dx) of each (block, local) vertex
        self._offsets = (((0, 0), (0, 1), (1, 1)), ((0, 0), (1, 1), (1, 0)))

    def try_structured(self) -> bool:
        """Engage structured assembly if the cell layout is the canonical
        rectangle_mesh('right') ordering, inferring (nx, ny) from it.
        Returns True on success; False leaves the batch unchanged."""
        if self.space.degree != 1 or self.dofs.shape[1] != 3:
            return False
        d0 = np.asarray(self.dofs[0])
        nx = int(d0[2]) - 2  # cell 0 = (ll=0, lr=1, ur=nx+2)
        n_cells = self.dofs.shape[0]
        if nx <= 0 or n_cells % (2 * nx):
            return False
        ny = n_cells // (2 * nx)
        if (nx + 1) * (ny + 1) != self.n_dofs:
            return False
        try:
            self.set_structured(nx, ny)
            return True
        except AssertionError:
            return False

    # -- evaluation (on gathered element values) ---------------------------

    def gather(self, u: Array) -> Array:
        if self._structured is not None:
            nx, ny = self._structured
            U = u.reshape((ny + 1, nx + 1) + u.shape[1:])
            blocks = []
            for offs in self._offsets:
                locs = [U[dy:dy + ny, dx:dx + nx].reshape((nx * ny,)
                                                          + u.shape[1:])
                        for dy, dx in offs]
                blocks.append(jnp.stack(locs, axis=1))
            return jnp.concatenate(blocks, axis=0)
        return u[self.dofs]

    def value(self, u_e: Array) -> Array:
        """[n_cells, n_local, ...] -> values at quad pts [n_cells, n_q, ...]."""
        return jnp.einsum("qa,ca...->cq...", self.N, u_e)

    def grad(self, u_e: Array) -> Array:
        """[n_cells, n_local, ...] -> gradients [n_cells, n_q, dim, ...]."""
        g = jnp.einsum("cqad,ca...->cqd...", self.grads, u_e)
        if g.shape[1] != self.n_q:
            g = jnp.broadcast_to(g, (g.shape[0], self.n_q) + g.shape[2:])
        return g

    # -- test-function contributions (include quadrature scale) ------------

    def mass(self, s: Array) -> Array:
        """∫ s φ_a : s [n_cells, n_q, ...] -> [n_cells, n_local, ...]."""
        return jnp.einsum("qa,cq...->ca...", self.N, s * _scale_like(self.scale, s))

    def stiffness(self, G: Array) -> Array:
        """∫ G · ∇φ_a : G [n_cells, n_q, dim, ...] -> [n_cells, n_local, ...]."""
        Gs = G * _scale_like(self.scale, G)
        if self.grads.shape[1] == 1:
            Gq = Gs.sum(axis=1)  # [n_cells, dim, ...]
            return jnp.einsum("cad,cd...->ca...", self.grads[:, 0], Gq)
        return jnp.einsum("cqad,cqd...->ca...", self.grads, Gs)

    def scatter(self, contrib: Array) -> Array:
        """[n_cells, n_local, ...] -> global [n_dofs, ...]: structured
        pad+add on tensor-product grids, ELL gather+sum when metadata is
        built (TPU-friendly), else segment-sum."""
        trailing = contrib.shape[2:]
        if self._structured is not None:
            nx, ny = self._structured
            C = contrib.reshape((2, ny, nx, 3) + trailing)
            out = None
            pad_tail = ((0, 0),) * len(trailing)
            for b, offs in enumerate(self._offsets):
                for l, (dy, dx) in enumerate(offs):
                    p = jnp.pad(C[b, :, :, l],
                                ((dy, 1 - dy), (dx, 1 - dx)) + pad_tail)
                    out = p if out is None else out + p
            return out.reshape((self.n_dofs,) + trailing)
        flat = contrib.reshape((-1,) + trailing)
        if self.gather_idx is not None:
            idx = self.gather_idx
            idx = idx[0] if idx.ndim == 3 else idx
            flat = jnp.concatenate(
                [flat, jnp.zeros((1,) + trailing, flat.dtype)], axis=0)
            return jnp.take(flat, idx, axis=0).sum(axis=1)
        return jax.ops.segment_sum(flat, self.dofs.reshape(-1),
                                   num_segments=self.n_dofs)

    def integrate(self, s: Array) -> Array:
        """∫ s over the domain; s [n_cells, n_q, ...]."""
        return jnp.sum(s * _scale_like(self.scale, s), axis=(0, 1))


class FacetBatch:
    """Boundary-facet integral data for facets with a given marker.

    Everything is evaluated through the adjacent cell's basis restricted to
    the facet, so facet kernels see the full cell dof set: values, tangential
    AND normal gradients (needed for E·n and flux·n terms in
    `/root/reference/fedm/functions.py:514-528`) all come from the same
    gathered array, and contributions scatter through cell dofs (cell basis
    functions of off-facet dofs vanish on the facet for Lagrange elements).

    Device arrays:
      N       [n_f, n_q, n_local]        cell shape values at facet quad pts
      grads   [n_f, g, n_local, dim]     cell shape gradients (g as CellBatch)
      scale   [n_f, n_q]                 w_q * |facet| * (2*pi*r | 1)
      normal  [n_f, dim]                 outward unit normals
      dofs    [n_f, n_local]             adjacent-cell dofs
      x_q     [n_f, n_q, dim]
    """

    def __init__(self, space: FunctionSpace, markers: Union[int, list, None] = None,
                 quad_degree: int = 4, axisymmetric: bool = False,
                 dtype=None):
        dtype = jax.dtypes.canonicalize_dtype(jnp.float64 if dtype is None
                                              else dtype)
        mesh = space.mesh
        self.space = space
        self.dtype = dtype
        if markers is None:
            sel = np.arange(len(mesh.boundary_facets))
        else:
            if isinstance(markers, int):
                markers = [markers]
            sel = np.where(np.isin(mesh.facet_markers, markers))[0]
        self.n_facets = len(sel)
        self.n_local = space.n_local
        self.n_dofs = space.n_dofs
        self.dim = mesh.dim

        facets = mesh.boundary_facets[sel]  # [n_f, vpf]
        cells_adj = mesh.boundary_cells[sel]
        cell_verts = mesh.cells[cells_adj]  # [n_f, dim+1]

        spts, wts = facet_quadrature(mesh.dim, quad_degree)
        n_q = len(wts)
        self.n_q = n_q

        # reference vertices of the cell
        if mesh.dim == 1:
            ref_verts = np.array([[0.0], [1.0]])
        else:
            ref_verts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])

        # local index of each facet vertex within its cell
        # facets [n_f, vpf]; cell_verts [n_f, dim+1]
        local_idx = np.zeros(facets.shape, dtype=np.int64)
        for j in range(facets.shape[1]):
            eq = cell_verts == facets[:, j : j + 1]
            local_idx[:, j] = np.argmax(eq, axis=1)

        # facet quad points in cell reference coordinates
        if mesh.dim == 1:
            ref_q = ref_verts[local_idx[:, 0]][:, None, :]  # [n_f, 1, 1]
            measure = np.ones(self.n_facets)
        else:
            a_ref = ref_verts[local_idx[:, 0]]  # [n_f, 2]
            b_ref = ref_verts[local_idx[:, 1]]
            s = spts[:, 0]  # [n_q]
            ref_q = (
                a_ref[:, None, :] * (1.0 - s)[None, :, None]
                + b_ref[:, None, :] * s[None, :, None]
            )
            a_phys = mesh.coords[facets[:, 0]]
            b_phys = mesh.coords[facets[:, 1]]
            measure = np.linalg.norm(b_phys - a_phys, axis=1)

        # tabulate cell basis at each facet's quad points
        flat_ref = ref_q.reshape(-1, mesh.dim)
        N_flat, dN_flat = tabulate(space.cell_type, space.degree, flat_ref)
        N = N_flat.reshape(self.n_facets, n_q, self.n_local)
        dN = dN_flat.reshape(self.n_facets, n_q, self.n_local, mesh.dim)

        # cell geometry for the adjacent cells
        x_cells = mesh.coords[cell_verts]
        x0 = x_cells[:, 0]
        J = np.stack([x_cells[:, i + 1] - x0 for i in range(mesh.dim)], axis=2)
        if mesh.dim == 1:
            invJ = (1.0 / J[:, 0, 0])[:, None, None]
        else:
            detJ = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
            invJ = (
                np.stack(
                    [
                        np.stack([J[:, 1, 1], -J[:, 0, 1]], axis=1),
                        np.stack([-J[:, 1, 0], J[:, 0, 0]], axis=1),
                    ],
                    axis=1,
                )
                / detJ[:, None, None]
            )
        grads = np.einsum("fqak,fkd->fqad", dN, invJ)
        if space.degree == 1:
            grads = grads[:, :1]

        # physical quad points
        Nv, _ = tabulate(space.cell_type, 1, flat_ref)
        x_q = np.einsum("fqa,fad->fqd",
                        Nv.reshape(self.n_facets, n_q, mesh.dim + 1), x_cells)

        scale = wts[None, :] * measure[:, None]
        if axisymmetric:
            scale = scale * (2.0 * pi * x_q[:, :, 0])

        normals = mesh.facet_normals()[sel]

        self.N = jnp.asarray(N, dtype)
        self.grads = jnp.asarray(grads, dtype)
        self.scale = jnp.asarray(scale, dtype)
        self.normal = jnp.asarray(normals, dtype)
        self.x_q = jnp.asarray(x_q, dtype)
        self.dofs = jnp.asarray(space.cell_dofs[cells_adj], jnp.int32)

    # sharding support (facet axis is leading on every per-facet array,
    # including N which varies per facet here)
    _SHARD_FIELDS = ("N", "grads", "scale", "normal", "x_q", "dofs")
    gather_idx = None
    _meta_blocks = 1
    _structured = None  # facet sets are unstructured; shared scatter() guard
    SHARD_FIELDS = CellBatch.SHARD_FIELDS
    shard_arrays = CellBatch.shard_arrays
    local_view = CellBatch.local_view
    pad_to = CellBatch.pad_to
    build_scatter_meta = CellBatch.build_scatter_meta
    # geometry-as-arguments (see CellBatch): N varies with node positions
    # here (facet quad points sit in cell reference coords that depend on
    # which vertices the facet uses — topology — but grads/scale/x_q/normal
    # all carry physical coordinates; N is topology-only, kept for safety
    # at negligible cost)
    _GEOM_FIELDS = ("N", "grads", "scale", "normal", "x_q")
    geom = CellBatch.geom
    with_geom = CellBatch.with_geom

    def gather(self, u: Array) -> Array:
        return u[self.dofs]

    def value(self, u_e: Array) -> Array:
        return jnp.einsum("fqa,fa...->fq...", self.N, u_e)

    def grad(self, u_e: Array) -> Array:
        g = jnp.einsum("fqad,fa...->fqd...", self.grads, u_e)
        if g.shape[1] != self.n_q:
            g = jnp.broadcast_to(g, (g.shape[0], self.n_q) + g.shape[2:])
        return g

    def mass(self, s: Array) -> Array:
        """∮ s φ_a : s [n_f, n_q, ...] -> [n_f, n_local, ...]."""
        return jnp.einsum("fqa,fq...->fa...", self.N, s * _scale_like(self.scale, s))

    scatter = CellBatch.scatter

    def integrate(self, s: Array) -> Array:
        return jnp.sum(s * _scale_like(self.scale, s), axis=(0, 1))


# -- nodal helpers ----------------------------------------------------------


def interpolate(fn: Union[Callable, float], space: FunctionSpace,
                dtype=None) -> Array:
    """Nodal interpolation: evaluate `fn(coords) -> values` at dof coordinates
    (dolfin `interpolate(Expression, V)` analog for Lagrange spaces)."""
    dtype = jax.dtypes.canonicalize_dtype(jnp.float64 if dtype is None
                                          else dtype)
    if callable(fn):
        vals = np.asarray(fn(space.dof_coords))
        if vals.ndim == 0:
            vals = np.full(space.n_dofs, float(vals))
    else:
        vals = np.full(space.n_dofs, float(fn))
    return jnp.asarray(vals, dtype)


def project(s_q: Array, batch: CellBatch, lumped: bool = False,
            tol: float = None, maxiter: int = 200) -> Array:
    """L2-project quadrature-point values `s_q [n_cells, n_q]` onto the space.

    Solves M x = b. The consistent mass solve mirrors the reference's
    per-step `project(...)` calls (`examples/glow_discharge/fedm-gd.py:432`,
    there via MUMPS); `lumped=True` uses the row-sum mass diagonal instead
    (diagonal solve, no iteration — faster, slightly more diffusive).
    """
    if tol is None:
        tol = 1e-12 if batch.dtype == jnp.float64 else 1e-6
    b = batch.scatter(batch.mass(s_q))
    ones_q = jnp.ones_like(batch.scale)
    lump = batch.scatter(batch.mass(ones_q))
    if lumped:
        return b / lump

    def matvec(x):
        return batch.scatter(batch.mass(batch.value(batch.gather(x))))

    from ..solvers.linear import cg

    x, _, _ = cg(matvec, b, x0=b / lump, precond=lambda r: r / lump,
                 tol=tol, maxiter=maxiter)
    return x


def vector_l2_norm(u: Array) -> Array:
    """Euclidean norm of the flattened dof vector (dolfin `norm(v.vector())`,
    the norm the reference's step-error estimate uses,
    `fedm/functions.py:1062-1064`)."""
    return jnp.linalg.norm(u.reshape(-1))
