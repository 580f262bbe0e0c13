"""Pallas ELL-assembly kernel (capability-gated).

The hot assembly path is `scatter`: per destination dof, sum a static list
of contribution positions (the ELL layout of
`fem.assembly.CellBatch.build_scatter_meta`). As a Pallas kernel this is a
single pass: for a tile of dofs, load the [tile, max_val] index block,
gather the flat contributions, reduce over the valence axis — one HBM read
of the contributions, no scatter-adds.

Status on the current toolchain (jax 0.9 / Mosaic on TPU v5e, measured in
this repo's history): the required dynamic vector gather does not lower —
`jnp.take` reports "Only 2D gather is supported" and 2D
`jnp.take_along_axis` fails an internal Mosaic assertion. The kernel below
is therefore verified in interpreter mode and `pallas_scatter_supported()`
probes the real backend at runtime; the XLA gather+sum path (which
compiles to the same data movement) remains the production default until
Mosaic grows the gather. See docs/DESIGN.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _ell_kernel(idx_ref, flat_ref, out_ref):
    """One grid step handles a [TILE] block of dofs for one trailing
    component: out[d] = sum_v flat[idx[d, v]]."""
    idx = idx_ref[:]          # [TILE, max_val] int32
    flat = flat_ref[:]        # [n_flat_padded] values (+ sentinel zero row)
    out_ref[:] = jnp.take(flat, idx, axis=0).sum(axis=1)


def pallas_ell_scatter(flat: Array, idx: Array, *, tile: int = 512,
                       interpret: bool = False) -> Array:
    """out[d] = sum_v flat[idx[d, v]] for flat [n_flat+1] (sentinel last),
    idx [n_dofs, max_val]."""
    n_dofs = idx.shape[0]
    pad = -n_dofs % tile
    if pad:
        idx = jnp.concatenate(
            [idx, jnp.full((pad, idx.shape[1]), flat.shape[0] - 1,
                           idx.dtype)], axis=0)
    grid = (idx.shape[0] // tile,)
    out = pl.pallas_call(
        _ell_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, idx.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                               memory_space=pltpu.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((idx.shape[0],), flat.dtype),
        interpret=interpret,
    )(idx, flat)
    return out[:n_dofs]


@functools.cache
def pallas_scatter_supported() -> bool:
    """Probe whether the current backend lowers the kernel."""
    try:
        flat = jnp.arange(9.0, dtype=jnp.float32)
        idx = jnp.asarray(np.arange(16).reshape(8, 2) % 8, jnp.int32)
        out = pallas_ell_scatter(flat, idx, tile=8)
        ref = np.take(np.asarray(flat), np.asarray(idx), axis=0).sum(1)
        return bool(np.allclose(np.asarray(out), ref))
    except Exception:
        return False
