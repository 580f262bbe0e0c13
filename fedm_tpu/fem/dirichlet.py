"""Dirichlet boundary conditions as residual masking.

The reference applies BCs by mutating assembled PETSc matrices/vectors
(`/root/reference/fedm/functions.py:188-202`). Matrix-free on TPU, the same
effect is the standard masked-residual trick: for constrained entries the
residual becomes `u - g`, which makes the Jacobian rows identity under
`jax.jvp` automatically.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Union

import numpy as np
import jax
import jax.numpy as jnp

from .space import FunctionSpace

Array = jax.Array


@dataclass
class DirichletBC:
    """Fix equation component `eq` to `value` on the given dofs.

    value: scalar, [n_bc_dofs] array, or a jax-traceable callable `t ->
    scalar/array` for time-ramped BCs (e.g. the powered electrode
    `U0*(1-exp(-t/1e-9))`, `examples/glow_discharge/fedm-gd.py:272`).
    """

    dofs: np.ndarray
    eq: int
    value: Union[float, np.ndarray, Callable]

    def value_at(self, t) -> Array:
        v = self.value(t) if callable(self.value) else self.value
        return jnp.broadcast_to(jnp.asarray(v), (len(self.dofs),))


class BCSet:
    """A set of Dirichlet BCs on a [n_dofs, n_eq] state."""

    def __init__(self, space: FunctionSpace, n_eq: int, bcs: list):
        self.bcs = list(bcs)
        self.n_eq = n_eq
        mask = np.zeros((space.n_dofs, n_eq), dtype=bool)
        for bc in self.bcs:
            mask[np.asarray(bc.dofs), bc.eq] = True
        self.mask = jnp.asarray(mask)
        self._dof_idx = [jnp.asarray(np.asarray(bc.dofs), jnp.int32)
                         for bc in self.bcs]

    def values(self, t=0.0) -> Array:
        """BC values scattered into a dense [n_dofs, n_eq] array (zero
        elsewhere)."""
        g = jnp.zeros(self.mask.shape)
        for bc, idx in zip(self.bcs, self._dof_idx):
            g = g.at[idx, bc.eq].set(bc.value_at(t))
        return g

    def apply_to_residual(self, F: Array, u: Array, g: Array) -> Array:
        """Replace constrained residual entries by `u - g`."""
        return jnp.where(self.mask, u - g.astype(u.dtype), F)

    def apply_values(self, u: Array, g: Array) -> Array:
        """Overwrite constrained entries of `u` with their BC values."""
        return jnp.where(self.mask, g.astype(u.dtype), u)


def combine_bcs(space: FunctionSpace, n_eq: int, bcs: list) -> BCSet:
    return BCSet(space, n_eq, bcs)
