"""QField: quadrature-point scalar fields carrying their spatial gradient.

UFL forms like `grad(D_si * exp(u))` — where `D_si` is itself an expression
of several P1 fields (the semi-implicit coefficient treatment,
`/root/reference/fedm/functions.py:753-774`, used at
`examples/glow_discharge/fedm-gd.py:349-359`) — expand by the chain rule
over every interpolated factor. Rather than hand-expanding those products,
a QField is a forward-mode dual number over SPACE: (value, gradient) at
each quadrature point, with arithmetic overloads that propagate gradients.
Built from gathered element values via `QField.from_nodal`, all operations
remain jax-traceable, so the Newton Jacobian additionally differentiates
through them in the state direction automatically.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclass
class QField:
    val: Array   # [n_cells, n_q]
    grad: Array  # [n_cells, n_q, dim]

    @staticmethod
    def from_nodal(batch, field_e: Array) -> "QField":
        """From gathered nodal values [n_cells/facets, n_local]."""
        return QField(batch.value(field_e), batch.grad(field_e))

    @staticmethod
    def const(c, like: "QField") -> "QField":
        val = jnp.broadcast_to(jnp.asarray(c, like.val.dtype), like.val.shape)
        return QField(val, jnp.zeros_like(like.grad))

    def _coerce(self, other) -> "QField":
        if isinstance(other, QField):
            return other
        return QField.const(other, self)

    def __add__(self, other):
        o = self._coerce(other)
        return QField(self.val + o.val, self.grad + o.grad)

    __radd__ = __add__

    def __sub__(self, other):
        o = self._coerce(other)
        return QField(self.val - o.val, self.grad - o.grad)

    def __rsub__(self, other):
        o = self._coerce(other)
        return QField(o.val - self.val, o.grad - self.grad)

    def __mul__(self, other):
        o = self._coerce(other)
        return QField(
            self.val * o.val,
            self.grad * o.val[..., None] + o.grad * self.val[..., None],
        )

    __rmul__ = __mul__

    def __truediv__(self, other):
        o = self._coerce(other)
        val = self.val / o.val
        grad = (self.grad * o.val[..., None] - o.grad * self.val[..., None]) / (
            o.val * o.val
        )[..., None]
        return QField(val, grad)

    def __rtruediv__(self, other):
        return self._coerce(other).__truediv__(self)

    def __neg__(self):
        return QField(-self.val, -self.grad)

    def exp(self) -> "QField":
        e = jnp.exp(self.val)
        return QField(e, e[..., None] * self.grad)
