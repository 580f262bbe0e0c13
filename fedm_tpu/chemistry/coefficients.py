"""Transport / rate coefficient dependence machinery (device-side).

Replaces the reference's per-step host `np.interp` loops
(`/root/reference/fedm/functions.py:531-750`) with device-resident tables
and jittable evaluation. Dependence kinds:

transport (`Transport_coefficient_interpolation`, `functions.py:621-639`):
  'const' -> ky / N0
  'Umean' -> interp(mean_energy) / N0
  'E/N'   -> interp(reduced_field) / N0
  'ESR'   -> kB * Tgas * mu / e        (Einstein relation)
  'Tgas'  -> interp(Tgas) / N0         (scalar)
  'fun:E' -> compiled expression of E_m (embedded in the residual, as the
             streamer does symbolically, `fedm-streamer.py:237-239`)
  0       -> coefficient absent (missing mobility file), evaluates to 0

rate (`Rate_coefficient_interpolation`, `functions.py:724-750`):
  'const', 'Umean', 'E/N' as above but WITHOUT the /N0 scaling,
  'Te'    -> interp(2*energy/(3*kB_eV))
  'fun:Te,Tgas' / 'fun:Tgas' -> compiled expression of Te/Tgas scalars
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Union

import jax
import jax.numpy as jnp

from ..constants import elementary_charge, kB, kB_eV
from ..ops.exprs import compile_expression
from ..ops.interp import lut_interp

Array = jax.Array


@dataclass
class Coefficient:
    """One coefficient: a dependence tag plus its table/constant/expression."""

    dependence: Union[str, int]
    kx: object = 0.0
    ky: object = 0.0
    kind: str = "transport"  # 'transport' | 'rate'
    expression: Optional[Callable] = None  # compiled fun:* expression

    def __post_init__(self):
        if isinstance(self.dependence, str) and self.dependence.startswith("fun"):
            if self.expression is None and isinstance(self.ky, str):
                self.expression = compile_expression(self.ky)
        if isinstance(self.kx, (list, tuple)) or (
            hasattr(self.kx, "ndim") and getattr(self.kx, "ndim", 0) > 0
        ):
            self.kx = jnp.asarray(self.kx)
            self.ky = jnp.asarray(self.ky)

    def evaluate(
        self,
        N0: float = 1.0,
        Tgas: float = 300.0,
        Te: float = 0.0,
        energy: Optional[Array] = None,
        redfield: Optional[Array] = None,
        mu: Optional[Array] = None,
        like: Optional[Array] = None,
    ):
        """Nodal coefficient values (or scalar for constant kinds).

        `like` supplies the broadcast target for scalar results when a full
        nodal array is wanted.
        """
        dep = self.dependence
        scale = (1.0 / N0) if self.kind == "transport" else 1.0
        if dep == 0:
            out = 0.0
        elif dep in ("const", "const."):
            out = self.ky * scale
        elif dep == "Umean":
            out = lut_interp(energy, self.kx, self.ky) * scale
        elif dep == "E/N":
            out = lut_interp(redfield, self.kx, self.ky) * scale
        elif dep == "Te":
            out = lut_interp(2.0 * energy / (3.0 * kB_eV), self.kx, self.ky)
        elif dep == "ElecDist":
            # EEDF-integrated rate tabulated against the mean electron
            # energy. The reference PARSES this dependence as a two-column
            # table (`file_io.py:374`) but its runtime interpolation has no
            # branch for it (`functions.py:698` omits it) — here it is
            # usable: linear interpolation on the mean energy, like Umean.
            out = lut_interp(energy, self.kx, self.ky) * scale
        elif dep == "ESR":
            if mu is None:
                raise ValueError("ESR dependence requires the mobility 'mu'")
            out = kB * Tgas * mu / elementary_charge
        elif dep == "Tgas":
            out = lut_interp(jnp.asarray(Tgas), self.kx, self.ky) * scale
        elif dep in ("fun:Te,Tgas", "fun:Tgas"):
            out = self.expression(Te=Te, Tgas=Tgas)
        elif dep == "fun:E":
            raise ValueError(
                "fun:E coefficients are field expressions; call "
                ".expression(E_m=...) inside the residual kernel instead"
            )
        else:
            raise ValueError(f"dependence '{dep}' not recognised")
        if like is not None:
            out = jnp.broadcast_to(jnp.asarray(out, like.dtype), like.shape)
        return out

    def table_gradient(self) -> "Coefficient":
        """Derivative table d(ky)/d(kx) for semi-implicit treatment
        (np.gradient of the LUT, as the scripts do, `fedm-gd.py:78-89`)."""
        import numpy as np

        if not (isinstance(self.dependence, str) and hasattr(self.kx, "shape")):
            raise ValueError("table_gradient needs a tabulated dependence")
        dk = np.gradient(np.asarray(self.ky), np.asarray(self.kx))
        # keep the kind: for transport tables the /N0 applied at evaluation
        # equals the reference's pre-scaled derivative tables
        # (np.gradient(D_y, D_x)/N0, `fedm-gd.py:78-79`)
        return Coefficient(self.dependence, self.kx, jnp.asarray(dk),
                           kind=self.kind)


class _CoefficientSet:
    kind = "transport"

    def __init__(self, coefficients: List[Coefficient]):
        self.coefficients = coefficients

    def __len__(self):
        return len(self.coefficients)

    def __getitem__(self, i) -> Coefficient:
        return self.coefficients[i]

    @property
    def dependences(self):
        return [c.dependence for c in self.coefficients]

    def evaluate_all(self, like: Array, **kw) -> List:
        """Evaluate every coefficient as a nodal array shaped like `like`
        (zeros for absent ones)."""
        return [c.evaluate(like=like, **kw) for c in self.coefficients]


class TransportCoefficients(_CoefficientSet):
    kind = "transport"

    @classmethod
    def read(cls, particle_names, transport_type, model, file_input=None):
        from .parsers import read_transport_coefficients

        kxs, kys, deps = read_transport_coefficients(
            particle_names, transport_type, model, file_input=file_input
        )
        return cls([Coefficient(d, kx, ky, kind="transport")
                    for d, kx, ky in zip(deps, kxs, kys)])


class RateCoefficients(_CoefficientSet):
    kind = "rate"

    @classmethod
    def read(cls, rc_file_names, dependences=None):
        from .parsers import read_dependences, read_rate_coefficients

        if dependences is None:
            dependences = read_dependences(rc_file_names)
        kxs, kys = read_rate_coefficients(rc_file_names, dependences)
        return cls([Coefficient(d, kx, ky, kind="rate")
                    for d, kx, ky in zip(dependences, kxs, kys)])
