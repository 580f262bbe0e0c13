"""Low-pressure argon glow discharge (LMEA) — the maximal workload.

Re-creation of `examples/glow_discharge/fedm-gd.py` (test variant
`tests/integrated_tests/glow_discharge/fedm_gd.py`): the local mean energy
approximation with a parsed reaction scheme — 1 Torr argon, Becker et al.
`4_particles` chemistry, U = -250 V ramped, T_final = 5e-5 s.

Since round 2 this is a thin configuration of the generic N-species
builder (`fedm_tpu.models.generic.PlasmaModel`): the equations are
GENERATED in a loop over the parsed species list exactly as the reference
builds its weak forms (`fedm-gd.py:344-385`), so this class only pins the
reference script's hand-declared per-species metadata
(`fedm-gd.py:58-61`):

  equation_type = ['reaction', 'diffusion-reaction',
                   'drift-diffusion-reaction', 'drift-diffusion-reaction']
  particle_type = ['Heavy', 'Heavy', 'Heavy', 'electrons']
  particle_species_type = ['Neutral', 'Neutral', 'Ion', 'electrons']
  ref_coeff = (0.3, 0.3, 5e-4, 0.3)

For the 4-species argon tree these coincide with `PlasmaModel`'s derived
defaults (gas -> reaction, neutral -> diffusion-reaction, charged heavy ->
drift-diffusion 'Ion', last species -> electrons), so the class exists for
explicitness and API compatibility. State layout per node:

  u[:, 0] = ln w_e     electron energy density (log)
  u[:, 1] = ln n_Ar*   metastables ('diffusion-reaction')
  u[:, 2] = ln n_Ar+   ions ('drift-diffusion-reaction', grad outside D)
  u[:, 3] = ln n_e     electrons ('drift-diffusion-reaction', grad(D n))
  u[:, 4] = Phi        Poisson

Feature coverage vs the reference script (all inherited from the generic
builder): chemistry front-end parsing (`fedm-gd.py:68-89`), device-resident
LUT interpolation at the previous step's mean energy / reduced field
(`fedm-gd.py:432-443`), semi-implicit coefficients with the mean-energy
linearisation (`fedm-gd.py:215,317-333`), the electron energy equation with
5/3-scaled transport, sentinel energy losses and Joule heating
(`fedm-gd.py:353-359`), 'flux source' electrode boundary conditions with
thermal/drift fluxes, reflection and secondary emission
(`fedm-gd.py:366-388`), the time-ramped cathode voltage (`fedm-gd.py:272`)
and adaptive BDF2 + PID monitored on the energy density
(`fedm/functions.py:1056-1057`).
"""

from __future__ import annotations

from dataclasses import dataclass

from .generic import PlasmaConfig, PlasmaModel


@dataclass
class GlowConfig(PlasmaConfig):
    """The reference glow script's configuration (`fedm-gd.py:40-61`)."""

    ref_metallic: tuple = (0.3, 0.3, 5e-4, 0.3)
    equation_types: tuple = ("reaction", "diffusion-reaction",
                             "drift-diffusion-reaction",
                             "drift-diffusion-reaction")
    particle_types: tuple = ("Heavy", "Heavy", "Heavy", "electrons")
    species_types: tuple = ("Neutral", "Neutral", "Ion", "electrons")


class GlowDischargeModel(PlasmaModel):
    pass
