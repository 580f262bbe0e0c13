from .parsers import (
    read_speclist,
    reaction_matrices,
    rate_coefficient_file_names,
    read_energy_loss,
    read_dependence,
    read_dependences,
    read_rate_coefficients,
    read_transport_coefficients,
    read_particle_properties,
    read_two_columns,
    read_single_float,
    read_single_string,
)
from .sources import (
    reaction_rates,
    species_sources,
    energy_source_factors,
    semi_implicit_coefficient,
)
from .coefficients import Coefficient, TransportCoefficients, RateCoefficients

__all__ = [
    "read_speclist",
    "reaction_matrices",
    "rate_coefficient_file_names",
    "read_energy_loss",
    "read_dependence",
    "read_dependences",
    "read_rate_coefficients",
    "read_transport_coefficients",
    "read_particle_properties",
    "read_two_columns",
    "read_single_float",
    "read_single_string",
    "reaction_rates",
    "species_sources",
    "energy_source_factors",
    "semi_implicit_coefficient",
    "Coefficient",
    "TransportCoefficients",
    "RateCoefficients",
]
