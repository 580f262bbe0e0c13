"""Physical constants (SI units).

Same set of CODATA constants the reference exposes
(`/root/reference/fedm/physical_constants.py:1-15`); values are physical
constants, kept bit-identical so coefficient pipelines (e.g. the Einstein
relation `ESR` dependence, `functions.py:633`) agree numerically.
"""

elementary_charge = 1.6021766208e-19  # [C]
me = 9.10938356e-31  # electron mass [kg]
epsilon_0 = 8.854187817e-12  # vacuum permittivity [F/m]
kB = 1.38064852e-23  # Boltzmann constant [J/K]
kB_eV = 8.6173303e-5  # Boltzmann constant [eV/K]
speed_of_light = 2.99792458e8  # [m/s]
h_planck = 6.62607015e-34  # [J s]
mag_perm = 1.25663706212e-6  # vacuum permeability [N/A^2]
N_avogadro = 6.02214076e23  # [1/mol]
Ry_const = 10973731.568160  # Rydberg constant [1/m]
M_atomic = 1.66053906660e-27  # atomic mass unit [kg]

pi = 3.141592653589793

# dolfin's DOLFIN_EPS, used by the reference in its relative-error estimate
# (`fedm/functions.py:1062-1064`); kept for trajectory-compatible error norms.
DOLFIN_EPS = 3e-16
