"""er3t_tpu — a TPU-native 3D Monte Carlo radiative transfer framework.

Capabilities of EaR3T (hong-chen/er3t) with an in-framework JAX/Pallas photon
transport engine replacing the external MCARaTS / libRadtran solvers.
"""

from . import common  # noqa: F401

__version__ = '0.1.0'
