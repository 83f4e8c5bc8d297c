"""dem_engine_tpu — a TPU-native Discrete Element Method framework.

Capability parity target: projectchrono/DEM-Engine (DEME), re-designed for
JAX/XLA/Pallas on TPU. See SURVEY.md for the structural analysis of the
reference and the design translation table (§7).
"""

__version__ = "0.1.0"

from .defines import TimeIntegrator, Verbosity, OutputContent  # noqa: F401
