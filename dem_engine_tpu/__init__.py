"""dem_engine_tpu — a TPU-native Discrete Element Method framework.

Capability parity target: projectchrono/DEM-Engine (DEME), re-designed for
JAX/XLA/Pallas on TPU. See SURVEY.md for the structural analysis of the
reference and the design translation table (§7).
"""

__version__ = "0.3.0"

from .defines import (  # noqa: F401
    ContactOutputContent,
    OutputContent,
    TimeIntegrator,
    Verbosity,
)
from .api import (BoxRegion, DEMInspector, DEMSolver, DEMTracker,  # noqa: F401
                  GetDEMEDataFile, SphereRegion)
from .models import (  # noqa: F401
    ContactContext,
    FamilyChange,
    FamilyPrescription,
    ForceModel,
    HertzianForceModel,
    HertzianFrictionlessForceModel,
)
from .structs import (  # noqa: F401
    DEMClumpBatch,
    DEMClumpTemplate,
    DEMExternObj,
    DEMMaterial,
    DEMMeshConnected,
)
from .utils.samplers import (  # noqa: F401
    DEMBoxGridSampler,
    DEMBoxHCPSampler,
    DEMCylSurfSampler,
    GridSampler,
    HCPSampler,
    PDSampler,
)
