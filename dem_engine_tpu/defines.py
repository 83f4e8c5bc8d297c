"""Constants and enums for the TPU-native DEM engine.

Capability-parity notes: mirrors the roles of the reference's
``src/DEM/Defines.h`` (contact type codes at Defines.h:74-82, owner types
:88-90, reserved family :110, integrator enum :135-183) without copying its
CUDA-specific layout. All device-visible IDs here are int32 because TPUs
have first-class i32 support (the reference uses u8/u16/u32 compaction,
see SURVEY.md §5.7).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# dtypes
# ---------------------------------------------------------------------------
F = jnp.float32
I = jnp.int32

# Sentinel for "no entry" in padded index arrays. We use -1 for readability;
# helpers convert to an out-of-bounds positive index before scatter/gather so
# that JAX's mode="drop"/"fill" semantics apply cleanly.
NULL_ID = -1

# ---------------------------------------------------------------------------
# Contact types (codes compatible in spirit with reference Defines.h:74-82)
# ---------------------------------------------------------------------------
NOT_A_CONTACT = 0
SPHERE_SPHERE_CONTACT = 1
SPHERE_MESH_CONTACT = 2
SPHERE_ANALYTICAL_CONTACT = 10
SPHERE_PLANE_CONTACT = 11
SPHERE_PLATE_CONTACT = 12
SPHERE_CYL_CONTACT = 13
SPHERE_CONE_CONTACT = 14
SPHERE_BOX_CONTACT = 15  # extension: analytical box (not in reference)

# Analytical object type codes (reference BdrsAndObjs.h:28 OBJ_COMPONENT)
ANAL_PLANE = 0
ANAL_PLATE = 1
ANAL_CYL_INF = 2
ANAL_CONE = 3
ANAL_BOX = 4

# Entity normal direction as the narrow-phase sign convention
# (reference checkSphereEntityOverlap: overlap = r - sign*(cyl_rad - dr);
# INWARD keeps spheres inside a drum => sign +1, OUTWARD keeps them outside
# a pillar => sign -1)
ENTITY_NORMAL_INWARD = 1.0
ENTITY_NORMAL_OUTWARD = -1.0

# Owner types (reference Defines.h:88-90)
OWNER_CLUMP = 1
OWNER_ANALYTICAL = 2
OWNER_MESH = 4

# ---------------------------------------------------------------------------
# Families (reference Defines.h:110: family 255 reserved as always-fixed)
# ---------------------------------------------------------------------------
NUM_FAMILIES = 256
RESERVED_FAMILY = NUM_FAMILIES - 1
DEFAULT_FAMILY = 0

# ---------------------------------------------------------------------------
# Integrators (reference Defines.h TIME_INTEGRATOR + the three
# IntegrationVelPassOn*.cu policies)
# ---------------------------------------------------------------------------
class TimeIntegrator(enum.Enum):
    FORWARD_EULER = "forward_euler"
    CENTERED_DIFFERENCE = "centered_difference"
    EXTENDED_TAYLOR = "extended_taylor"


class Verbosity(enum.IntEnum):
    QUIET = 0
    ERROR = 10
    WARNING = 20
    INFO = 30
    STEP_ANOMALY = 32
    STEP_METRIC = 35
    DEBUG = 40
    STEP_DEBUG = 50


# Output content flags (reference Defines.h:152-183 OUTPUT_CONTENT)
class OutputContent(enum.Flag):
    XYZ = enum.auto()
    QUAT = enum.auto()
    ABSV = enum.auto()
    VEL = enum.auto()
    ANG_VEL = enum.auto()
    ABS_ACC = enum.auto()
    ACC = enum.auto()
    ANG_ACC = enum.auto()
    FAMILY = enum.auto()
    MAT = enum.auto()
    OWNER_WILDCARD = enum.auto()
    GEO_WILDCARD = enum.auto()
    EXP_FACTOR = enum.auto()


class OutputFormat(enum.Enum):
    """File format for Write*File (reference OUTPUT_FORMAT, API.h:1317-1354).
    BINARY/CHPF both map to compressed .npz column archives here (the
    reference's binary and Chpf formats are CUDA-host-side serializations
    with no TPU-relevant structure; npz keeps the same named columns)."""

    CSV = "csv"
    BINARY = "binary"
    CHPF = "chpf"


class ContactOutputContent(enum.Flag):
    CNT_TYPE = enum.auto()
    FORCE = enum.auto()
    POINT = enum.auto()
    COMPONENT = enum.auto()
    NORMAL = enum.auto()
    TORQUE = enum.auto()
    CNT_WILDCARD = enum.auto()
    OWNER = enum.auto()
    GEO_ID = enum.auto()
    NICKNAME = enum.auto()


# ---------------------------------------------------------------------------
# Solver tunables — same operating point as the reference (BASELINE.md)
# ---------------------------------------------------------------------------
DEFAULT_UPDATE_FREQ = 20          # reference API.h:1509
DEFAULT_EXPAND_SAFETY_MULTI = 1.0  # reference API.h:1481
DEFAULT_EXPAND_SAFETY_ADDER = 0.0  # reference API.h:1484 uses 3 m/s "base vel";
                                   # we size margins from measured velocity and
                                   # let users add via SetExpandSafetyAdder.
DEFAULT_ERROR_OUT_VEL = 5e4        # reference API.h:240
DEFAULT_MAX_SPH_IN_BIN = 32        # capacity cap per bin (ref uses 512/threads)
DEFAULT_MAX_TRI_IN_BIN = 32
DEFAULT_CONTACT_SAFETY = 1.25      # contact-capacity growth headroom
TINY_FLOAT = 1e-12
HUGE_FLOAT = 1e30

__all__ = [name for name in dir() if not name.startswith("_")]
