"""Voxel + in-voxel float coordinate scheme.

The reference keeps double-precision-equivalent positions as a packed u64
voxel ID plus u16 fixed-point sub-voxel offsets (VariableTypes.h:19-21,
codecs in DEMHelperKernels.cuh:92-138). TPUs have no fast u64/f64, so we
re-express the same idea TPU-natively: an int32 voxel index **per axis**
plus a float32 offset within the voxel. Absolute precision is uniform across
the domain (~1e-7 × voxel_size), and relative positions between nearby
bodies are exact in the integer part:

    rel = (vox_a - vox_b) * voxel_size + (loc_a - loc_b)        (all f32)

Positions here are relative to the domain's LBF (lower-bottom-front) corner,
exactly like the reference (DEMIntegrationKernels.cu:119-125).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..defines import F, I

# Keep |vox_a - vox_b| * voxel_size exactly representable in f32 and leave
# headroom in i32: 2^20 voxels per axis by default.
DEFAULT_VOXELS_PER_AXIS = 1 << 20


def choose_voxel_size(domain_extents) -> float:
    """Pick a voxel size so the largest extent spans DEFAULT_VOXELS_PER_AXIS.

    Plays the role of the reference's figureOutNV voxel-bit budgeting
    (APIPrivate.cpp:373-487) without the u64 packing.
    """
    return float(np.max(np.asarray(domain_extents, dtype=np.float64))) / (
        DEFAULT_VOXELS_PER_AXIS
    )


def encode(pos, voxel_size):
    """Split LBF-relative positions (f64 numpy or f32 jnp) into (vox, loc)."""
    pos = jnp.asarray(pos)
    scaled = pos / voxel_size
    vox = jnp.floor(scaled).astype(I)
    loc = (pos - vox.astype(pos.dtype) * voxel_size).astype(F)
    return vox, loc


def encode_host(pos, voxel_size):
    """Exact host-side (numpy, float64) encode for initialization / IO."""
    pos = np.asarray(pos, dtype=np.float64)
    vox = np.floor(pos / voxel_size).astype(np.int32)
    loc = (pos - vox.astype(np.float64) * voxel_size).astype(np.float32)
    return vox, loc


def decode_host(vox, loc, voxel_size):
    """Exact host-side decode to float64 LBF-relative positions."""
    return np.asarray(vox, dtype=np.float64) * float(voxel_size) + np.asarray(
        loc, dtype=np.float64
    )


def decode_f32(vox, loc, voxel_size):
    """Approximate f32 absolute position (LBF-relative). Only for binning and
    margin-tolerant uses; precision degrades with distance from the origin."""
    return vox.astype(F) * voxel_size + loc


def advance(vox, loc, disp, voxel_size):
    """Move by displacement `disp` (f32), renormalizing loc into [0, vs).

    This is the TPU equivalent of the reference positionToVoxelID update at
    DEMIntegrationKernels.cu:213-215.
    """
    loc = loc + disp
    shift = jnp.floor(loc / voxel_size)
    vox = vox + shift.astype(I)
    loc = loc - shift * voxel_size
    return vox, loc


def rel_pos(vox_a, loc_a, vox_b, loc_b, voxel_size):
    """Position of A relative to B in f32: exact int diff + local f32 diff."""
    return (vox_a - vox_b).astype(F) * voxel_size + (loc_a - loc_b)
