"""Quaternion math, batched over leading axes.

Convention: quaternions stored as ``(..., 4)`` arrays in (w, x, y, z) order,
unit-norm, representing rotation from the body frame to the global frame.

Parity target: reference ``HostSideHelpers.hpp:321-354`` (HamiltonProduct,
QuatFromAxisAngle) and ``DEMHelperKernels.cuh`` (applyOriQToVector3), rebuilt
with vectorized jnp ops.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..defines import F


def identity(shape=()):
    q = jnp.zeros(shape + (4,), dtype=F)
    return q.at[..., 0].set(1.0)


def normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def hamilton(q1, q2):
    """Hamilton product q1 ⊗ q2 (composition: rotate by q2 then q1)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def conjugate(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q: body frame -> global frame.

    Uses the 15-multiply form: t = 2 (q_v × v); v' = v + w t + q_v × t.
    """
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def rotate_inv(q, v):
    """Rotate v by the inverse of q: global frame -> body frame."""
    return rotate(conjugate(q), v)


def from_axis_angle(axis, angle):
    """Unit quaternion for rotation of `angle` radians about `axis`.

    Matches reference QuatFromAxisAngle (HostSideHelpers.hpp:321).
    """
    axis = jnp.asarray(axis, dtype=F)
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    half = jnp.asarray(angle, dtype=F) / 2.0
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def integrate(q, omega_body, h):
    """Advance orientation by body-frame angular velocity over step h.

    Matches the reference quaternion update (DEMIntegrationKernels.cu:217-234):
    q_new = normalize(q ⊗ (1, ω_body·h/2)).
    """
    ha = 0.5 * h * omega_body
    dq = jnp.concatenate([jnp.ones_like(ha[..., :1]), ha], axis=-1)
    return normalize(hamilton(q, dq))


def rodrigues(euler_zyx=None, *, yaw=0.0, pitch=0.0, roll=0.0):
    """Quaternion from intrinsic Z-Y-X Euler angles (yaw, pitch, roll)."""
    if euler_zyx is not None:
        yaw, pitch, roll = euler_zyx
    qz = from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), yaw)
    qy = from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]), pitch)
    qx = from_axis_angle(jnp.asarray([1.0, 0.0, 0.0]), roll)
    return hamilton(hamilton(qz, qy), qx)
