"""Narrow-phase contact geometry, batched and branch-free.

Parity targets: checkSpheresOverlap (DEMHelperKernels.cuh:293),
checkSphereEntityOverlap (:460, plane + infinite cylinder),
snap_to_face / triangle_sphere_CD (DEMCollisionKernels.cu:16,99).
All functions operate on arrays batched over the leading (contact) axis and
return (overlap, b2a_normal, contact_point) with the reference's
conventions: b2a points from body B toward body A; the contact point sits at
the middle of the penetration region; overlap > 0 means touching.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..defines import (
    ANAL_CYL_INF,
    ANAL_PLANE,
    F,
    TINY_FLOAT,
)


def _norm(v, axis=-1):
    return jnp.linalg.norm(v, axis=axis)


def sphere_sphere(pos_a, rad_a, pos_b, rad_b):
    """Sphere–sphere overlap. Positions may be in any common frame.

    Returns (overlap, b2a, cp) with cp in the same frame as the inputs
    (matching checkSpheresOverlap: cp = B + (radB - overlap/2) * b2a).
    """
    d = pos_a - pos_b
    dist = _norm(d)
    safe = jnp.maximum(dist, TINY_FLOAT)
    b2a = d / safe[..., None]
    overlap = rad_a + rad_b - dist
    cp = pos_b + (rad_b - overlap / 2.0)[..., None] * b2a
    return overlap, b2a, cp


def closest_point_triangle(p, a, b, c):
    """Closest point on triangle (a,b,c) to point p, vectorized.

    Branch-free re-derivation of Ericson's algorithm (the reference's
    snap_to_face, DEMCollisionKernels.cu:16) using nested where-selects.
    All inputs (..., 3).
    """
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)

    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)

    cp_ = p - c
    d5 = jnp.sum(ab * cp_, -1)
    d6 = jnp.sum(ac * cp_, -1)

    vc = d1 * d4 - d3 * d2
    vb = d5 * d2 - d1 * d6
    va = d3 * d6 - d5 * d4

    # region tests, evaluated in Ericson's order; first-true wins
    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    in_c = (d6 >= 0) & (d5 <= d6)
    in_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    in_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    def safe_div(x, y):
        return x / jnp.where(jnp.abs(y) > TINY_FLOAT, y, 1.0)

    v_ab = safe_div(d1, d1 - d3)
    w_ac = safe_div(d2, d2 - d6)
    w_bc = safe_div(d4 - d3, (d4 - d3) + (d5 - d6))
    denom = safe_div(jnp.ones_like(va), va + vb + vc)
    v_f = vb * denom
    w_f = vc * denom

    p_face = a + v_f[..., None] * ab + w_f[..., None] * ac
    # build up the result with reversed-priority selects
    res = p_face
    res = jnp.where(in_bc[..., None], b + w_bc[..., None] * (c - b), res)
    res = jnp.where(in_ac[..., None], a + w_ac[..., None] * ac, res)
    res = jnp.where(in_c[..., None], c, res)
    res = jnp.where(in_ab[..., None], a + v_ab[..., None] * ab, res)
    res = jnp.where(in_b[..., None], b, res)
    res = jnp.where(in_a[..., None], a, res)
    return res


def sphere_triangle(center, radius, v0, v1, v2):
    """Sphere vs (double-sided) triangle face.

    Returns (overlap, b2a, cp) with b2a from the triangle surface toward the
    sphere center (the A body is the sphere, matching SPHERE_MESH_CONTACT
    role assignment) and cp at the middle of the penetration region.
    """
    closest = closest_point_triangle(center, v0, v1, v2)
    d = center - closest
    dist = _norm(d)
    # degenerate (center exactly on the face plane): fall back to face normal
    face_n = jnp.cross(v1 - v0, v2 - v0)
    face_n = face_n / jnp.maximum(_norm(face_n), TINY_FLOAT)[..., None]
    ok = dist > TINY_FLOAT
    b2a = jnp.where(ok[..., None], d / jnp.maximum(dist, TINY_FLOAT)[..., None], face_n)
    overlap = radius - dist
    cp = jnp.where(
        ok[..., None],
        center - (radius - overlap / 2.0)[..., None] * b2a,
        closest,
    )
    return overlap, b2a, cp


def sphere_plane(center, radius, plane_pos, plane_n):
    """Sphere vs infinite directional plane (checkSphereEntityOverlap,
    ANAL_OBJ_TYPE_PLANE case)."""
    dist = jnp.sum((center - plane_pos) * plane_n, -1)
    overlap = radius - dist
    cp = center - plane_n * (dist + overlap / 2.0)[..., None]
    return overlap, plane_n, cp


def sphere_cylinder(center, radius, cyl_pos, cyl_axis, cyl_rad, normal_sign):
    """Sphere vs infinite cylinder. normal_sign follows defines.py:
    ENTITY_NORMAL_INWARD = +1 keeps spheres INSIDE the cylinder (drum:
    overlap = radius - (cyl_rad - dr)), ENTITY_NORMAL_OUTWARD = -1 keeps
    them outside. (checkSphereEntityOverlap, ANAL_OBJ_TYPE_CYL_INF.)"""
    s2c = cyl_pos - center
    proj = jnp.sum(s2c * cyl_axis, -1)
    radial = s2c - proj[..., None] * cyl_axis  # sphere -> axis, radial
    dr = _norm(radial)
    overlap = radius - normal_sign * (cyl_rad - dr)
    ok = dr > TINY_FLOAT
    n = jnp.where(
        ok[..., None],
        normal_sign[..., None] * radial / jnp.maximum(dr, TINY_FLOAT)[..., None],
        cyl_axis,
    )
    cp = jnp.where(
        ok[..., None],
        center - n * (radius - overlap / 2.0)[..., None],
        center,
    )
    return overlap, n, cp


def sphere_analytical(center, radius, objtype, obj_pos, obj_dir, obj_size, normal_sign):
    """Dispatch over analytical object types with masked selects.

    Only a handful of types exist (the reference implements plane and
    infinite cylinder, DEMHelperKernels.cuh:460-520), so we compute each and
    select — cheaper than gather-heavy branching on TPU.
    """
    o_p, n_p, c_p = sphere_plane(center, radius, obj_pos, obj_dir)
    o_c, n_c, c_c = sphere_cylinder(
        center, radius, obj_pos, obj_dir, obj_size[..., 0], normal_sign
    )
    is_cyl = (objtype == ANAL_CYL_INF)[..., None]
    is_cyl1 = objtype == ANAL_CYL_INF
    overlap = jnp.where(is_cyl1, o_c, o_p)
    normal = jnp.where(is_cyl, n_c, n_p)
    cp = jnp.where(is_cyl, c_c, c_p)
    known = (objtype == ANAL_PLANE) | (objtype == ANAL_CYL_INF)
    overlap = jnp.where(known, overlap, -jnp.asarray(1e30, F))
    return overlap, normal, cp
