"""Per-contact force evaluation and owner-wrench reduction.

This is dT's hot path re-expressed functionally: ingredient gathering +
narrow phase + user force model (calculateContactForces,
DEMCalcForceKernels.cu:44) followed by the reduction of per-contact forces
into per-owner linear/angular accelerations (collectContactForcesThruCub,
DEMCubForceCollection.cu:19 / forceToAcc / forceToAngAcc).

Conventions preserved from the reference:
  * force is computed ON body A (the sphere) in the global frame; B gets -F;
  * the torque-only force (rolling resistance) contributes torque at the
    contact point but no linear force (DEMCollectForceKernels.cu:120-135);
  * angular acceleration is assembled in each owner's body frame:
    alpha += cross(cp_local, R^-1(±(F + F_tq))) / MOI.

All geometry is evaluated in a frame centered on owner A's CoM with global
orientation, so every coordinate is a small f32 even in huge domains (the
voxel scheme gives the exact inter-owner offset).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from ..defines import (
    F,
    HUGE_FLOAT,
    I,
    SPHERE_ANALYTICAL_CONTACT,
    SPHERE_MESH_CONTACT,
    SPHERE_SPHERE_CONTACT,
)
from ..models.force_model import ContactContext
from ..state import Analyticals, ContactTable, Owners, RuntimeParams, Spheres, Triangles
from . import narrowphase, quat
from .voxel import rel_pos


def _gather_owner(owners: Owners, idx):
    return dict(
        vox=owners.vox[idx],
        loc=owners.loc[idx],
        quat=owners.quat[idx],
        vel=owners.vel[idx],
        omg=owners.omg[idx],
        family=owners.family[idx],
        mass=owners.mass[idx],
        moi=owners.moi[idx],
        wc={k: v[idx] for k, v in owners.wildcards.items()},
    )


def _make_ctx(table, overlap, b2a, cp_a, cp_b, A, B, a_geo, b_geo,
              a_rad, b_rad, a_mat, b_mat, a_geo_wc, b_geo_wc,
              ctype, params: RuntimeParams, time):
    return ContactContext(
        overlap=overlap,
        b2a=b2a,
        cp_a=cp_a,
        cp_b=cp_b,
        a_radius=a_rad,
        b_radius=b_rad,
        contact_type=jnp.full(overlap.shape, ctype, I),
        a_lin_vel=A["vel"],
        b_lin_vel=B["vel"],
        a_rot_vel=A["omg"],
        b_rot_vel=B["omg"],
        a_quat=A["quat"],
        b_quat=B["quat"],
        a_mass=A["mass"],
        b_mass=B["mass"],
        a_moi=A["moi"],
        b_moi=B["moi"],
        a_owner=A["owner_id"],
        b_owner=B["owner_id"],
        a_geo=a_geo,
        b_geo=b_geo,
        a_family=A["family"],
        b_family=B["family"],
        a_mat=a_mat,
        b_mat=b_mat,
        time=time,
        ts=params.h,
        wildcards=table.wildcards,
        a_geo_wc=a_geo_wc,
        b_geo_wc=b_geo_wc,
        a_owner_wc=A["wc"],
        b_owner_wc=B["wc"],
        mat_props=params.mat_props,
        pair_props=params.pair_props,
    )


def contact_pass(
    kind: str,
    table: ContactTable,
    owners: Owners,
    spheres: Spheres,
    tris: Triangles,
    anals: Analyticals,
    params: RuntimeParams,
    time,
    voxel_size: float,
    model,
):
    """Evaluate one contact class. Returns per-contact arrays:
    (ownerA, ownerB, F, F_tq, cp_a, cp_b, quatA, quatB, new_table)."""
    live = table.idA >= 0
    iA = jnp.where(live, table.idA, 0)
    iB = jnp.where(live, table.idB, 0)

    own_a = spheres.owner[iA]
    A = _gather_owner(owners, own_a)
    A["owner_id"] = own_a
    rel_a = quat.rotate(A["quat"], spheres.relpos[iA])
    rad_a = spheres.radius[iA]
    mat_a = spheres.mat[iA]
    geo_wc_a = {k: v[iA] for k, v in spheres.wildcards.items()}

    if kind == "ss":
        own_b = spheres.owner[iB]
        B = _gather_owner(owners, own_b)
        B["owner_id"] = own_b
        d = rel_pos(B["vox"], B["loc"], A["vox"], A["loc"], voxel_size)
        pos_b = d + quat.rotate(B["quat"], spheres.relpos[iB])
        rad_b = spheres.radius[iB]
        mat_b = spheres.mat[iB]
        geo_wc_b = {k: v[iB] for k, v in spheres.wildcards.items()}
        overlap, b2a, cp = narrowphase.sphere_sphere(rel_a, rad_a, pos_b, rad_b)
        ctype = SPHERE_SPHERE_CONTACT
    elif kind == "st":
        own_b = tris.owner[iB]
        B = _gather_owner(owners, own_b)
        B["owner_id"] = own_b
        d = rel_pos(B["vox"], B["loc"], A["vox"], A["loc"], voxel_size)
        nodes = quat.rotate(B["quat"][:, None, :], tris.nodes[iB]) + d[:, None, :]
        overlap, b2a, cp = narrowphase.sphere_triangle(
            rel_a, rad_a, nodes[:, 0], nodes[:, 1], nodes[:, 2]
        )
        rad_b = jnp.full(rad_a.shape, HUGE_FLOAT, F)
        mat_b = tris.mat[iB]
        geo_wc_b = {k: v[iB] for k, v in tris.wildcards.items()}
        ctype = SPHERE_MESH_CONTACT
    elif kind == "sa":
        own_b = anals.owner[iB]
        B = _gather_owner(owners, own_b)
        B["owner_id"] = own_b
        d = rel_pos(B["vox"], B["loc"], A["vox"], A["loc"], voxel_size)
        obj_pos = d + quat.rotate(B["quat"], anals.relpos[iB])
        obj_dir = quat.rotate(B["quat"], anals.direction[iB])
        overlap, b2a, cp = narrowphase.sphere_analytical(
            rel_a, rad_a, anals.objtype[iB], obj_pos, obj_dir,
            anals.size[iB], anals.normal_sign[iB],
        )
        rad_b = jnp.full(rad_a.shape, HUGE_FLOAT, F)
        mat_b = anals.mat[iB]
        geo_wc_b = {k: v[iB] for k, v in anals.wildcards.items()}
        ctype = SPHERE_ANALYTICAL_CONTACT
    else:  # pragma: no cover
        raise ValueError(kind)

    cp_a = cp  # cp is already relative to owner A CoM, global orientation
    cp_b = cp - d

    ctx = _make_ctx(
        table, overlap, b2a, cp_a, cp_b, A, B, iA, iB, rad_a, rad_b,
        mat_a, mat_b, geo_wc_a, geo_wc_b, ctype, params, time,
    )
    force, torque_only, new_wc = model.fn(ctx)

    live3 = live[:, None]
    force = jnp.where(live3, force, 0.0)
    torque_only = jnp.where(live3, torque_only, 0.0)
    wildcards = dict(table.wildcards)
    for k, v in new_wc.items():
        wildcards[k] = jnp.where(live, v, 0.0)

    new_table = table.replace(
        force=force, torque=torque_only, cpoint=jnp.where(live3, cp_a, 0.0),
        wildcards=wildcards,
    )
    owner_a = jnp.where(live, own_a, -1)
    owner_b = jnp.where(live, own_b, -1)
    return dict(
        owner_a=owner_a,
        owner_b=owner_b,
        force=force,
        torque_only=torque_only,
        cp_a=cp_a,
        cp_b=cp_b,
        quat_a=A["quat"],
        quat_b=B["quat"],
        table=new_table,
    )


def reduce_wrench(n_owners: int, passes) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sum per-contact forces/torques into per-owner force & body-frame
    torque accumulators (division by mass/MOI happens in the integrator)."""
    f_acc = jnp.zeros((n_owners, 3), F)
    t_acc = jnp.zeros((n_owners, 3), F)
    for p in passes:
        f_tot = p["force"] + p["torque_only"]
        # A side
        ia = jnp.where(p["owner_a"] >= 0, p["owner_a"], n_owners)
        lcp_a = quat.rotate_inv(p["quat_a"], p["cp_a"])
        fl_a = quat.rotate_inv(p["quat_a"], f_tot)
        tq_a = jnp.cross(lcp_a, fl_a)
        f_acc = f_acc.at[ia].add(p["force"], mode="drop")
        t_acc = t_acc.at[ia].add(tq_a, mode="drop")
        # B side
        ib = jnp.where(p["owner_b"] >= 0, p["owner_b"], n_owners)
        lcp_b = quat.rotate_inv(p["quat_b"], p["cp_b"])
        fl_b = quat.rotate_inv(p["quat_b"], -f_tot)
        tq_b = jnp.cross(lcp_b, fl_b)
        f_acc = f_acc.at[ib].add(-p["force"], mode="drop")
        t_acc = t_acc.at[ib].add(tq_b, mode="drop")
    return f_acc, t_acc
