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

import jax
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


# ---------------------------------------------------------------------------
# record packing: TPU gathers are far cheaper as ONE wide row-gather than as
# many scalar gathers, so the hot per-owner fields are packed into a single
# f32 matrix once per step (elementwise, cheap) and unpacked after the
# gather. Integer fields are exact in f32 up to 2^24 (voxel indices are
# bounded by 2^20, families by 256).
# ---------------------------------------------------------------------------

_OWNER_REC_W = 21  # vox3 loc3 quat4 vel3 omg3 mass1 moi3 family1


def pack_owner_records(owners: Owners):
    return jnp.concatenate(
        [
            owners.vox.astype(F),
            owners.loc,
            owners.quat,
            owners.vel,
            owners.omg,
            owners.mass[:, None],
            owners.moi,
            owners.family.astype(F)[:, None],
        ],
        axis=1,
    )


def _unpack_owner(rec, owners: Owners, idx):
    d = dict(
        vox=rec[:, 0:3].astype(I),
        loc=rec[:, 3:6],
        quat=rec[:, 6:10],
        vel=rec[:, 10:13],
        omg=rec[:, 13:16],
        mass=rec[:, 16],
        moi=rec[:, 17:20],
        family=rec[:, 20].astype(I),
        wc={k: v[idx] for k, v in owners.wildcards.items()},
    )
    return d


def _gather_owner(owners: Owners, idx, rec_table=None):
    if rec_table is not None:
        return _unpack_owner(rec_table[idx], owners, idx)
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


_SPH_REC_W = 6  # owner1 relpos3 radius1 mat1


def pack_sphere_records(spheres: Spheres):
    return jnp.concatenate(
        [
            spheres.owner.astype(F)[:, None],
            spheres.relpos,
            spheres.radius[:, None],
            spheres.mat.astype(F)[:, None],
        ],
        axis=1,
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
    owner_rec=None,
    sph_rec=None,
):
    """Evaluate one contact class. Returns per-contact arrays:
    (ownerA, ownerB, F, F_tq, cp_a, cp_b, quatA, quatB, new_table)."""
    live = table.idA >= 0
    iA = jnp.where(live, table.idA, 0)
    iB = jnp.where(live, table.idB, 0)
    if owner_rec is None:
        owner_rec = pack_owner_records(owners)
    if sph_rec is None:
        sph_rec = pack_sphere_records(spheres)

    ra = sph_rec[iA]
    own_a = ra[:, 0].astype(I)
    A = _gather_owner(owners, own_a, owner_rec)
    A["owner_id"] = own_a
    rel_a = quat.rotate(A["quat"], ra[:, 1:4])
    rad_a = ra[:, 4]
    mat_a = ra[:, 5].astype(I)
    geo_wc_a = {k: v[iA] for k, v in spheres.wildcards.items()}

    if kind == "ss":
        rb = sph_rec[iB]
        own_b = rb[:, 0].astype(I)
        B = _gather_owner(owners, own_b, owner_rec)
        B["owner_id"] = own_b
        d = rel_pos(B["vox"], B["loc"], A["vox"], A["loc"], voxel_size)
        pos_b = d + quat.rotate(B["quat"], rb[:, 1:4])
        rad_b = rb[:, 4]
        mat_b = rb[:, 5].astype(I)
        geo_wc_b = {k: v[iB] for k, v in spheres.wildcards.items()}
        overlap, b2a, cp = narrowphase.sphere_sphere(rel_a, rad_a, pos_b, rad_b)
        ctype = SPHERE_SPHERE_CONTACT
    elif kind == "st":
        own_b = tris.owner[iB]
        B = _gather_owner(owners, own_b, owner_rec)
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
        B = _gather_owner(owners, own_b, owner_rec)
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

    # per-contact, per-side wrench records [force(3), body-frame torque(3)]
    f_tot = force + torque_only
    lcp_a = quat.rotate_inv(A["quat"], cp_a)
    tq_a = jnp.cross(lcp_a, quat.rotate_inv(A["quat"], f_tot))
    lcp_b = quat.rotate_inv(B["quat"], cp_b)
    tq_b = jnp.cross(lcp_b, quat.rotate_inv(B["quat"], -f_tot))

    return dict(
        owner_a=owner_a,
        owner_b=owner_b,
        force=force,
        torque_only=torque_only,
        rec_a=jnp.concatenate([force, tq_a], axis=1),
        rec_b=jnp.concatenate([-force, tq_b], axis=1),
        table=new_table,
    )


def reduce_wrench(n_owners: int, passes) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sum per-contact wrench records into per-owner force & body-frame
    torque accumulators via scatter-add (division by mass/MOI happens in the
    integrator)."""
    acc = jnp.zeros((n_owners, 6), F)
    for p in passes:
        ia = jnp.where(p["owner_a"] >= 0, p["owner_a"], n_owners)
        acc = acc.at[ia].add(p["rec_a"], mode="drop")
        ib = jnp.where(p["owner_b"] >= 0, p["owner_b"], n_owners)
        acc = acc.at[ib].add(p["rec_b"], mode="drop")
    return acc[:, :3], acc[:, 3:]


def build_reduction_plan(owner_ids, n_owners: int, depth: int):
    """Per-owner gather plan: plan[(owner, d)] = contact slot of the d-th
    contact this owner participates in (== cap for none).

    Built once per CD refresh; per step the wrench reduction becomes D wide
    row-gathers + a dense sum — no scatter in the hot loop. This is the TPU
    answer to DEME's sort+reduce-by-key force collection
    (DEMCubForceCollection.cu:19, incl. its owner-index caching :45-64).
    Returns (plan i32[n_owners*depth], overflow bool).
    """
    cap = owner_ids.shape[0]
    own = jnp.where(owner_ids >= 0, owner_ids, n_owners)
    so, slot = jax.lax.sort((own, jnp.arange(cap, dtype=I)), num_keys=1)
    k = jnp.arange(cap, dtype=I)
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), so[1:] != so[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(boundary, k, 0))
    rank = k - run_start
    ok = (so < n_owners) & (rank < depth)
    dest = jnp.where(ok, so * depth + rank, n_owners * depth)
    plan = jnp.full((n_owners * depth,), cap, I).at[dest].set(
        slot, mode="drop", unique_indices=True
    )
    overflow = jnp.any((so < n_owners) & (rank >= depth))
    return plan, overflow


def reduce_wrench_gather(n_owners: int, passes, depth: int):
    """Gather-plan wrench reduction (see build_reduction_plan)."""
    acc = jnp.zeros((n_owners, 6), F)
    for p in passes:
        table = p["table"]
        for rec, plan in ((p["rec_a"], table.plan_a),
                          (p["rec_b"], table.plan_b)):
            padded = jnp.concatenate([rec, jnp.zeros((1, 6), F)], axis=0)
            idx = plan.reshape(n_owners, depth)
            acc = acc + padded[idx].sum(axis=1)
    return acc[:, :3], acc[:, 3:]
