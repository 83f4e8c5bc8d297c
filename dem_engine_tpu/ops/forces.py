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

_OWNER_REC_W = 32  # vox3 loc3 quat4 vel3 omg3 mass1 moi3 family1 + pad
# (padded to 32 f32 = 128 B so each gather row is lane-aligned)


def pack_owner_records(owners: Owners):
    n = owners.vox.shape[0]
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
            jnp.zeros((n, _OWNER_REC_W - 21), F),
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


# ---------------------------------------------------------------------------
# per-contact static denormalization (built once per CD refresh): the step
# loop then touches only the contact table (contiguous) plus TWO owner-record
# row-gathers per contact. Layout (f32, ints exact < 2^24), width 20:
#   [0] ownerA  [1] ownerB  [2:5] relposA  [5] radA  [6] matA  [7] matB
#   ss: [8:11] relposB [11] radB
#   st: [8:17] triangle nodes (body frame)
#   sa: [8] objtype [9:12] relpos [12:15] direction [15] size1 [16] sign
# ---------------------------------------------------------------------------

STATIC_W = 20


def build_static_rec(kind, table, spheres: Spheres, tris: Triangles,
                     anals: Analyticals):
    live = table.idA >= 0
    iA = jnp.where(live, table.idA, 0)
    iB = jnp.where(live, table.idB, 0)
    cap = table.cap
    own_a = jnp.where(live, spheres.owner[iA], -1)
    cols = [
        own_a.astype(F)[:, None],
        None,  # ownerB below
        spheres.relpos[iA],
        spheres.radius[iA][:, None],
        spheres.mat[iA].astype(F)[:, None],
        None,  # matB below
    ]
    if kind == "ss":
        own_b = jnp.where(live, spheres.owner[iB], -1)
        mat_b = spheres.mat[iB]
        rest = jnp.concatenate(
            [
                spheres.relpos[iB],
                spheres.radius[iB][:, None],
                jnp.zeros((cap, STATIC_W - 12), F),
            ],
            axis=1,
        )
    elif kind == "st":
        own_b = jnp.where(live, tris.owner[iB], -1)
        mat_b = tris.mat[iB]
        rest = jnp.concatenate(
            [
                tris.nodes[iB].reshape(cap, 9),
                jnp.zeros((cap, STATIC_W - 17), F),
            ],
            axis=1,
        )
    else:  # sa
        own_b = jnp.where(live, anals.owner[iB], -1)
        mat_b = anals.mat[iB]
        rest = jnp.concatenate(
            [
                anals.objtype[iB].astype(F)[:, None],
                anals.relpos[iB],
                anals.direction[iB],
                anals.size[iB][:, 0:1],
                anals.normal_sign[iB][:, None],
                jnp.zeros((cap, STATIC_W - 17), F),
            ],
            axis=1,
        )
    cols[1] = own_b.astype(F)[:, None]
    cols[5] = mat_b.astype(F)[:, None]
    rec = jnp.concatenate(cols + [rest], axis=1)
    return table.replace(static_rec=jnp.where(live[:, None], rec, 0.0))


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
):
    """Evaluate one contact class. The contact table's denormalized
    static_rec supplies all per-contact constants (contiguous reads); only
    the two owner kinematic records are gathered per contact."""
    live = table.idA >= 0
    iA = jnp.where(live, table.idA, 0)
    iB = jnp.where(live, table.idB, 0)
    if owner_rec is None:
        owner_rec = pack_owner_records(owners)

    srec = table.static_rec
    own_a = jnp.where(live, srec[:, 0].astype(I), 0)
    own_b = jnp.where(live, srec[:, 1].astype(I), 0)
    A = _gather_owner(owners, own_a, owner_rec)
    A["owner_id"] = own_a
    B = _gather_owner(owners, own_b, owner_rec)
    B["owner_id"] = own_b
    rel_a = quat.rotate(A["quat"], srec[:, 2:5])
    rad_a = srec[:, 5]
    mat_a = srec[:, 6].astype(I)
    mat_b = srec[:, 7].astype(I)
    geo_wc_a = {k: v[iA] for k, v in spheres.wildcards.items()}
    d = rel_pos(B["vox"], B["loc"], A["vox"], A["loc"], voxel_size)

    if kind == "ss":
        pos_b = d + quat.rotate(B["quat"], srec[:, 8:11])
        rad_b = srec[:, 11]
        geo_wc_b = {k: v[iB] for k, v in spheres.wildcards.items()}
        overlap, b2a, cp = narrowphase.sphere_sphere(rel_a, rad_a, pos_b, rad_b)
        ctype = SPHERE_SPHERE_CONTACT
    elif kind == "st":
        nodes_l = srec[:, 8:17].reshape(-1, 3, 3)
        nodes = quat.rotate(B["quat"][:, None, :], nodes_l) + d[:, None, :]
        overlap, b2a, cp = narrowphase.sphere_triangle(
            rel_a, rad_a, nodes[:, 0], nodes[:, 1], nodes[:, 2]
        )
        rad_b = jnp.full(rad_a.shape, HUGE_FLOAT, F)
        geo_wc_b = {k: v[iB] for k, v in tris.wildcards.items()}
        ctype = SPHERE_MESH_CONTACT
    elif kind == "sa":
        obj_pos = d + quat.rotate(B["quat"], srec[:, 9:12])
        obj_dir = quat.rotate(B["quat"], srec[:, 12:15])
        overlap, b2a, cp = narrowphase.sphere_analytical(
            rel_a, rad_a, srec[:, 8].astype(I), obj_pos, obj_dir,
            jnp.concatenate(
                [srec[:, 15:16], jnp.zeros((srec.shape[0], 2), F)], axis=1
            ),
            srec[:, 16],
        )
        rad_b = jnp.full(rad_a.shape, HUGE_FLOAT, F)
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


def build_reduction_plan(owner_a_ids, owner_b_ids, n_owners: int,
                         depth: int):
    """Combined per-owner gather plan over BOTH contact sides:
    plan[(owner, d)] indexes into concat(rec_a, rec_b) — entries < cap are
    A-side slots, entries in [cap, 2cap) are B-side, == 2cap means none.

    Built once per CD refresh with ONE sort; per step the wrench reduction
    becomes D wide row-gathers + a dense sum — no scatter in the hot loop.
    This is the TPU answer to DEME's sort+reduce-by-key force collection
    (DEMCubForceCollection.cu:19, incl. its owner-index caching :45-64).
    Returns (plan i32[n_owners*depth], overflow bool).
    """
    cap = owner_a_ids.shape[0]
    own = jnp.concatenate(
        [
            jnp.where(owner_a_ids >= 0, owner_a_ids, n_owners),
            jnp.where(owner_b_ids >= 0, owner_b_ids, n_owners),
        ]
    )
    n2 = 2 * cap
    so, slot = jax.lax.sort((own, jnp.arange(n2, dtype=I)), num_keys=1)
    k = jnp.arange(n2, dtype=I)
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), so[1:] != so[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(boundary, k, 0))
    rank = k - run_start
    ok = (so < n_owners) & (rank < depth)
    dest = jnp.where(ok, so * depth + rank, n_owners * depth)
    plan = jnp.full((n_owners * depth,), n2, I).at[dest].set(
        slot, mode="drop", unique_indices=True
    )
    overflow = jnp.any((so < n_owners) & (rank >= depth))
    return plan, overflow


def reduce_wrench_gather(n_owners: int, passes, depth: int):
    """Gather-plan wrench reduction (see build_reduction_plan)."""
    acc = jnp.zeros((n_owners, 6), F)
    for p in passes:
        table = p["table"]
        padded = jnp.concatenate(
            [p["rec_a"], p["rec_b"], jnp.zeros((1, 6), F)], axis=0
        )
        idx = table.plan_a.reshape(n_owners, depth)
        acc = acc + padded[idx].sum(axis=1)
    return acc[:, :3], acc[:, 3:]
