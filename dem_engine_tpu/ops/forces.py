"""Per-contact force evaluation and owner-wrench reduction.

This is dT's hot path re-expressed functionally: ingredient gathering +
narrow phase + user force model (calculateContactForces,
DEMCalcForceKernels.cu:44) followed by the reduction of per-contact forces
into per-owner linear/angular accelerations (collectContactForcesThruCub,
DEMCubForceCollection.cu:19 / forceToAcc / forceToAngAcc).

TPU layout strategy (round-2 rework, driven by measured costs):
  * everything constant between CD refreshes is denormalized into the
    contact table ONCE per refresh by `finalize_table`: geometry constants,
    masses/MOIs/families, and premixed material properties (the reference
    instead re-reads material proxies per step, matProxy2ContactParam);
  * the per-step random-access working set shrinks to ONE 16-float
    kinematic record per owner (vox, loc, quat, vel, omg) gathered twice
    per contact;
  * the table is kept SORTED by A-side owner, so the A-side wrench
    reduction is a sorted segment-sum; the B side goes through a
    refresh-built permutation into own_b-sorted order, then segment-sum.
    No scatters in the hot loop (measured 10-18 ns/row vs 1.3 ns/row for
    gathers and ~4 ns/row for sorted segment sums).

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
from ..state import (
    FSTAT_W,
    STATIC_W,
    WCB_W,
    Analyticals,
    ContactTable,
    Owners,
    RuntimeParams,
    Spheres,
    Triangles,
)
from . import narrowphase, quat
from .voxel import rel_pos

_I32MAX = 2**31 - 1

# kinematic record: the ONLY per-step random-access owner data.
# [0:3] vox (i32 as f32, exact < 2^24)  [3:6] loc  [6:10] quat
# [10:13] vel  [13:16] omg
KREC_W = 16


def pack_kinematics(owners: Owners, world_omg: bool = False):
    """(N, 16) packed per-owner kinematic records.

    With `world_omg`, rows 13:16 carry the WORLD-frame angular velocity
    (rot(quat, omg)): the fused kernel then computes each contact-point
    velocity as ONE cross product instead of the
    rotate(cross(omg_body, rotate_inv(cp))) chain — 4 of the 7
    quaternion rotations per contact per pass collapse, at the cost of
    one per-OWNER rotation here (N ops, not cap ops). The XLA
    contact_pass keeps body-frame omg (ContactContext omgBar parity
    with DEME user force models)."""
    omg = owners.omg
    if world_omg:
        omg = quat.rotate(owners.quat, owners.omg)
    return jnp.concatenate(
        [
            owners.vox.astype(F),
            owners.loc,
            owners.quat,
            owners.vel,
            omg,
        ],
        axis=1,
    )


def gather_rows(tab, idx):
    """Bit-exact f32 row gather through an i16 reinterpret.

    Measured on TPU v5e (tools/profile_262c.py): a plain f32 row gather
    costs ~13-15 ns/row regardless of width, while the same gather with
    rows bitcast to i16 lanes runs ~2.5x faster. The bitcasts are free
    (pure layout) and the round trip is exact.
    """
    n, w = tab.shape
    kb = jax.lax.bitcast_convert_type(tab, jnp.int16).reshape(n, 2 * w)
    g = kb[idx]
    return jax.lax.bitcast_convert_type(
        g.reshape(idx.shape[0], w, 2), jnp.float32
    )


#: column-chunk width for the streamed field-major layout rebuild; engaged
#: when the contact capacity is past _CHUNKED_LAYOUT_CAP so the (cap, w)
#: contact-major gather intermediate never materializes whole (the fused
#: 1M-clump refresh transient that OOM'd the 16 GB chip, VERDICT r3 #2)
_LAYOUT_CHUNK = 1 << 20
_CHUNKED_LAYOUT_CAP = 6 << 20


def gather_rows_T(tab, idx, chunk=0):
    """gather_rows(tab, idx).T — field-major output, optionally streamed
    in column chunks of `chunk` rows (the last chunk slides back to stay
    full-width; overlapping columns recompute identical values)."""
    cap = idx.shape[0]
    if chunk <= 0 or cap <= chunk:
        return gather_rows(tab, idx).T
    n_chunks = -(-cap // chunk)
    w = tab.shape[1]

    def body(i, out):
        start = jnp.minimum(i * chunk, cap - chunk)
        sl = jax.lax.dynamic_slice_in_dim(idx, start, chunk)
        g = gather_rows(tab, sl)
        return jax.lax.dynamic_update_slice(out, g.T, (0, start))

    return jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((w, cap), F)
    )


def premix_names(model) -> Tuple[str, ...]:
    """Premixed-material key set stored in the contact table."""
    names = []
    for n in model.per_material_props:
        names += [n + ":a", n + ":b"]
    names += list(model.pairwise_props)
    return tuple(names)


# ---------------------------------------------------------------------------
# refresh-time table finalization
# ---------------------------------------------------------------------------
# statics layout (f32, ints exact < 2^24), width STATIC_W = 32:
#   [0] ownerA  [1] ownerB  [2:5] relposA  [5] radA  [6] matA  [7] matB
#   kind-specific [8:17]:
#     ss: [8:11] relposB [11] radB
#     st: [8:17] triangle nodes (body frame)
#     sa: [8] objtype [9:12] relpos [12:15] direction [15] size1 [16] sign
#   [17] massA [18] massB [19:22] moiA [22:25] moiB [25] famA [26] famB


def _uniq_layout(own_ids, other_ids, n_owners, ob, uniq_cap):
    """Per-block unique other-owner list + per-row local rank for one
    owner-sorted fused-pass layout whose rows are ordered by
    (own, other) — see ContactTable.uidx.

    own_ids:   i32[cap] reducing-side owner, dead rows >= n_owners (trail).
    other_ids: i32[cap] other-side owner (any value on dead rows).
    Returns (uidx f32[cap], uniq i32[n_blocks*uniq_cap] other-owner ids
    (dead slots = n_owners), umax i32[] largest per-block unique count)."""
    cap = own_ids.shape[0]
    n_blocks = -(-n_owners // ob)
    live = own_ids < n_owners
    blk0 = jnp.where(live, own_ids // ob, n_blocks)
    oth0 = jnp.where(live, other_ids, -1)
    # rows are sorted by (own, other), but the SAME other re-appears under
    # different owners of one block — group by (block, other) to rank
    # (the extra sorts run once per refresh, amortized over K steps)
    blk, oth, row = jax.lax.sort(
        (blk0, oth0, jnp.arange(cap, dtype=I)), num_keys=2
    )
    prev_blk = jnp.concatenate([jnp.full((1,), -2, I), blk[:-1]])
    prev_oth = jnp.concatenate([jnp.full((1,), -2, I), oth[:-1]])
    live_z = blk < n_blocks
    is_first = live_z & ((blk != prev_blk) | (oth != prev_oth))
    grank = jnp.cumsum(is_first.astype(I)) - 1
    base = jax.lax.cummax(
        jnp.where((blk != prev_blk) & live_z, grank, -(2**30))
    )
    u = jnp.where(live_z, grank - base, 0)
    umax = jnp.max(jnp.where(live_z, u, -1)) + 1
    uc = jnp.minimum(u, uniq_cap - 1)
    slot = jnp.where(is_first & (u < uniq_cap),
                     blk * uniq_cap + uc, 2**30)
    uniq = jnp.full((n_blocks * uniq_cap,), n_owners, I).at[slot].set(
        jnp.where(live_z, oth, n_owners), mode="drop", unique_indices=True
    )
    # rank back to table row order
    _, uc_row = jax.lax.sort((row, uc), num_keys=1)
    return uc_row.astype(F), uniq, umax.astype(I)


def finalize_table(kind, table: ContactTable, owners: Owners,
                   spheres: Spheres, tris: Triangles, anals: Analyticals,
                   params: RuntimeParams, model,
                   slim: bool = False, uniq_cap: int = 0) -> ContactTable:
    """Sort the table by A-side owner, rebuild the B-side permutation, and
    denormalize all refresh-constant data (the TPU answer to the
    reference's per-step component/material acquisition strategies,
    Models.h:66-171 + DEMCubForceCollection.cu:45-64 owner-index caching).

    For SS tables of models with a fused kernel variant, additionally
    builds the slim fused-pass layouts (fstat_a/fstat_b/wcb/own_a_b — see
    state.FSTAT_W); with `slim` the wide XLA `statics` record is skipped
    entirely (the fused pass owns this table and never reads it).
    """
    cap = table.cap
    n_owners = owners.n
    src_b = {"ss": spheres, "st": tris, "sa": anals}[kind]
    # fused layouts are built only when the fused pass will actually read
    # them (cfg.use_fused_force rides in as `slim`): on the XLA path they
    # are ~2 extra row-gathers + 144 B/contact of dead state per refresh
    fused = (kind == "ss" and model.fused_variant is not None and cap > 0
             and slim)
    slim = fused

    live0 = table.idA >= 0
    jA = jnp.where(live0, table.idA, 0)
    jB = jnp.where(live0, table.idB, 0)

    wc_names = sorted(table.wildcards)
    n_wc = len(wc_names)

    # ---- gather-packing (SS tables) ---------------------------------------
    # Separate width-1 f32/i32 gathers cost ~13-15 ns/row EACH at cap rows
    # on this TPU; packed i16-bitcast row gathers are ~5 ns/row at any
    # width <= 16 (CLAUDE.md primitive costs). The round-3 finalize spent
    # ~0.5 s/refresh at 262k in exactly such gathers (stage-G bisect), so
    # the SS path packs: (a) a per-SPHERE record gathered once per side,
    # (b) one permutation gather carrying every per-contact column through
    # the owner sort, (c) a premixed per-material-PAIR table.
    if kind == "ss":
        srec = jnp.concatenate(
            [
                spheres.owner.astype(F)[:, None],
                spheres.radius[:, None],
                spheres.relpos,
                spheres.mat.astype(F)[:, None],
                owners.mass[spheres.owner][:, None],
                jnp.zeros((spheres.n, 1), F),
            ],
            axis=1,
        )                                            # (S, 8)
        # pre-sort we need ONLY the owner ids (sort keys): narrow packed
        # gathers keep the transient small (the full records are fetched
        # AFTER the sort — gather-then-permute == gather-by-permuted-ids,
        # and skipping the pre-sort (cap, 8) copies saves ~1.5 GB of
        # transient at the 1M-clump table cap)
        so2 = srec[:, 0:2]
        own_a0 = jnp.where(live0, gather_rows(so2, jA)[:, 0].astype(I), -1)
        own_b0 = jnp.where(live0, gather_rows(so2, jB)[:, 0].astype(I), -1)
    else:
        own_a0 = jnp.where(live0, spheres.owner[jA], -1)
        own_b0 = jnp.where(live0, src_b.owner[jB], -1)

    key = jnp.where(live0, own_a0, _I32MAX)
    # secondary key own_b: within an owner's run, rows ordered by the
    # other side's owner — the unique-other fetch (uniq_cap) needs
    # same-other rows adjacent, and the order is otherwise free
    key2 = jnp.where(live0, own_b0, _I32MAX)
    if kind == "ss":
        # permutation sort + ONE packed row gather (integer columns ride
        # as f32 — exact below 2^24, which bounds sphere/owner counts)
        _, _, perm = jax.lax.sort(
            (key, key2, jnp.arange(cap, dtype=I)), num_keys=2
        )
        big = jnp.concatenate(
            [
                table.idA.astype(F)[:, None],
                table.idB.astype(F)[:, None],
                table.persist.astype(F)[:, None],
                own_a0.astype(F)[:, None],
                own_b0.astype(F)[:, None],
            ]
            + [table.wildcards[k][:, None] for k in wc_names],
            axis=1,
        )                                            # (cap, 5+n_wc)
        bsr = gather_rows(big, perm)
        idA = bsr[:, 0].astype(I)
        idB = bsr[:, 1].astype(I)
        persist = bsr[:, 2].astype(I)
        own_a = bsr[:, 3].astype(I)
        own_b = bsr[:, 4].astype(I)
        wildcards = {
            k: bsr[:, 5 + i] for i, k in enumerate(wc_names)
        }
        live = idA >= 0
        # full per-sphere records fetched in SORTED order (no pre-sort
        # copy): radius relpos3 mat mass
        ra = gather_rows(srec, jnp.where(live, idA, 0))[:, 1:7]
        rb = gather_rows(srec, jnp.where(live, idB, 0))[:, 1:7]
        mat_a = jnp.where(live, ra[:, 4].astype(I), 0)
        mat_b = jnp.where(live, rb[:, 4].astype(I), 0)
    else:
        ops = (key, key2, table.idA, table.idB, table.persist, own_a0,
               own_b0) + tuple(table.wildcards[k] for k in wc_names)
        sorted_ops = jax.lax.sort(ops, num_keys=2)
        idA = sorted_ops[2]
        idB = sorted_ops[3]
        persist = sorted_ops[4]
        own_a = sorted_ops[5]
        own_b = sorted_ops[6]
        wildcards = dict(zip(wc_names, sorted_ops[7:]))
        live = idA >= 0
        mat_a = None

    iA = jnp.where(live, idA, 0)
    iB = jnp.where(live, idB, 0)
    if mat_a is None:
        mat_a = spheres.mat[iA]
        mat_b = src_b.mat[iB]
    oa = jnp.where(live, own_a, 0)
    ob = jnp.where(live, own_b, 0)

    # ---- statics ----------------------------------------------------------
    statics = table.statics
    if not slim:
        statics = _build_statics(
            kind, cap, live, iA, iB, oa, ob, own_a, own_b, mat_a, mat_b,
            owners, spheres, tris, anals,
        )

    # ---- premixed material properties -------------------------------------
    # (skipped entirely on slim/fused tables: the kernel reads effective
    # moduli from fstat rows built from the pair table below)
    premix = {}
    if not slim:
        for name in model.per_material_props:
            t = params.mat_props[name]
            premix[name + ":a"] = t[mat_a]
            premix[name + ":b"] = t[mat_b]
        for name in model.pairwise_props:
            premix[name] = params.pair_props[name][mat_a, mat_b]

    # ---- B-side permutation ------------------------------------------------
    keyB = jnp.where(live, own_b, _I32MAX)
    keyB2 = jnp.where(live, own_a, _I32MAX)  # tie: other side (uniq fetch)
    keyB_s, _, perm_b = jax.lax.sort(
        (keyB, keyB2, jnp.arange(cap, dtype=I)), num_keys=2
    )
    own_b_sorted = jnp.where(keyB_s == _I32MAX, n_owners, keyB_s)

    # ---- fused-pass layouts ------------------------------------------------
    fstat_a, fstat_b = table.fstat_a, table.fstat_b
    wcb, own_a_b = table.wcb, table.own_a_b
    if fused:
        from ..defines import TINY_FLOAT
        from .pallas_force import _PI as _PI_CONST, _PI_SQ

        # premix per material PAIR on a tiny (M, M) grid, then fetch with
        # ONE packed row gather by pair id (replaces 7 width-1 gathers)
        Em = params.mat_props["E"]
        num = params.mat_props["nu"]
        M = Em.shape[0]
        Ea2, Eb2 = Em[:, None], Em[None, :]
        nua2, nub2 = num[:, None], num[None, :]
        inv_E2 = (1.0 - nua2 * nua2) / Ea2 + (1.0 - nub2 * nub2) / Eb2
        E_eff2 = 1.0 / jnp.maximum(inv_E2, TINY_FLOAT)
        inv_G2 = (2.0 * (2.0 - nua2) * (1.0 + nua2) / Ea2
                  + 2.0 * (2.0 - nub2) * (1.0 + nub2) / Eb2)
        G_eff2 = 1.0 / jnp.maximum(inv_G2, TINY_FLOAT)
        zero2 = jnp.zeros((M, M), F)
        # premix the Hertz damping ratio beta = ln e / sqrt(ln^2 e + pi^2)
        # on the pair grid: the kernel otherwise recomputes the log+sqrt
        # chain per contact per step per pass (hertz.py:52-56 parity)
        loge2 = jnp.log(jnp.maximum(
            params.pair_props.get("CoR", zero2), TINY_FLOAT))
        beta2 = loge2 / jnp.sqrt(loge2 * loge2 + _PI_SQ)
        ptab = jnp.stack(
            [
                E_eff2, G_eff2,
                beta2,
                params.pair_props.get("mu", zero2),
                params.pair_props.get("Crr", zero2),
                zero2, zero2, zero2,
            ],
            axis=-1,
        ).reshape(M * M, 8)
        pr = gather_rows(ptab, mat_a * M + mat_b)    # (cap, 8)

        # per-contact statics-derived constants, premixed ONCE here
        # instead of per step in both kernel passes (the rolling-
        # resistance prelude alone is ~6 transcendental slab ops):
        # m_eff, and the Schwartz collision time t_col folded with its
        # overdamped flag (t_col_eff = 0 => `past` always true, since
        # delta_time >= h > 0). Formula parity: hertz.py:80-108.
        ma_c, mb_c = ra[:, 5], rb[:, 5]
        m_eff_c = ma_c * mb_c / jnp.maximum(ma_c + mb_c, TINY_FLOAT)
        ra_r, rb_r = ra[:, 0], rb[:, 0]
        r_eff_c = ra_r * rb_r / jnp.maximum(ra_r + rb_r, TINY_FLOAT)
        E_eff_c, beta_c = pr[:, 0], pr[:, 2]
        R_eff_c = jnp.sqrt(r_eff_c)
        kn_s = (4.0 / 3.0) * E_eff_c * jnp.sqrt(R_eff_c)
        gn_s = (-2.0 * jnp.sqrt((5.0 / 3.0) * m_eff_c * E_eff_c) * beta_c
                * jnp.sqrt(jnp.sqrt(R_eff_c)))
        d_c = gn_s / (2.0 * jnp.maximum(jnp.sqrt(kn_s * m_eff_c),
                                        TINY_FLOAT))
        t_col = _PI_CONST * jnp.sqrt(
            m_eff_c / jnp.maximum(
                kn_s * jnp.maximum(1.0 - d_c * d_c, TINY_FLOAT),
                TINY_FLOAT))
        t_col_eff = jnp.where(d_c >= 1.0, 0.0, t_col)

        # contact-major (cap, FSTAT_W) first: the B copy is then one
        # bit-exact row gather through perm_b; all columns come from the
        # packed records — no further cap-row scalar gathers
        fs_cm = jnp.concatenate(
            [
                jnp.where(live, own_a.astype(F), -1.0)[:, None],
                ra[:, 0:1],       # radius_a
                ra[:, 1:4],       # relpos_a
                rb[:, 1:4],       # relpos_b
                rb[:, 0:1],       # radius_b
                m_eff_c[:, None],    # premixed effective mass
                t_col_eff[:, None],  # premixed RR collision time (0=past)
                pr[:, 0:5],       # E_eff G_eff beta mu Crr
            ],
            axis=1,
        )
        fs_cm = jnp.where(live[:, None], fs_cm, 0.0)
        fs_cm = fs_cm.at[:, 0].set(jnp.where(live, own_a.astype(F), -1.0))
        fstat_a = fs_cm.T
        lo_chunk = _LAYOUT_CHUNK if cap >= _CHUNKED_LAYOUT_CAP else 0
        # ONE B-permutation pass for fstat + wildcards (one (cap, 20)
        # T-gather instead of separate 16- and 4-wide ones)
        wc_cm = jnp.stack(
            [wildcards[k] for k in wc_names]
            + [jnp.zeros((cap,), F)] * (WCB_W - len(wc_names)),
            axis=1,
        )
        bothT = gather_rows_T(
            jnp.concatenate([fs_cm, wc_cm], axis=1), perm_b,
            chunk=lo_chunk)
        fs_bT = bothT[:FSTAT_W]
        wcb = bothT[FSTAT_W:]
        # the B layout reduces over own_b: its own_key is own_b_sorted
        # (dead -> -1, NOT n_owners: a dead key of n_owners could land
        # inside the last owner block's one-hot window)
        keyb = jnp.where(own_b_sorted < n_owners,
                         own_b_sorted.astype(F), -1.0)
        # own_a through the B permutation rides fs_bT's column 0 (it holds
        # where(live, own_a, -1) pre-overwrite) — saves a width-1 gather;
        # dead rows have own_b_sorted == n_owners, so the outer where
        # matches the old where(live, own_a, 0)[perm_b] exactly
        own_a_b = jnp.where(own_b_sorted < n_owners,
                            fs_bT[0].astype(I), 0)
        fstat_b = fs_bT.at[0].set(keyb)

    uidx, uidx_b = table.uidx, table.uidx_b
    uniq_a, uniq_b = table.uniq_a, table.uniq_b
    uniq_max = jnp.zeros((), I)
    if fused and uniq_cap > 0:
        from .pallas_force import OB as _OB

        uidx, uniq_a, umax_a = _uniq_layout(
            jnp.where(live, own_a, n_owners),
            jnp.where(live, own_b, 0), n_owners, _OB, uniq_cap)
        uidx_b, uniq_b, umax_b = _uniq_layout(
            own_b_sorted, own_a_b, n_owners, _OB, uniq_cap)
        uniq_max = jnp.maximum(umax_a, umax_b)

    return ContactTable(
        idA=idA,
        idB=idB,
        count=table.count,
        persist=persist,
        force=table.force,
        torque=table.torque,
        cpoint=table.cpoint,
        wildcards=wildcards,
        own_a=own_a,
        own_b=own_b,
        perm_b=perm_b,
        own_b_sorted=own_b_sorted,
        statics=statics,
        premix={} if slim else premix,
        fstat_a=fstat_a,
        fstat_b=fstat_b,
        wcb=wcb,
        own_a_b=own_a_b,
        uidx=uidx,
        uidx_b=uidx_b,
        uniq_a=uniq_a,
        uniq_b=uniq_b,
        uniq_max=uniq_max,
    )


def _build_statics(kind, cap, live, iA, iB, oa, ob, own_a, own_b,
                   mat_a, mat_b, owners, spheres, tris, anals):
    cols = [
        own_a.astype(F)[:, None],
        own_b.astype(F)[:, None],
        spheres.relpos[iA],
        spheres.radius[iA][:, None],
        mat_a.astype(F)[:, None],
        mat_b.astype(F)[:, None],
    ]
    if kind == "ss":
        rest = jnp.concatenate(
            [
                spheres.relpos[iB],
                spheres.radius[iB][:, None],
                jnp.zeros((cap, 17 - 12), F),
            ],
            axis=1,
        )
    elif kind == "st":
        rest = tris.nodes[iB].reshape(cap, 9)
    else:  # sa
        rest = jnp.concatenate(
            [
                anals.objtype[iB].astype(F)[:, None],
                anals.relpos[iB],
                anals.direction[iB],
                anals.size[iB][:, 0:1],
                anals.normal_sign[iB][:, None],
            ],
            axis=1,
        )
    tail = jnp.concatenate(
        [
            owners.mass[oa][:, None],
            owners.mass[ob][:, None],
            owners.moi[oa],
            owners.moi[ob],
            owners.family[oa].astype(F)[:, None],
            owners.family[ob].astype(F)[:, None],
            jnp.zeros((cap, STATIC_W - 27), F),
        ],
        axis=1,
    )
    statics = jnp.concatenate(cols + [rest, tail], axis=1)
    statics = jnp.where(live[:, None], statics, 0.0)
    # field-major (STATIC_W, cap) storage (rows = fields, contiguous row
    # slices); row 0 doubles as the live marker (own_a, -1 for dead rows —
    # the where above zeroed it, so rewrite it)
    statics = statics.T
    return statics.at[0].set(own_a.astype(F))


# ---------------------------------------------------------------------------
# per-step contact pass
# ---------------------------------------------------------------------------


def _unpack_kin(rec):
    return dict(
        vox=rec[:, 0:3].astype(I),
        loc=rec[:, 3:6],
        quat=rec[:, 6:10],
        vel=rec[:, 10:13],
        omg=rec[:, 13:16],
    )


def _make_ctx(table, overlap, b2a, cp_a, cp_b, A, B, a_geo, b_geo,
              a_rad, b_rad, mat_a, mat_b, a_geo_wc, b_geo_wc,
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
        a_mat=mat_a,
        b_mat=mat_b,
        time=time,
        ts=params.h,
        wildcards=table.wildcards,
        a_geo_wc=a_geo_wc,
        b_geo_wc=b_geo_wc,
        a_owner_wc=A["wc"],
        b_owner_wc=B["wc"],
        mat_props=params.mat_props,
        pair_props=params.pair_props,
        premix=table.premix,
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
    krec=None,
):
    """Evaluate one contact class. The table's denormalized statics supply
    all per-contact constants (contiguous reads); only the two 16-float
    owner kinematic records are gathered per contact."""
    live = table.idA >= 0
    iA = jnp.where(live, table.idA, 0)
    iB = jnp.where(live, table.idB, 0)
    if krec is None:
        krec = pack_kinematics(owners)

    s = table.statics  # field-major (STATIC_W, cap); vector fields -> .T
    own_a = jnp.where(live, table.own_a, 0)
    own_b = jnp.where(live, table.own_b, 0)
    A = _unpack_kin(gather_rows(krec, own_a))
    B = _unpack_kin(gather_rows(krec, own_b))
    A["owner_id"] = own_a
    B["owner_id"] = own_b
    A["mass"] = s[17]
    B["mass"] = s[18]
    A["moi"] = s[19:22].T
    B["moi"] = s[22:25].T
    A["family"] = s[25].astype(I)
    B["family"] = s[26].astype(I)
    A["wc"] = {k: v[own_a] for k, v in owners.wildcards.items()}
    B["wc"] = {k: v[own_b] for k, v in owners.wildcards.items()}

    rel_a = quat.rotate(A["quat"], s[2:5].T)
    rad_a = s[5]
    mat_a = s[6].astype(I)
    mat_b = s[7].astype(I)
    geo_wc_a = {k: v[iA] for k, v in spheres.wildcards.items()}
    d = rel_pos(B["vox"], B["loc"], A["vox"], A["loc"], voxel_size)

    if kind == "ss":
        pos_b = d + quat.rotate(B["quat"], s[8:11].T)
        rad_b = s[11]
        geo_wc_b = {k: v[iB] for k, v in spheres.wildcards.items()}
        overlap, b2a, cp = narrowphase.sphere_sphere(rel_a, rad_a, pos_b, rad_b)
        ctype = SPHERE_SPHERE_CONTACT
    elif kind == "st":
        nodes_l = s[8:17].T.reshape(-1, 3, 3)
        nodes = quat.rotate(B["quat"][:, None, :], nodes_l) + d[:, None, :]
        overlap, b2a, cp = narrowphase.sphere_triangle(
            rel_a, rad_a, nodes[:, 0], nodes[:, 1], nodes[:, 2]
        )
        rad_b = jnp.full(rad_a.shape, HUGE_FLOAT, F)
        geo_wc_b = {k: v[iB] for k, v in tris.wildcards.items()}
        ctype = SPHERE_MESH_CONTACT
    elif kind == "sa":
        obj_pos = d + quat.rotate(B["quat"], s[9:12].T)
        obj_dir = quat.rotate(B["quat"], s[12:15].T)
        overlap, b2a, cp = narrowphase.sphere_analytical(
            rel_a, rad_a, s[8].astype(I), obj_pos, obj_dir,
            jnp.concatenate(
                [s[15:16].T, jnp.zeros((s.shape[1], 2), F)], axis=1
            ),
            s[16],
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

    # per-contact, per-side wrench records [force(3), body-frame torque(3)]
    f_tot = force + torque_only
    lcp_a = quat.rotate_inv(A["quat"], cp_a)
    tq_a = jnp.cross(lcp_a, quat.rotate_inv(A["quat"], f_tot))
    lcp_b = quat.rotate_inv(B["quat"], cp_b)
    tq_b = jnp.cross(lcp_b, quat.rotate_inv(B["quat"], -f_tot))

    return dict(
        table=new_table,
        rec_a=jnp.concatenate([force, tq_a], axis=1),
        rec_b=jnp.concatenate([-force, tq_b], axis=1),
    )


# ---------------------------------------------------------------------------
# owner wrench reduction
# ---------------------------------------------------------------------------


def reduce_wrench(n_owners: int, passes) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter-add reduction (CPU / sharded fallback; on TPU scatters cost
    ~10x a gather, so prefer reduce_wrench_segment there)."""
    acc = jnp.zeros((n_owners, 6), F)
    for p in passes:
        t = p["table"]
        ia = jnp.where(t.own_a >= 0, t.own_a, n_owners)
        acc = acc.at[ia].add(p["rec_a"], mode="drop")
        ib = jnp.where(t.own_b >= 0, t.own_b, n_owners)
        acc = acc.at[ib].add(p["rec_b"], mode="drop")
    return acc[:, :3], acc[:, 3:]


def reduce_wrench_segment(n_owners: int, passes, use_pallas=False):
    """Sorted segment-sum reduction over the owner-sorted table (A side)
    and the refresh-built own_b permutation (B side). The TPU answer to
    DEME's sort + reduce-by-key force collection
    (DEMCubForceCollection.cu:19-170, incl. its owner-index caching).
    With use_pallas the sums run as one-hot MXU matmuls over owner blocks
    (pallas_segred.seg_sum_sorted_blocks — no owner-count limit, no
    sparse-table spill condition)."""
    if use_pallas:
        from .pallas_segred import seg_sum_sorted_blocks

    acc = jnp.zeros((n_owners, 6), F)
    for p in passes:
        t = p["table"]
        ids_a = jnp.where(t.own_a >= 0, t.own_a, n_owners)
        # plain f32 permute: the i16 reinterpret helps table gathers but
        # measured 3.5x SLOWER for full permutations (tools profiling)
        rec_b_s = p["rec_b"][t.perm_b]
        if use_pallas:
            acc_a = seg_sum_sorted_blocks(p["rec_a"], ids_a, n_owners)
            acc_b = seg_sum_sorted_blocks(
                rec_b_s, t.own_b_sorted, n_owners)
            acc = acc + acc_a + acc_b
        else:
            acc_a = jax.ops.segment_sum(
                p["rec_a"], ids_a, num_segments=n_owners + 1,
                indices_are_sorted=True,
            )
            acc_b = jax.ops.segment_sum(
                rec_b_s, t.own_b_sorted, num_segments=n_owners + 1,
                indices_are_sorted=True,
            )
            acc = acc + acc_a[:n_owners] + acc_b[:n_owners]
    return acc[:, :3], acc[:, 3:]
