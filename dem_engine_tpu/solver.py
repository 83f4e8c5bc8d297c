"""The solver engine: contact-table refresh + dynamics stepping.

Design translation (SURVEY.md §5.8, §7): DEME's two asynchronous worker
threads — kT producing contact tables on one GPU while dT integrates on
another, exchanging buffers under a bounded-staleness ("future drift")
protocol — collapse on TPU into ONE compiled program: `refresh_contacts`
(the kT role) runs every K steps, then `lax.scan` drives K dynamics steps
(the dT role) against the frozen contact table. Contact margins sized by
K·h·velocity make the stale table exact, precisely the reference's margin
argument (DEMMiscKernels.cu:37-61, ThreadManager.h:89-104) — except here the
"drift" is deterministic, so margins can be tighter.

Host ↔ device protocol: the host loop reads one overflow scalar per refresh;
on overflow it grows the affected capacity and re-runs the refresh from the
retained pre-refresh state (the functional analogue of DEME's device-vector
resize, kT.cpp:21-41), then dispatches the K-step scan with donated state.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .defines import F, HUGE_FLOAT, I, RESERVED_FAMILY, TimeIntegrator
from .models.prescriptions import PrescriptionTables
from .ops import binning, forces, history, integrator, narrowphase, quat, voxel
from .state import (
    OVF_AVG_CONTACTS,
    OVF_BIN_OCC,
    OVF_PALLAS_WIN,
    OVF_SA_CAP,
    OVF_SS_CAP,
    OVF_ST_CAP,
    OVF_SPATIAL_BUCKET,
    OVF_ST_OCC,
    OVF_TRI_BINS,
    OVF_UNIQ,
    OVF_VEL,
    OVF_XOCC,
    OVF_LCAP,
    ContactTable,
    RuntimeParams,
    SimState,
    SolverConfig,
)

_GROWTH = 1.6


def _cross_lcap(cfg, n_spheres: int) -> int:
    """Static capacity of the two-class compacted large head (0 = auto:
    a third of the spheres, 128-aligned; OVF_LCAP grows it). Never larger
    than the sphere count (compact_member slices lcap rows)."""
    cap = cfg.cross_lcap or max(256, -(-(n_spheres // 3 + 1) // 128) * 128)
    return min(cap, max(n_spheres, 1))


# ---------------------------------------------------------------------------
# geometry helpers
# ---------------------------------------------------------------------------


def sphere_world_pos(owners, spheres, voxel_size):
    """f32 absolute (LBF-relative) sphere centers — broad phase only."""
    own = spheres.owner
    base = voxel.decode_f32(owners.vox[own], owners.loc[own], voxel_size)
    return base + quat.rotate(owners.quat[own], spheres.relpos)


def sphere_margins(owners, spheres, params):
    """Per-sphere CD safety margin for K steps of drift
    (computeMarginFromAbsv, DEMMiscKernels.cu:37-61, with the gravity
    velocity-growth term folded in since our drift is deterministic)."""
    own = spheres.owner
    lin = jnp.linalg.norm(owners.vel[own], axis=-1)
    arm = jnp.linalg.norm(spheres.relpos, axis=-1) + spheres.radius
    rot = jnp.linalg.norm(owners.omg[own], axis=-1) * arm
    raw = lin + rot  # uncapped: feeds the error-out divergence check
    absv = jnp.minimum(raw, params.approx_max_vel)
    t_drift = params.h * params.max_drift.astype(F)
    g_mag = jnp.linalg.norm(params.gravity)
    margin = (
        (absv * params.expand_safety_multi + params.expand_safety_adder)
        * t_drift
        + 0.5 * g_mag * t_drift * t_drift
    )
    fam = owners.family[own]
    return margin + params.family_extra_margin[fam], absv, raw


def sphere_pos_margins(owners, spheres, params, voxel_size):
    """Fused sphere_world_pos + sphere_margins through ONE packed
    per-owner record gather (the separate implementations above do 7
    width-1/3/4 f32 row gathers at sphere rows — 13-15 ns/row EACH on
    this TPU; the packed i16-bitcast row fetch is ~5 ns/row total).
    Voxel indices ride as raw i32 bit patterns so escaped bodies beyond
    2^24 voxels stay exact. Returns (pos, margin, absv, raw_absv)."""
    from .ops.forces import gather_rows

    ex = params.family_extra_margin[owners.family]          # (N,) tiny
    orec = jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(owners.vox, F),
            owners.loc,
            owners.quat,
            jnp.linalg.norm(owners.vel, axis=-1, keepdims=True),
            jnp.linalg.norm(owners.omg, axis=-1, keepdims=True),
            ex[:, None],
            jnp.zeros((owners.n, 1), F),
        ],
        axis=1,
    )                                                        # (N, 14)
    rec = gather_rows(orec, spheres.owner)
    vox = jax.lax.bitcast_convert_type(rec[:, 0:3], I)
    base = voxel.decode_f32(vox, rec[:, 3:6], voxel_size)
    pos = base + quat.rotate(rec[:, 6:10], spheres.relpos)

    lin = rec[:, 10]
    arm = jnp.linalg.norm(spheres.relpos, axis=-1) + spheres.radius
    raw = lin + rec[:, 11] * arm
    absv = jnp.minimum(raw, params.approx_max_vel)
    t_drift = params.h * params.max_drift.astype(F)
    g_mag = jnp.linalg.norm(params.gravity)
    margin = (
        (absv * params.expand_safety_multi + params.expand_safety_adder)
        * t_drift
        + 0.5 * g_mag * t_drift * t_drift
    ) + rec[:, 12]
    return pos, margin, absv, raw


def owner_margin(owners, idx, arm, params):
    """Margin for a non-sphere owner (mesh/analytical), arm = lever length."""
    lin = jnp.linalg.norm(owners.vel[idx], axis=-1)
    rot = jnp.linalg.norm(owners.omg[idx], axis=-1) * arm
    absv = jnp.minimum(lin + rot, params.approx_max_vel)
    t_drift = params.h * params.max_drift.astype(F)
    m = (absv * params.expand_safety_multi + params.expand_safety_adder) * t_drift
    return m + params.family_extra_margin[owners.family[idx]]


def tri_world_nodes(owners, tris, voxel_size):
    own = tris.owner
    base = voxel.decode_f32(owners.vox[own], owners.loc[own], voxel_size)
    return base[:, None, :] + quat.rotate(
        owners.quat[own][:, None, :], tris.nodes
    )


# ---------------------------------------------------------------------------
# refresh (the kT role)
# ---------------------------------------------------------------------------


def _mark_persistent(table, famA_src, famB_src, params):
    """Mark contacts persistent by family-pair rule
    (MarkFamilyPersistentContact, reference API.h:870-905)."""
    live = table.idA >= 0
    fa = famA_src[jnp.where(live, table.idA, 0)]
    fb = famB_src[jnp.where(live, table.idB, 0)]
    mark = params.family_persist[fa, fb] & live
    return table.replace(
        persist=jnp.where(mark, 1, table.persist)
    )


def refresh_contacts(state: SimState, params: RuntimeParams,
                     cfg: SolverConfig, mesh=None) -> SimState:
    vs = cfg.voxel_size
    owners, spheres, tris, anals = (
        state.owners, state.spheres, state.tris, state.anals,
    )
    wc_names = cfg.force_model.contact_wildcards

    pos, margin, absv, raw_absv = sphere_pos_margins(
        owners, spheres, params, vs)
    reach = spheres.radius + margin
    max_reach = reach.max()
    # uncapped |v| for the divergence guard (the reference reduces the raw
    # velocity, kT.cpp:136); non-finite values poison the max so NaN/Inf
    # states trip the same check via the ~(x <= thresh) comparison below
    max_vel = jnp.where(
        jnp.all(jnp.isfinite(raw_absv)), raw_absv.max(), jnp.inf
    ).astype(F)

    bin_size, nb = binning.build_grid(params.domain, max_reach,
                                      params.bin_factor)
    sph_family = owners.family[spheres.owner]

    xocc_ovf = lcap_ovf = jnp.zeros((), bool)  # set by the two-class path
    spatial = (
        cfg.spatial_refresh and mesh is not None
        and spheres.n % mesh.devices.size == 0
        and cfg.cap_ss % mesh.devices.size == 0
    )
    if spatial:
        # the spatial path slabs along a fixed axis; keep world axes
        pos_cd, dom_cd, nb_cd = pos, params.domain, nb
    else:
        # CD axis relabeling: the Pallas sweep's per-tile run window spans
        # one full SLOWEST-axis bin layer (sz = nb[0]*nb[1] flat bins), so
        # its row span is ~N / nb[slowest]. With the default z-slowest
        # order a wide flat bed (the reference's terrain shape) packs its
        # whole footprint into one z layer and overflows any window. Put
        # the axis with the MOST bins slowest (traced argsort — margins
        # move the grid without recompiles); distances are axis-order
        # independent, so only idx3/nb consumers see the relabeling.
        if os.environ.get("DEM_CD_RELABEL", "1") == "0":  # debug hatch
            perm = jnp.arange(3, dtype=I)
        else:
            perm = jnp.argsort(nb)
        pos_cd = jnp.take(pos, perm, axis=1)
        dom_cd = params.domain[perm]
        nb_cd = nb[perm]
    if spatial:
        from .parallel.spatial import find_pairs_ss_spatial

        n_dev = mesh.devices.size
        capx = cfg.spatial_capx or max(
            128, 2 * spheres.n // (n_dev * n_dev) + 128)
        idA, idB, n_ss, max_occ, bucket_ovf = find_pairs_ss_spatial(
            pos, reach, spheres.owner, sph_family, params.family_mask,
            bin_size, nb, params.domain, cfg.cap_ss, cfg.max_per_bin,
            mesh, capx,
        )
        win_ovf = jnp.zeros((), bool)
        if cfg.use_persistency:
            # persistency re-injection needs globally front-compacted live
            # pairs; the spatial path compacts per shard
            deadk = (idA < 0).astype(I)
            _, idA, idB = jax.lax.sort((deadk, idA, idB), num_keys=1)
        # the ST sweep reuses the global sphere table; build it only when
        # meshes exist (the spatial path otherwise avoids the global sort)
        tab = (binning.build_sphere_table(
            pos, reach, spheres.owner, sph_family, bin_size, nb,
            max(spheres.n, 1)) if tris.n > 0 else None)
    elif cfg.cd_two_class:
        # two-grid polydisperse CD (round-4 rework, VERDICT r3 #3): the
        # large class is COMPACTED to a static head so coarse-grid work
        # scales with the large count (round 3 swept ALL spheres for the
        # L-L and S-L classes — the 10x poly refresh cost); L-L rides the
        # same Pallas/XLA sweep as the fine grid, and S-L cross pairs come
        # from multi-bin registration of large footprints + an own-bin
        # scan per small sphere (the reference's multi-bin sphere
        # membership, DEMBinSphereKernels.cu:60-153, applied to one class;
        # grid sizing role: decideBinSize, APIPrivate.cpp:489-566).
        small = spheres.radius <= params.cls_thr
        large = ~small
        reach_s = jnp.max(jnp.where(small, reach, 0.0))
        reach_l = jnp.max(jnp.where(large, reach, 0.0))
        # the coarse cell must cover BOTH the L-L pair distance
        # (2*reach_l) and the worst cross distance (reach_s + reach_l):
        # margins (velocity / family extra) can push a small sphere's
        # REACH above reach_l even though its radius is under cls_thr
        bs_l, nb_l = binning.build_grid(
            dom_cd, jnp.maximum(reach_l, 0.5 * (reach_s + reach_l)),
            params.bin_factor)
        lcap = _cross_lcap(cfg, spheres.n)
        ((pos_c, reach_c, own_c, fam_c), orig_l, live_l, _n_large,
         lcap_ovf) = binning.compact_member(
            large, lcap, pos_cd, reach, spheres.owner, sph_family)
        reach_c = jnp.where(live_l, reach_c, -1e30)
        own_c = jnp.where(live_l, own_c, -1)
        fam_c = jnp.where(live_l, fam_c, 0)
        if cfg.use_pallas_sweep:
            from .ops.pallas_sweep3 import find_pairs_ss_pallas3

            idA, idB, n_ll, occ_l, _, win_ovf_l = find_pairs_ss_pallas3(
                pos_c, reach_c, own_c, fam_c, params.family_mask,
                bs_l, nb_l, cfg.cap_ss, win=cfg.pallas_win,
                family_filter=cfg.ss_family_filter, member=live_l,
            )
        else:
            # member=live_l: dead compacted rows keep their real positions,
            # so without membership they would sort into real bins and hit
            # everything through their -1e30 reach (rr^2 is huge)
            idA, idB, n_ll, occ_l, _ = binning.find_pairs_ss(
                pos_c, reach_c, own_c, fam_c, params.family_mask,
                bs_l, nb_l, cfg.cap_ss, cfg.max_per_bin, cfg.cd_chunk,
                member=live_l,
            )
            win_ovf_l = jnp.zeros((), bool)
        # remap compact indices -> original sphere ids (the compaction is
        # stable, so canonical lo/hi ordering survives the remap)
        idA = jnp.where(idA >= 0, orig_l[jnp.maximum(idA, 0)], -1)
        idB = jnp.where(idB >= 0, orig_l[jnp.maximum(idB, 0)], -1)
        # S-L: register each large's (reach_l + max reach_s) footprint in
        # the coarse bins it can touch; smalls then scan their own bin only
        rec_l = jnp.concatenate(
            [pos_c, reach_c[:, None], own_c.astype(F)[:, None],
             fam_c.astype(F)[:, None],
             jnp.minimum(orig_l, spheres.n).astype(F)[:, None]], axis=1)
        eb, el, occ_x = binning.build_cross_entries(
            pos_c, jnp.maximum(reach_c + reach_s, 0.0), live_l, bs_l, nb_l)
        idA, idB, n_xl = binning.find_pairs_cross_fine(
            pos_cd, reach, spheres.owner, sph_family, small, rec_l, eb, el,
            params.family_mask, bs_l, nb_l, cfg.cap_ss, cfg.cross_mpb,
            base=jnp.minimum(n_ll, cfg.cap_ss), outs=(idA, idB),
            chunk=cfg.cd_chunk,
        )
        xocc_ovf = occ_x > cfg.cross_mpb
        bs_s, nb_s = binning.build_grid(dom_cd, reach_s,
                                        params.bin_factor)
        if cfg.use_pallas_sweep:
            idA_s, idB_s, n_sss, occ_s, tab, win_ovf = (
                find_pairs_ss_pallas3(
                    pos_cd, reach, spheres.owner, sph_family,
                    params.family_mask, bs_s, nb_s, cfg.cap_ss,
                    win=cfg.pallas_win,
                    family_filter=cfg.ss_family_filter, member=small,
                ))
            win_ovf = win_ovf | win_ovf_l
            # append the (L-L + S-L) list after the S-S list
            shift = jnp.minimum(n_sss, cfg.cap_ss)
            k = jnp.arange(cfg.cap_ss, dtype=I)
            dest = jnp.where(idA >= 0, k + shift, cfg.cap_ss)
            dest = jnp.where(dest < cfg.cap_ss, dest, cfg.cap_ss)
            idA = idA_s.at[dest].set(idA, mode="drop",
                                     unique_indices=True)
            idB = idB_s.at[dest].set(idB, mode="drop",
                                     unique_indices=True)
            n_ss = n_sss + n_xl
            bin_ovf = (occ_s >= (1 << 20)) | (occ_l >= (1 << 20))
        else:
            idA, idB, n_ss, occ_s, tab = binning.find_pairs_ss(
                pos_cd, reach, spheres.owner, sph_family, params.family_mask,
                bs_s, nb_s, cfg.cap_ss, cfg.max_per_bin, cfg.cd_chunk,
                member=small, base=jnp.minimum(n_xl, cfg.cap_ss),
                outs=(idA, idB),
            )
            win_ovf = jnp.zeros((), bool)
            bin_ovf = (occ_s > cfg.max_per_bin) | (occ_l > cfg.max_per_bin)
        max_occ = jnp.maximum(occ_s, occ_l)
        bucket_ovf = jnp.zeros((), bool)
        if tris.n > 0:  # the ST sweep needs a global single-grid table
            tab = binning.build_sphere_table(
                pos_cd, reach, spheres.owner, sph_family, bin_size, nb_cd,
                max(spheres.n, 1))
    elif cfg.use_pallas_sweep:
        from .ops.pallas_sweep3 import find_pairs_ss_pallas3

        idA, idB, n_ss, max_occ, tab, win_ovf = find_pairs_ss_pallas3(
            pos_cd, reach, spheres.owner, sph_family, params.family_mask,
            bin_size, nb_cd, cfg.cap_ss, win=cfg.pallas_win,
            family_filter=cfg.ss_family_filter,
        )
        bucket_ovf = jnp.zeros((), bool)
    else:
        idA, idB, n_ss, max_occ, tab = binning.find_pairs_ss(
            pos_cd, reach, spheres.owner, sph_family, params.family_mask,
            bin_size, nb_cd, cfg.cap_ss, cfg.max_per_bin, cfg.cd_chunk,
        )
        win_ovf = jnp.zeros((), bool)
        bucket_ovf = jnp.zeros((), bool)
    ss, lost_ss = history.carry_history(
        state.ss, idA, idB, jnp.minimum(n_ss, cfg.cap_ss), wc_names,
        cfg.use_persistency,
    )
    if cfg.use_persistency:
        ss = _mark_persistent(ss, sph_family, sph_family, params)
    overflow = jnp.where(n_ss > cfg.cap_ss, OVF_SS_CAP, 0).astype(I)
    ss = forces.finalize_table("ss", ss, owners, spheres, tris, anals,
                               params, cfg.force_model,
                               slim=cfg.use_fused_force,
                               uniq_cap=cfg.uniq_cap)
    overflow |= jnp.where(ss.count > cfg.cap_ss, OVF_SS_CAP, 0)
    if cfg.uniq_cap:
        overflow |= jnp.where(ss.uniq_max > cfg.uniq_cap, OVF_UNIQ, 0)
    ss = ss.replace(count=jnp.minimum(ss.count, cfg.cap_ss))
    if cfg.cd_two_class:
        overflow |= jnp.where(bin_ovf, OVF_BIN_OCC, 0)
    elif cfg.use_pallas_sweep and not spatial:
        # v3 flags over-wide bin runs itself (via the max_occ sentinel);
        # per-bin occupancy otherwise only limits the ST sweep (below)
        overflow |= jnp.where(max_occ >= (1 << 20), OVF_BIN_OCC, 0)
    else:
        overflow |= jnp.where(max_occ > cfg.max_per_bin, OVF_BIN_OCC, 0)
    overflow |= jnp.where(win_ovf, OVF_PALLAS_WIN, 0)
    overflow |= jnp.where(bucket_ovf, OVF_SPATIAL_BUCKET, 0)
    overflow |= jnp.where(xocc_ovf, OVF_XOCC, 0)
    overflow |= jnp.where(lcap_ovf, OVF_LCAP, 0)

    # --- sphere-triangle ---------------------------------------------------
    if tris.n > 0:
        nodes = tri_world_nodes(owners, tris, vs)
        arm = jnp.max(jnp.linalg.norm(tris.nodes, axis=-1), axis=-1)
        m_t = owner_margin(owners, tris.owner, arm, params)
        # the binned ST sweep reads the same relabeled-axis sphere table as
        # the SS path, so its AABBs/nodes live in the same frame (axis
        # permutations preserve distances; the brute-force branch below
        # does no binning and keeps world axes)
        nodes_cd = (nodes if spatial else
                    jnp.take(nodes, perm, axis=2))
        amin = nodes_cd.min(axis=1) - m_t[:, None]
        amax = nodes_cd.max(axis=1) + m_t[:, None]
        # bins enumerated over the AABB grown by the largest sphere reach so
        # any sphere whose own bin could hold a contact is visited
        bin_lo = amin - max_reach
        bin_hi = amax + max_reach
        tri_fam = owners.family[tris.owner]
        if cfg.st_bruteforce:
            # facets too large for bin enumeration (e.g. domain-spanning
            # walls): exact S x T distance matrix, compacted like the
            # sphere-analytical path. O(S*T) — the engine only switches
            # here after the span-growth ladder is exhausted.
            ovl_t, _, _ = narrowphase.sphere_triangle(
                pos[:, None, :], spheres.radius[:, None],
                nodes[None, :, 0], nodes[None, :, 1], nodes[None, :, 2],
            )
            ovl_tm = ovl_t + margin[:, None] + m_t[None, :]
            tA, tB, n_st = binning.find_pairs_sa(
                ovl_tm, spheres.owner, sph_family, tris.owner, tri_fam,
                params.family_mask, cfg.cap_st,
            )
            span_ovf = jnp.zeros((), bool)
        else:
            # the ST sweep scans max_per_bin slots per bin; in Pallas-sweep
            # or two-class mode the SS path no longer bounds the GLOBAL
            # table's occupancy, so flag any bin denser than that scan
            # (OVF_ST_OCC grows max_per_bin)
            mpb_st = cfg.max_per_bin
            st_occ = tab.max_occ if cfg.cd_two_class else max_occ
            overflow |= jnp.where(
                (st_occ > mpb_st) & (st_occ < (1 << 20)), OVF_ST_OCC, 0
            ) if (cfg.use_pallas_sweep or cfg.cd_two_class) else 0
            tA, tB, n_st, span_ovf = binning.find_pairs_st(
                amin, amax, tris.owner, tri_fam, tab, params.family_mask,
                bin_size, nb_cd, cfg.cap_st, cfg.max_tri_span, mpb_st,
                bin_lo, bin_hi, nodes=nodes_cd, tri_margin=m_t,
            )
        st, lost_st = history.carry_history(
            state.st, tA, tB, jnp.minimum(n_st, cfg.cap_st), wc_names,
            cfg.use_persistency,
        )
        if cfg.use_persistency:
            st = _mark_persistent(st, sph_family, tri_fam, params)
        st = forces.finalize_table("st", st, owners, spheres, tris, anals,
                                   params, cfg.force_model)
        overflow |= jnp.where(n_st > cfg.cap_st, OVF_ST_CAP, 0)
        overflow |= jnp.where(st.count > cfg.cap_st, OVF_ST_CAP, 0)
        st = st.replace(count=jnp.minimum(st.count, cfg.cap_st))
        overflow |= jnp.where(span_ovf, OVF_TRI_BINS, 0)
    else:
        st = state.st
        lost_st = jnp.zeros((), I)

    # --- sphere-analytical ---------------------------------------------------
    if anals.n > 0:
        own_b = anals.owner
        base_b = voxel.decode_f32(owners.vox[own_b], owners.loc[own_b], vs)
        obj_pos = base_b + quat.rotate(owners.quat[own_b], anals.relpos)
        obj_dir = quat.rotate(owners.quat[own_b], anals.direction)
        m_a = owner_margin(
            owners, anals.owner, jnp.zeros_like(anals.normal_sign), params
        )
        ovl, _, _ = narrowphase.sphere_analytical(
            pos[:, None, :], spheres.radius[:, None],
            anals.objtype[None, :], obj_pos[None, :, :], obj_dir[None, :, :],
            anals.size[None, :, :], anals.normal_sign[None, :],
        )
        ovl_m = ovl + margin[:, None] + m_a[None, :]
        aA, aB, n_sa = binning.find_pairs_sa(
            ovl_m, spheres.owner, sph_family, anals.owner,
            owners.family[anals.owner], params.family_mask, cfg.cap_sa,
        )
        sa, lost_sa = history.carry_history(
            state.sa, aA, aB, jnp.minimum(n_sa, cfg.cap_sa), wc_names,
            cfg.use_persistency,
        )
        if cfg.use_persistency:
            sa = _mark_persistent(
                sa, sph_family, owners.family[anals.owner], params
            )
        sa = forces.finalize_table("sa", sa, owners, spheres, tris, anals,
                                   params, cfg.force_model)
        overflow |= jnp.where(n_sa > cfg.cap_sa, OVF_SA_CAP, 0)
        overflow |= jnp.where(sa.count > cfg.cap_sa, OVF_SA_CAP, 0)
        sa = sa.replace(count=jnp.minimum(sa.count, cfg.cap_sa))
    else:
        sa = state.sa
        lost_sa = jnp.zeros((), I)

    overflow |= jnp.where(~(max_vel <= params.error_out_vel), OVF_VEL, 0)
    # sanity check mirroring the reference's avg-contacts-per-sphere
    # error-out (DEMCubContactDetection.cu:882-892)
    avg_cnt = 2.0 * ss.count.astype(F) / jnp.maximum(spheres.n, 1)
    overflow |= jnp.where(
        avg_cnt > params.error_out_avg_contacts, OVF_AVG_CONTACTS, 0
    )
    return state.replace(
        ss=ss, st=st, sa=sa, overflow=overflow, max_vel=max_vel,
        lost_contacts=state.lost_contacts + lost_ss + lost_st + lost_sa,
    )


# ---------------------------------------------------------------------------
# dynamics step (the dT role)
# ---------------------------------------------------------------------------


def dynamics_step(state: SimState, params: RuntimeParams,
                  cfg: SolverConfig) -> SimState:
    owners = state.owners
    model = cfg.force_model
    fused_ss = (
        cfg.use_fused_force
        and model.fused_variant is not None
        and state.spheres.n > 0
        and state.ss.cap > 0
    )
    krec = None    # body-frame omg: the XLA contact_pass records
    krec_w = None  # world-frame omg: the fused kernel's records
    passes = []
    new_tables = {}
    fused_acc = None
    for kind, table, n_geo in (
        ("ss", state.ss, state.spheres.n),
        ("st", state.st, state.tris.n),
        ("sa", state.sa, state.anals.n),
    ):
        if n_geo == 0 or table.cap == 0 or state.spheres.n == 0:
            new_tables[kind] = table
            continue
        if kind == "ss" and fused_ss:
            from .ops.pallas_force import fused_step_ss

            if krec_w is None:  # packed once per step (N ops, not cap)
                krec_w = forces.pack_kinematics(owners, world_omg=True)
            f_a, t_a, new_tables["ss"] = fused_step_ss(
                table, owners, params, cfg.voxel_size, model, krec_w,
            )
            fused_acc = (f_a, t_a)
            continue
        if krec is None:  # pack the shared kinematic records once per step
            krec = forces.pack_kinematics(owners)
        p = forces.contact_pass(
            kind, table, owners, state.spheres, state.tris, state.anals,
            params, state.time, cfg.voxel_size, model,
            krec=krec,
        )
        passes.append(p)
        new_tables[kind] = p["table"]

    ovf = state.overflow
    if cfg.reduce_mode == "segment":
        f_acc, t_acc = forces.reduce_wrench_segment(
            owners.n, passes, use_pallas=cfg.use_pallas_reduce)
    else:
        f_acc, t_acc = forces.reduce_wrench(owners.n, passes)
    if fused_acc is not None:
        f_acc = f_acc + fused_acc[0]
        t_acc = t_acc + fused_acc[1]

    tables_p = PrescriptionTables(cfg.prescriptions, state.time)
    owners = integrator.integrate_owners(
        owners, f_acc, t_acc, params, tables_p, cfg.voxel_size,
        cfg.integrator, state.time,
    )
    owners = integrator.apply_family_changes(
        owners, cfg.family_changes, cfg.voxel_size, state.time
    )
    return state.replace(
        owners=owners,
        ss=new_tables["ss"],
        st=new_tables["st"],
        sa=new_tables["sa"],
        time=state.time + params.h,
        step=state.step + 1,
        overflow=ovf,
    )


def run_steps(state: SimState, params: RuntimeParams, cfg: SolverConfig,
              n_steps: int) -> SimState:
    def body(s, _):
        return dynamics_step(s, params, cfg), None

    state, _ = jax.lax.scan(body, state, length=n_steps)
    return state


def run_chunks(state: SimState, params: RuntimeParams, cfg: SolverConfig,
               n_chunks: int, k: int, mesh=None) -> SimState:
    """The fused hot loop: n_chunks × (CD refresh + k dynamics steps) in ONE
    compiled program. This is the full collapse of DEME's kT/dT pipeline:
    zero host round-trips inside; overflow flags accumulate across chunks
    and are checked once on the host afterwards (rewind-and-grow on
    overflow)."""

    def chunk(s, _):
        s = refresh_contacts(s, params, cfg, mesh=mesh)
        ovf = s.overflow
        s = run_steps(s, params, cfg, k)
        # keep any step-time flags ORed in rather than resetting to the
        # post-refresh value (ADVICE r2 #1)
        return s.replace(overflow=ovf | s.overflow), None

    def chunk_acc(s, _):
        prev = s.overflow
        s, _ = chunk(s, None)
        return s.replace(overflow=prev | s.overflow), None

    state = state.replace(overflow=jnp.zeros((), I))
    state, _ = jax.lax.scan(chunk_acc, state, length=n_chunks)
    return state


# ---------------------------------------------------------------------------
# host-side engine
# ---------------------------------------------------------------------------

_CAP_OVF = (OVF_SS_CAP | OVF_ST_CAP | OVF_SA_CAP | OVF_BIN_OCC
            | OVF_TRI_BINS | OVF_ST_OCC | OVF_PALLAS_WIN
            | OVF_SPATIAL_BUCKET | OVF_UNIQ | OVF_XOCC | OVF_LCAP)


def _is_relay_transient(exc: Exception) -> bool:
    """Transient tunneled-backend failures (the relay occasionally drops
    a remote compile mid-flight: 'response body closed before all bytes
    were read'). These are retryable — nothing was consumed — unlike a
    device OOM, which must keep flowing to the degrade ladder."""
    s = f"{type(exc).__name__}: {exc}"
    if "RESOURCE_EXHAUSTED" in s or "ResourceExhausted" in s:
        return False
    return ("remote_compile" in s or "response body closed" in s
            or "read body" in s)


def _is_device_oom(exc: Exception) -> bool:
    s = repr(exc)
    return "RESOURCE_EXHAUSTED" in s or "ResourceExhausted" in s


#: fitted bytes per cap row for the uniq layout-build refresh transient
#: (see estimate_hbm_peak): 2 layouts x (3-operand i32 sort in+out, rank
#: cumsums, rank un-sort). Calibrated with _HBM_GATE against the two
#: round-4 16-GB-chip points (262k/cap-3.1M with uniq FITS, 1M/cap-9.4M
#: with uniq OOMs while completing without it).
_UNIQ_REFRESH_BYTES = 72

#: pre-dispatch gate: a projected peak above _HBM_GATE x device HBM walks
#: the lossless degrade ladder (uniq off -> fused off) BEFORE dispatching
#: and raises a polite RuntimeError if nothing is left to drop — the
#: reference's in-kernel abort role (DEMContactKernels_SphereSphere.cu:
#: 121-126); an execution-time OOM on this backend can crash the TPU
#: worker instead of raising, wedging the relay ~10 min (round 4).
#: Calibration (model GiB @ 16e9-byte HBM, after the round-5 slim-table
#: diet dropped force/torque/cpoint from fused tables): 262k+uniq 4.8
#: pass; 1M+uniq 14.6 must FAIL (refresh OOM'd the chip on 2026-08-20
#: AND the subsequent fused-off relayout OOM'd at the edge — the XLA
#: rung now allocates the query fields fresh); 1M-no-uniq ~13.95 must
#: PASS (completes on the chip) => gate in (0.936, 0.980); 0.96 splits
#: it with margin on the crash side.
_HBM_GATE = 0.96


def estimate_hbm_peak(state: SimState, cfg: SolverConfig) -> Dict[str, float]:
    """Rough HBM peak model for the compiled programs (bytes).

    Replaces round 2's crash-derived magic constants (fuse>1 at ~3M-contact
    capacity and the 12M-contact fused refresh+scan both took the worker
    down) with an explicit budget: persistent state (double-buffered
    through the scan carry) plus the larger of the refresh-transient and
    step-transient working sets. Calibrated against those two observed
    crash points; surfaced by api.ShowMemStats.
    """
    state_b = 0
    for leaf in jax.tree_util.tree_leaves(state):
        state_b += leaf.size * leaf.dtype.itemsize
    cap = cfg.cap_ss
    spad = max(state.spheres.n, 1)
    W = len(cfg.force_model.contact_wildcards)
    # fused-layout rebuild transient: fs_cm + fstat_a (64 B each); the
    # fstat_b/wcb gathers are column-streamed past _CHUNKED_LAYOUT_CAP
    # (ops/forces.gather_rows_T), so only their outputs stay live there
    from .ops.forces import _CHUNKED_LAYOUT_CAP

    layout_b = (2 * 64 + 64 + 16) if cap >= _CHUNKED_LAYOUT_CAP else (
        2 * 64 + 2 * 64 + 2 * 16)
    # refresh: pallas-sweep output (spad,128 i32) + sorted record tables +
    # decode gathers + history sort-merge (2cap x (4+W) ops, two buffers)
    # + finalize sort ((6+W) ops) + statics + fused-layout rebuild
    refresh_b = spad * 768 + cap * (100 + (4 + W) * 16 + (6 + W) * 8 + 160
                                    + layout_b)
    uniq_b = 0.0
    if cfg.uniq_cap and cfg.use_fused_force:
        # unique-other layout build (_uniq_layout x 2 layouts): a
        # 3-operand i32 sort of cap rows (in+out buffers), rank cumsums,
        # the rank un-sort, and the per-block scatter. Fitted to the two
        # measured 16-GB-chip points (round 4): 262k/cap-3.1M WITH uniq
        # fits; 1M/cap-9.4M OOMs WITH uniq yet completes without it —
        # so this term must carry that shape across the gate boundary.
        uniq_b = cap * _UNIQ_REFRESH_BYTES
        refresh_b += uniq_b
    # XLA fallback sweep candidate slab (engaged when the Pallas sweep is
    # disabled): chunk x 14 half-shell offsets x per-bin slots x
    # (7 f32 candidate record). grow_for bounds cd_chunk when it grows
    # max_per_bin, but a config that reaches here UN-chunked must be
    # priced honestly — a 1.5M-sphere un-chunked slab is tens of GB and
    # took the round-4 worker down instead of raising.
    sweep_b = 0.0
    if not cfg.use_pallas_sweep:
        chunk_rows = cfg.cd_chunk if cfg.cd_chunk > 0 else spad
        sweep_b = float(min(chunk_rows, spad)) * 14 * cfg.max_per_bin * 28
        refresh_b += sweep_b
    # step: two other-side kinematic gathers + transposes + wildcard
    # double-buffers of both layouts + one-hot acc blocks
    step_b = cap * (64 * 2 + 32 * 2 + 32 * 2)
    total = 2 * state_b + max(refresh_b, step_b)
    try:
        stats = jax.devices()[0].memory_stats() or {}
        hbm = float(stats.get("bytes_limit", 16e9))
    except Exception:
        hbm = 16e9
    return {
        "state": float(state_b),
        "refresh_transient": float(refresh_b),
        "step_transient": float(step_b),
        "uniq_transient": float(uniq_b),
        "sweep_transient": float(sweep_b),
        "peak": float(total),
        "hbm": hbm,
    }


def _peak_at_cap(mem, state: SimState, cfg: SolverConfig,
                 new_cap: int) -> float:
    """Re-price estimate_hbm_peak's result at a hypothetical SS capacity
    (bytes). Pure rescale of the cap-proportional terms of an
    already-computed breakdown — avoids building a trial state at the
    OOM edge. Used by the shrink-to-admit-uniq gate rung."""
    ratio = new_cap / max(cfg.cap_ss, 1)
    ss_b = sum(l.size * l.dtype.itemsize
               for l in jax.tree_util.tree_leaves(state.ss))
    state_b = mem["state"] - ss_b * (1.0 - ratio)
    spad = max(state.spheres.n, 1)
    base = (mem["refresh_transient"] - mem["uniq_transient"]
            - mem["sweep_transient"] - spad * 768)
    uniq_b = (new_cap * _UNIQ_REFRESH_BYTES
              if cfg.uniq_cap and cfg.use_fused_force else 0.0)
    refresh_b = base * ratio + spad * 768 + mem["sweep_transient"] + uniq_b
    step_b = mem["step_transient"] * ratio
    return 2.0 * state_b + max(refresh_b, step_b)


class Engine:
    """Owns the jit caches and the refresh/step/grow protocol.

    Pass a `jax.sharding.Mesh` to run multi-chip: contact tables and sphere
    arrays are sharded over the mesh, owner state replicated, and XLA
    inserts the ICI collectives (see parallel/mesh.py).
    """

    #: quantized CD-frequency ladder explored by the adaptive tuner (each
    #: value is a separate compiled program, so keep the set small)
    K_LADDER = (5, 8, 12, 18, 25, 36, 52, 75, 108, 156)

    #: bin-size factors explored by the adaptive bin tuner (traced — no
    #: recompiles; 1.0 is the one-bin-per-sphere floor)
    BIN_LADDER = (1.0, 1.3, 1.7, 2.2, 3.0)

    def __init__(self, cfg: SolverConfig, mesh=None, fuse: int = 8):
        self.cfg = cfg
        self.mesh = mesh
        self.fuse = fuse  # chunks per fused dispatch (amortizes latency)
        #: optional callable(level_name, msg) set by the API layer; routes
        #: engine degrade/adaptation events to the user's verbosity sink
        #: (the role of the reference's leveled STEP_ANOMALY/STEP_METRIC
        #: diagnostics, Structs.h:278-365)
        self.log = None
        # adaptive CD cadence (reference AccumStepUpdater, dT.h:721-753,
        # dT.cpp:2276-2299): measure wall seconds/step per K between fused
        # superchunks, walk the ladder toward the cheapest K
        self.auto_freq = False
        self.active_freq: int | None = None
        #: user bound on the adaptive cadence (SetCDMaxUpdateFreq)
        self.max_freq: int | None = None
        self._k_perf: Dict[int, float] = {}
        # adaptive bin-size factor (reference calibrateParams, kT.cpp:43-98
        # + AccumTimer kT.h:419-463): a traced multiplier above the
        # 2*max(reach) cell floor, injected into params each dispatch.
        # SetBinSize/SetInitBinSize seed it; with auto_bin the engine walks
        # BIN_LADDER toward the cheapest measured seconds/step, and
        # OVF_BIN_OCC walks it back toward 1.0 before giving up on the
        # Pallas sweep (an oversized user bin recovers without help).
        self.bin_factor = 1.0
        self.auto_bin = False
        self._bin_perf: Dict[float, float] = {}
        # Pallas-sweep re-enable probe: a dense transient (initial drop,
        # divergence recovery) can disable the sweep via OVF_BIN_OCC /
        # OVF_PALLAS_WIN; instead of staying on the XLA fallback forever
        # (VERDICT r2 #4) the engine re-tries the sweep after a backoff of
        # CD epochs, doubling the backoff each time it trips again
        self._sweep_disabled_occ = False
        self._cd_epochs = 0
        self._sweep_probe_at = 0
        self._sweep_backoff = 16
        # shrink-to-admit-uniq churn guard: if a capacity growth follows
        # an admit-shrink within 2 CD epochs (a rising contact count),
        # the rung is disabled for the rest of the run — each
        # grow/shrink cycle is a fresh multi-minute refresh compile
        self._uniq_admit_epoch = -(10**9)
        self._uniq_admit_off = False
        # a uniq drop by the pre-dispatch MODEL gate (not a real device
        # OOM) is reversible: the entry gate re-admits uniq at a trimmed
        # capacity once the live contact count is known (a warmup
        # transient must not cost the whole run its uniq-fetch)
        self._uniq_gate_dropped = False
        self._uniq_cap0 = cfg.uniq_cap
        self.timers = {
            "fused_s": 0.0, "fused_steps": 0,
            "refresh_s": 0.0, "refresh_n": 0,
            "steps_s": 0.0, "steps_n": 0,
            "compiles": 0,
            # engine-event counters (the role of the reference's named
            # stage timers, dT.h:294-297 — here the host-visible events)
            "grows": 0, "shrinks": 0, "oom_degrades": 0,
            "sweep_disables": 0, "rewinds": 0,
        }
        self._build()

    def _build(self):
        self._refresh_jit = None
        self._step_cache: Dict[tuple, callable] = {}
        self._chunks_cache: Dict[tuple, callable] = {}
        self._k_perf.clear()  # capacity changes shift per-step cost
        # first split-path steps call after a (re)build runs WITHOUT input
        # donation so an execution OOM keeps the state recoverable
        self._steps_validated = False

    def _chunks_fn(self, n_chunks: int, k: int, state, params):
        key = (n_chunks, k)
        fn = self._chunks_cache.get(key)
        if fn is None:
            base = partial(run_chunks, cfg=self.cfg, n_chunks=n_chunks, k=k,
                           mesh=self.mesh)
            if self.mesh is not None:
                ssh, psh = self._shardings(state, params)
                fn = jax.jit(base, in_shardings=(ssh, psh),
                             out_shardings=ssh)
            else:
                fn = jax.jit(base)
            self._chunks_cache[key] = fn
        return fn

    def _shardings(self, state, params):
        from .parallel.mesh import state_shardings

        ssh = state_shardings(state, self.mesh)
        repl = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec()
        )
        psh = jax.tree_util.tree_map(lambda _: repl, params)
        return ssh, psh

    def _get_refresh(self, state, params):
        if self._refresh_jit is None:
            fn = partial(refresh_contacts, cfg=self.cfg, mesh=self.mesh)
            if self.mesh is not None:
                ssh, psh = self._shardings(state, params)
                self._refresh_jit = jax.jit(
                    fn, in_shardings=(ssh, psh), out_shardings=ssh
                )
            else:
                self._refresh_jit = jax.jit(fn)
        return self._refresh_jit

    def _steps_fn(self, k: int, state, params, donate: bool = True):
        """Split-path K-step program. `donate=False` compiles a separate
        non-donating variant: used for the first call after any config
        change so an execution-time OOM leaves the input state alive for
        the degrade-and-retry ladder (VERDICT r3 #7 / ADVICE r3)."""
        key = (k, donate)
        fn = self._step_cache.get(key)
        if fn is None:
            base = partial(run_steps, cfg=self.cfg, n_steps=k)
            donate_kw = {"donate_argnums": (0,)} if donate else {}
            if self.mesh is not None:
                ssh, psh = self._shardings(state, params)
                fn = jax.jit(
                    base, in_shardings=(ssh, psh), out_shardings=ssh,
                    **donate_kw,
                )
            else:
                fn = jax.jit(base, **donate_kw)
            self._step_cache[key] = fn
        return fn

    def _emit(self, level, msg):
        if self.log is not None:
            self.log(level, msg)
        elif level in ("WARNING", "ERROR"):
            # no logger wired (bare Engine use, e.g. bench.py): losing
            # grow/degrade/fallback events makes failures undiagnosable
            # from logs (VERDICT r3 weak #8)
            import sys

            print(f"[dem_engine_tpu][{level}] {msg}", file=sys.stderr,
                  flush=True)

    def _note_sweep_disable(self):
        self.timers["sweep_disables"] += 1
        self._sweep_disabled_occ = True
        self._sweep_probe_at = self._cd_epochs + self._sweep_backoff
        self._sweep_backoff = min(self._sweep_backoff * 2, 4096)
        self._emit(
            "WARNING",
            "Pallas CD sweep disabled (bin occupancy too high for its "
            "run windows); falling back to the XLA slot sweep and "
            f"re-probing after {self._sweep_backoff // 2} CD epochs",
        )

    def _maybe_reenable_sweep(self):
        """Retry the Pallas sweep after a dense transient (exponential
        backoff in CD epochs). If the occupancy is still too high the next
        refresh trips OVF_BIN_OCC again, grow_for re-disables, and the
        backoff doubles — so probe compiles stay rare."""
        if (self._sweep_disabled_occ and not self.cfg.use_pallas_sweep
                and self._cd_epochs >= self._sweep_probe_at):
            self.cfg = dataclasses.replace(self.cfg, use_pallas_sweep=True)
            self._sweep_disabled_occ = False
            self._build()

    def grow_for(self, state: SimState, ovf: int) -> SimState:
        """Grow capacities named by overflow bits; returns resized state."""
        cfg = self.cfg
        changes = {}
        if ovf & OVF_SS_CAP:
            # keep the SS capacity 512-aligned: the fused force kernel and
            # the owner-block reduce stream 512-wide chunks (pad-free)
            changes["cap_ss"] = -(-(int(cfg.cap_ss * _GROWTH) + 64)
                                  // 512) * 512
            if self._cd_epochs - self._uniq_admit_epoch <= 2:
                # the admit-shrink rung trimmed this cap moments ago and
                # the count immediately outgrew it: a rising-count regime
                # would churn grow/shrink recompiles — stop admitting
                self._uniq_admit_off = True
                self._emit("STEP_METRIC",
                           "shrink-to-admit-uniq disabled: contact count "
                           "outgrew the trimmed capacity")
        if ovf & OVF_ST_CAP:
            changes["cap_st"] = int(cfg.cap_st * _GROWTH) + 64
        if ovf & OVF_SA_CAP:
            changes["cap_sa"] = int(cfg.cap_sa * _GROWTH) + 64
        if ovf & OVF_BIN_OCC:
            if self.bin_factor > 1.0:
                # an oversized bin (user SetBinSize / the adaptive tuner)
                # is the cheap cause: walk the traced factor back toward
                # the 2*reach floor before growing anything or abandoning
                # the Pallas sweep (reference: calibrateParams shrinks the
                # bin under the same signal, kT.cpp:43-98)
                self.bin_factor = max(1.0, self.bin_factor / 1.6)
                self._bin_perf.clear()
            elif cfg.use_pallas_sweep:
                # a half-shell bin run overflowed the kernel's 64-bit hit
                # mask: density the Pallas layout can't hold — fall back to
                # the XLA sweep with a generous occupancy cap
                changes["use_pallas_sweep"] = False
                changes["max_per_bin"] = max(cfg.max_per_bin, 64) + 16
                self._note_sweep_disable()
            else:
                changes["max_per_bin"] = int(cfg.max_per_bin * _GROWTH) + 8
        if ovf & OVF_ST_OCC:
            changes["max_per_bin"] = int(
                max(cfg.max_per_bin, changes.get("max_per_bin", 0))
                * _GROWTH
            ) + 8
        if "max_per_bin" in changes:
            mpb_new = changes["max_per_bin"]
            if mpb_new > 1024:
                raise RuntimeError(
                    "bin occupancy exploded (max_per_bin would exceed "
                    "1024): the simulation has likely diverged — huge "
                    "velocities inflate the CD margins until every sphere "
                    "lands in one bin. Check the time step / stiffness, "
                    "or SetMaxVelocity to cap margin growth."
                )
            # bound the XLA sweep's candidate-slab memory (chunk x 14 x mpb
            # x 7 f32): high polydisperse occupancy with the default 65536
            # chunk allocated tens of GB
            changes["cd_chunk"] = max(256, (1 << 22) // (14 * mpb_new))
        if ovf & OVF_SPATIAL_BUCKET:
            n_dev = self.mesh.devices.size if self.mesh is not None else 1
            auto = max(128,
                       2 * state.spheres.n // (n_dev * n_dev) + 128)
            base = cfg.spatial_capx or auto
            changes["spatial_capx"] = int(base * _GROWTH) + 128
        if ovf & OVF_PALLAS_WIN:
            if cfg.pallas_win >= 16384:
                # past a VMEM-safe slab size: give up on the Pallas sweep
                changes["use_pallas_sweep"] = False
                changes["max_per_bin"] = max(cfg.max_per_bin, 64)
                self._note_sweep_disable()
            else:
                changes["pallas_win"] = cfg.pallas_win * 2
        if ovf & OVF_TRI_BINS:
            if cfg.max_tri_span >= 32:
                # span growth exhausted (domain-spanning facets): exact
                # brute-force ST candidates instead of bin enumeration
                changes["st_bruteforce"] = True
            else:
                # the two-stage ST sweep's slot scan scales with span^2
                # (slab-filtered bins), not span^3, so the ladder can
                # afford span 32 before giving up on the grid
                changes["max_tri_span"] = min(cfg.max_tri_span * 2, 32)
        if ovf & OVF_XOCC:
            mx = int(cfg.cross_mpb * _GROWTH) + 8
            if mx > 2048:
                raise RuntimeError(
                    "cross-class entry-bin occupancy exploded (cross_mpb "
                    "would exceed 2048): the simulation has likely "
                    "diverged, or the class threshold puts nearly "
                    "everything in the large class. Check the time step "
                    "or SetCDTwoClassThreshold."
                )
            changes["cross_mpb"] = mx
        if ovf & OVF_LCAP:
            base = _cross_lcap(cfg, state.spheres.n)
            changes["cross_lcap"] = min(
                -(-int(base * _GROWTH + 128) // 128) * 128,
                max(state.spheres.n, 1),
            )
        if ovf & OVF_UNIQ:
            # per-block unique-other list overflowed: double its capacity;
            # past 2048 the (UB, ch) one-hot expansion build costs more
            # than the gather it replaces (and its bf16 operand nears the
            # VMEM budget) — revert to the direct per-contact gather
            changes["uniq_cap"] = (cfg.uniq_cap * 2
                                   if cfg.uniq_cap < 2048 else 0)
        self.timers["grows"] += 1
        uniq_before = cfg.uniq_cap
        if changes:  # a bare bin_factor walk-back is traced: no recompile
            lvl = ("WARNING" if any(
                k in changes for k in ("st_bruteforce", "use_pallas_sweep"))
                else "STEP_METRIC")
            self._emit(lvl, f"capacity/strategy growth after overflow "
                            f"0x{ovf:x}: {changes}")
            self.cfg = dataclasses.replace(cfg, **changes)
            self._build()  # may also drop uniq via the capacity gate
        ss = state.ss.grown(self.cfg.cap_ss)
        if self.cfg.uniq_cap != uniq_before:
            from .ops.pallas_force import OB as _OB

            rows = (-(-state.owners.n // _OB)) * self.cfg.uniq_cap
            ucap = ss.cap if rows else 0
            ss = ss.replace(
                uniq_a=jnp.full((rows,), state.owners.n, I),
                uniq_b=jnp.full((rows,), state.owners.n, I),
                uidx=jnp.zeros((ucap,), F),
                uidx_b=jnp.zeros((ucap,), F),
            )
        return self._replace_tables(
            state,
            ss=ss,
            st=state.st.grown(self.cfg.cap_st),
            sa=state.sa.grown(self.cfg.cap_sa),
        )

    def maybe_shrink(self, state: SimState) -> SimState:
        """Shrink oversized contact capacities (cheap jits beat wasted
        bandwidth: every per-slot cost scales with capacity, not count)."""
        cfg = self.cfg
        changes = {}
        for attr, cap in (
            ("ss", cfg.cap_ss), ("st", cfg.cap_st), ("sa", cfg.cap_sa),
        ):
            cnt = int(getattr(state, attr).count)
            # coarse quantum at scale: run-to-run count jitter must not
            # change the chosen cap (each distinct cap is a fresh XLA
            # program; the persistent compile cache only helps when two
            # runs land on the SAME shapes)
            quantum = 512 if attr == "ss" else 256
            quantum = max(quantum, 1 << max(0, cnt.bit_length() - 5))
            need = max(64, -(-int(cnt * 1.25 + 64) // quantum) * quantum)
            # threshold 1.4 (not lower): a growth lands at 1.6x the
            # overflowed cap (<= 1.6x count), which must NOT immediately
            # re-shrink or a rising count churns grow/shrink recompiles.
            # Every per-slot step cost (gathers, kernel passes) scales with
            # capacity, so the ~1.78x padding the old 1.5 threshold
            # tolerated was ~25% of the whole step budget (round 4).
            if cap > 1.4 * need:
                changes["cap_" + attr] = need
        if not changes:
            return state
        self.timers["shrinks"] += 1
        self.cfg = dataclasses.replace(cfg, **changes)
        self._build()
        return self._replace_tables(
            state,
            ss=state.ss.shrunk(self.cfg.cap_ss),
            st=state.st.shrunk(self.cfg.cap_st),
            sa=state.sa.shrunk(self.cfg.cap_sa),
        )

    def _enforce_hbm(self, state: SimState,
                     allow_shrink: bool = True) -> SimState:
        """Model-driven pre-dispatch overload guard (VERDICT r4 #4/#8):
        while the projected HBM peak exceeds _HBM_GATE x device HBM, walk
        the lossless degrade ladder (uniq-fetch off, then the fused force
        layouts off — _oom_degrade's rungs) and relayout the state; if
        nothing is left to drop, raise a polite RuntimeError instead of
        dispatching a program that would take the TPU worker down. This
        replaces the round-4 UNIQ_CAP_LIMIT constant: the uniq gate
        decision now comes from the priced uniq transient.

        Before dropping uniq-fetch (the first rung — and a real
        optimization: it replaces the two full-cap other-side kinematic
        gathers, measured 259 ms/step at the 1M-clump shape), try
        ADMITTING it by trimming capacity slack: every SS cap row costs
        ~1.2 kB across the doubled state + refresh transient, so a
        1.3x-slack table prices uniq out of HBM where a 1.18x one fits.
        `allow_shrink=False` disables that rung — used right after a
        capacity growth, where the live contact count is unknown (the
        old count just overflowed) and shrinking would loop."""
        for _ in range(4):
            mem = estimate_hbm_peak(state, self.cfg)
            cnt = int(state.ss.count)
            if (allow_shrink and cnt > 0 and not self.cfg.uniq_cap
                    and self._uniq_gate_dropped and not self._uniq_admit_off
                    and self.cfg.use_fused_force and self._uniq_cap0):
                # the MODEL gate dropped uniq earlier (e.g. at init or
                # during a warmup growth, when the live count was
                # unknown); re-admit it at a trimmed capacity now that
                # the count is real — a transient must not cost the
                # whole run the uniq-fetch step savings
                need = max(512, -(-int(cnt * 1.18 + 64) // 512) * 512)
                # re-admission never grows the table (a grown trial would
                # defeat the point); an already-tight cap re-admits as-is
                need = min(need, self.cfg.cap_ss)
                trial = dataclasses.replace(self.cfg,
                                            uniq_cap=self._uniq_cap0)
                # +2x8B/cap: the persistent uidx/uidx_b rows the trial
                # state would carry (absent from the uniq-less `state`)
                peak2 = (_peak_at_cap(mem, state, trial, need)
                         + 2 * 8.0 * need)
                if peak2 <= _HBM_GATE * mem["hbm"]:
                    self._emit("STEP_METRIC",
                               "HBM gate: re-admitting uniq-fetch at "
                               f"cap_ss {self.cfg.cap_ss} -> {need} "
                               f"(model peak {peak2/2**30:.1f} GiB)")
                    self.timers["shrinks"] += 1
                    self._uniq_admit_epoch = self._cd_epochs
                    self._uniq_gate_dropped = False
                    self.cfg = dataclasses.replace(
                        self.cfg, uniq_cap=self._uniq_cap0, cap_ss=need)
                    self._build()
                    ss = state.ss.shrunk(need)
                    from .ops.pallas_force import OB as _OB

                    rows = (-(-state.owners.n // _OB)) * self.cfg.uniq_cap
                    ucap = ss.cap if rows else 0
                    ss = ss.replace(
                        uniq_a=jnp.full((rows,), state.owners.n, I),
                        uniq_b=jnp.full((rows,), state.owners.n, I),
                        uidx=jnp.zeros((ucap,), F),
                        uidx_b=jnp.zeros((ucap,), F),
                    )
                    state = self._replace_tables(state, ss=ss)
                    continue
            if mem["peak"] <= _HBM_GATE * mem["hbm"]:
                return state
            detail = (f"projected HBM peak {mem['peak']/2**30:.1f} GiB > "
                      f"{_HBM_GATE:.2f} x {mem['hbm']/2**30:.1f} GiB")
            if (allow_shrink and cnt > 0 and self.cfg.uniq_cap
                    and self.cfg.use_fused_force
                    and not self._uniq_admit_off):
                need = max(512, -(-int(cnt * 1.18 + 64) // 512) * 512)
                if (need < self.cfg.cap_ss
                        and _peak_at_cap(mem, state, self.cfg, need)
                        <= _HBM_GATE * mem["hbm"]):
                    self._emit("STEP_METRIC",
                               "HBM gate: shrinking cap_ss "
                               f"{self.cfg.cap_ss} -> {need} to keep "
                               f"uniq-fetch admitted ({detail})")
                    self.timers["shrinks"] += 1
                    self._uniq_admit_epoch = self._cd_epochs
                    self.cfg = dataclasses.replace(self.cfg, cap_ss=need)
                    self._build()
                    state = self._replace_tables(
                        state, ss=state.ss.shrunk(need))
                    continue
            if not self._oom_degrade(reason="pre-dispatch HBM peak model"):
                raise RuntimeError(
                    "working set exceeds device HBM even with every "
                    f"optional layout dropped ({detail}; cap_ss="
                    f"{self.cfg.cap_ss}, spheres={state.spheres.n}, "
                    f"max_per_bin={self.cfg.max_per_bin}, cd_chunk="
                    f"{self.cfg.cd_chunk}). The simulation has likely "
                    "diverged or the shape is too large for one chip — "
                    "shrink the problem, shard over a mesh, or check the "
                    "time step / SetMaxVelocity."
                )
            self._emit("STEP_METRIC",
                       f"pre-dispatch HBM gate: {detail}; degraded config")
            state = self._relayout_ss(state)
        return state

    def _replace_tables(self, state: SimState, **tables) -> SimState:
        """Swap resized contact tables in; on a mesh, re-place the state so
        host-side resizes keep their shardings (sliced/padded arrays come
        back replicated otherwise, and the sharded jits reject them)."""
        state = state.replace(**tables)
        if self.mesh is not None:
            from .parallel.mesh import shard_state

            state = shard_state(state, self.mesh)
        return state

    def refresh(self, state: SimState, params: RuntimeParams) -> SimState:
        """Refresh with automatic capacity growth (lossless: retries from the
        retained pre-refresh state)."""
        self._cd_epochs += 1
        self._maybe_reenable_sweep()
        state = self._enforce_hbm(state)
        for _ in range(16):
            # re-inject per attempt: grow_for may walk bin_factor back
            params_b = params.replace(
                bin_factor=jnp.asarray(self.bin_factor, F))
            new_state = None
            try:
                new_state = self._relay_retry(
                    lambda: self._get_refresh(state, params_b)(
                        state, params_b))
                ovf = int(new_state.overflow)
            except Exception as e:  # refresh jit has no donation: lossless
                if not (_is_device_oom(e) and self._oom_degrade()):
                    raise
                # outputs of the failed dispatch may pin partial
                # allocations; free them before the recovery allocates
                if new_state is not None:
                    for leaf in jax.tree_util.tree_leaves(new_state):
                        if hasattr(leaf, "delete"):
                            try:
                                leaf.delete()
                            except Exception:
                                pass
                    new_state = None
                # the relayout ALLOCATES the new layout on a device at the
                # OOM edge — if that allocation itself OOMs, walk further
                # down the ladder (the fused-off rung's layout is tiny)
                while True:
                    try:
                        state = self._relayout_ss(state)
                        break
                    except Exception as e2:
                        if not (_is_device_oom(e2) and self._oom_degrade()):
                            raise
                continue
            if not (ovf & _CAP_OVF):
                self._check_vel(new_state, ovf)
                return new_state
            state = self._enforce_hbm(self.grow_for(state, ovf),
                                      allow_shrink=False)
        raise RuntimeError("contact capacity growth did not converge")

    def _oom_degrade(self, reason: str = "device RESOURCE_EXHAUSTED") -> bool:
        """Progressive degradation when a compiled program exhausts HBM
        despite the estimate_hbm_peak gate (the model is calibrated, not
        exact — a 1M-clump refresh with the fused dual layouts OOM'd a
        16 GB chip the model cleared). Returns True if a config change was
        applied and the caller should retry. Order: drop the unique-fetch
        arrays first (pure optimization), then the fused force pass (its
        per-side fstat_a/fstat_b/wcb layouts + their rebuild double-buffers
        dominate the refresh transient at >6M-contact caps; the engine
        falls back to the round-2 XLA contact_pass path, which completed
        1M clumps on the same chip)."""
        cfg = self.cfg
        if cfg.uniq_cap:
            changes = {"uniq_cap": 0}
            if reason.startswith("pre-dispatch"):
                self._uniq_gate_dropped = True  # model call: re-admittable
            else:
                self._uniq_admit_off = True     # real OOM: stays off
        elif cfg.use_fused_force:
            changes = {"use_fused_force": False}
        else:
            return False
        self.timers["oom_degrades"] += 1
        self._emit("WARNING",
                   f"DEM OOM fallback: {changes} ({reason}; retrying "
                   "with a smaller working set)")
        self.cfg = dataclasses.replace(cfg, **changes)
        self._build()
        return True

    def _relayout_ss(self, state: SimState) -> SimState:
        """Convert state.ss to the CURRENT cfg's table layout (after an
        _oom_degrade): contact identity/history fields are carried, the
        layout-dependent fields (statics/premix/fused layouts/uniq) come
        from a fresh empty table — the next refresh rebuilds them before
        anything reads them, but their SHAPES must already match or the
        run_chunks scan carry rejects the state.

        The STALE layout buffers are freed (`.delete()`) before the fresh
        ones are allocated: this runs while the device is already at the
        OOM edge, and holding old+new fused layouts (~0.8 GB each at a
        12M-contact cap) made the recovery itself RESOURCE_EXHAUSTED
        (round-4 1M bench). Safe by the same contract — nothing reads
        the old state's layout fields after this call. Only the LAYOUT
        fields are allocated (ss_layout_fields): a full empty table at
        that cap is another ~1.4 GB of identity/history arrays that
        would be discarded unread."""
        from .initializer import ss_layout_fields, ss_uniq_rows

        for name in ("statics", "fstat_a", "fstat_b", "wcb", "own_a_b",
                     "uidx", "uidx_b", "uniq_a", "uniq_b", "premix",
                     "force", "torque", "cpoint"):
            for leaf in jax.tree_util.tree_leaves(getattr(state.ss, name)):
                if hasattr(leaf, "delete"):
                    try:
                        leaf.delete()
                    except Exception:
                        pass

        ss = state.ss.replace(**ss_layout_fields(
            self.cfg, state.ss.cap, ss_uniq_rows(self.cfg, state.owners.n)))
        return self._replace_tables(state, ss=ss)

    def _propose_k(self, k: int, remaining: int) -> int:
        """Walk the K ladder toward the cheapest measured seconds/step;
        explore an unmeasured neighbor when adjacent to the current best."""
        ladder = [x for x in self.K_LADDER
                  if remaining >= 2 * self.fuse * x
                  and (self.max_freq is None or x <= self.max_freq)]
        if k not in ladder:
            return k
        i = ladder.index(k)
        neighbors = [j for j in (i - 1, i + 1) if 0 <= j < len(ladder)]
        for j in neighbors:  # explore unmeasured neighbors first
            if ladder[j] not in self._k_perf:
                return ladder[j]
        best = min(
            (v, kk) for kk, v in self._k_perf.items() if kk in ladder
        )[1]
        if best == k:
            return k
        return ladder[i + (1 if best > k else -1)]

    def _propose_bin(self) -> float:
        """Walk the bin-factor ladder toward the cheapest measured
        seconds/step (traced — every move is recompile-free)."""
        ladder = sorted(set(self.BIN_LADDER) | {self.bin_factor})
        f = self.bin_factor
        i = ladder.index(f)
        for j in (i - 1, i + 1):
            if 0 <= j < len(ladder) and ladder[j] not in self._bin_perf:
                return ladder[j]
        best = min(
            (v, kk) for kk, v in self._bin_perf.items() if kk in ladder
        )[1]
        if best == f:
            return f
        return ladder[i + (1 if best > f else -1)]

    def advance(self, state: SimState, params: RuntimeParams,
                n_steps: int, update_freq: int) -> SimState:
        """The DoDynamics hot loop: refresh every `update_freq` steps.

        Full spans run through the fused multi-chunk program (`run_chunks`,
        one device dispatch per `fuse` chunks, overflow checked after with
        rewind-and-grow); the remainder uses the per-chunk path. With
        `auto_freq` the CD cadence K is tuned between superchunks from
        measured wall time (margins track K through the traced max_drift,
        so retunes don't recompile; each distinct K does compile once).
        """
        import time as _time

        auto = self.auto_freq
        k = (self.active_freq if auto and self.active_freq else
             update_freq)
        done = 0
        blocks = 0
        # model-driven overload gate first: degrade or die politely
        # BEFORE dispatching anything that would OOM-crash the worker
        state = self._enforce_hbm(state)
        # superchunk fusion exists to amortize the ~15-22 ms dispatch
        # floor; it only pays while a chunk is dispatch-bound, and big
        # multi-chunk scans compile slowly — gate on the HBM peak model
        # (estimate_hbm_peak; calibrated on the round-2 worker crashes)
        mem = estimate_hbm_peak(state, self.cfg)
        if self.fuse > 1 and mem["peak"] > 0.15 * mem["hbm"]:
            self.fuse = 1
            self._emit("STEP_METRIC",
                       "superchunk fusion dropped to 1 chunk/dispatch "
                       f"(HBM peak model {mem['peak']/2**30:.1f} GiB)")
        # at very large capacities even the single-chunk fused
        # refresh+scan program exceeds HBM (refresh transients on top of
        # the scan's double-buffered carry); run refresh and steps as
        # separate programs past ~55% of HBM
        fused_ok = mem["peak"] <= 0.55 * mem["hbm"]
        if not fused_ok:
            self._emit("WARNING",
                       "capacity too large for the fused refresh+steps "
                       "program; running refresh and steps as separate "
                       f"dispatches (HBM peak model {mem['peak']/2**30:.1f}"
                       f"/{mem['hbm']/2**30:.1f} GiB)")
        while fused_ok and n_steps - done >= self.fuse * k:
            self._maybe_reenable_sweep()
            params_k = params.replace(
                max_drift=jnp.asarray(k, I),
                bin_factor=jnp.asarray(self.bin_factor, F))
            compile_hit = (self.fuse, k) not in self._chunks_cache
            if compile_hit:
                self.timers["compiles"] += 1
            fn = self._chunks_fn(self.fuse, k, state, params_k)
            prev = state
            t0 = _time.perf_counter()
            try:
                new = self._relay_retry(lambda: fn(state, params_k))
                ovf = int(new.overflow)  # device sync point
            except Exception as e:  # run_chunks jit has no donation
                if not _is_device_oom(e):
                    raise
                if self.fuse > 1:
                    self.fuse = 1  # smallest fused program first
                    state = prev
                elif self._oom_degrade():
                    state = prev
                    while True:
                        try:
                            state = self._relayout_ss(state)
                            break
                        except Exception as e2:
                            if not (_is_device_oom(e2)
                                    and self._oom_degrade()):
                                raise
                else:
                    raise
                continue
            dt = _time.perf_counter() - t0
            if ovf & _CAP_OVF:
                self.timers["rewinds"] += 1
                state = self._enforce_hbm(self.grow_for(prev, ovf),
                                          allow_shrink=False)
                continue  # rewind: retry the same span with grown tables
            self._check_vel(new, ovf)
            state = new
            done += self.fuse * k
            self._cd_epochs += self.fuse
            blocks += 1
            self.timers["fused_s"] += dt
            self.timers["fused_steps"] += self.fuse * k
            if not compile_hit and self.fuse > 1 and dt > 2.0:
                self.fuse = 1  # dispatch overhead is already negligible
            if not compile_hit:
                per = dt / (self.fuse * k)
                old = self._k_perf.get(k)
                if old is not None and per < 0.8 * old:
                    # the bed is settling (same K got >20% cheaper): the
                    # other rungs' measurements are stale — drop them so
                    # the ladder re-explores toward higher K (the role of
                    # the reference's velocity-headroom re-tune,
                    # AccumStepUpdater, dT.cpp:2276-2299)
                    self._k_perf = {k: per}
                    self._bin_perf.clear()
                else:
                    self._k_perf[k] = per if old is None else (
                        0.5 * old + 0.5 * per
                    )
                bf = self.bin_factor
                old_b = self._bin_perf.get(bf)
                self._bin_perf[bf] = per if old_b is None else (
                    0.5 * old_b + 0.5 * per
                )
                if auto and blocks % 2 == 0:
                    k = self._propose_k(k, n_steps - done)
                    self.active_freq = k
                elif self.auto_bin and blocks % 2 == 1:
                    # alternate with the K tuner so the two hill climbs
                    # never move in the same measurement window
                    self.bin_factor = self._propose_bin()
            if blocks in (1, 64) or blocks % 512 == 0:
                state = self.maybe_shrink(state)
        split_blocks = 0
        while done < n_steps:
            kk = min(k, n_steps - done)
            params_k = params.replace(
                max_drift=jnp.asarray(kk, I),
                bin_factor=jnp.asarray(self.bin_factor, F))
            t0 = _time.perf_counter()
            state = self.refresh(state, params_k)
            split_blocks += 1
            if split_blocks in (1, 64) or split_blocks % 512 == 0:
                state = self.maybe_shrink(state)
            self.timers["refresh_s"] += _time.perf_counter() - t0
            self.timers["refresh_n"] += 1
            t0 = _time.perf_counter()
            state = self._run_steps_recovering(kk, state, params_k)
            self.timers["steps_s"] += _time.perf_counter() - t0
            self.timers["steps_n"] += kk
            done += kk
        return state

    def _relay_retry(self, call):
        """Run a device dispatch, retrying transient relay failures after
        the backend answers a probe again (a long remote compile dropped
        mid-flight killed the round-5 flagship drive phase; the program
        is idempotent and usually already in the persistent cache on
        retry). Non-transient errors — including device OOM — propagate
        unchanged to the callers' degrade ladders."""
        import time as _time

        for attempt in range(4):
            try:
                return call()
            except Exception as e:
                if not _is_relay_transient(e) or attempt == 3:
                    raise
                self._emit("WARNING",
                           f"transient TPU relay error ({e}); probing the "
                           "backend and retrying the dispatch")
                for _ in range(20):
                    try:
                        if float(jnp.ones((8, 8)).sum()) == 64.0:
                            break
                    except Exception:  # noqa: BLE001  (still wedged)
                        pass
                    _time.sleep(30)

    def _run_steps_recovering(self, kk: int, state: SimState,
                              params_k: RuntimeParams) -> SimState:
        """Split-path K-step dispatch with the full OOM degrade ladder.

        The first call after any config (re)build runs WITHOUT donation so
        an execution-time RESOURCE_EXHAUSTED leaves `state` alive; the
        recovery then walks every _oom_degrade rung (uniq off -> fused
        off), re-laying-out + refreshing between rungs, instead of round
        3's single non-guarded retry (ADVICE r3 #1/#2, VERDICT r3 #7).
        Donation is re-enabled once a call at the current config succeeds.
        """
        for _ in range(8):
            donate = self._steps_validated
            try:
                out = self._relay_retry(
                    lambda: self._steps_fn(kk, state, params_k,
                                           donate=donate)(state, params_k))
                self._steps_validated = True
                return out
            except Exception as e:
                if not _is_device_oom(e):
                    raise
                if donate and any(
                    getattr(leaf, "is_deleted", lambda: False)()
                    for leaf in jax.tree_util.tree_leaves(state)
                ):
                    raise RuntimeError(
                        "device OOM on a donated step dispatch consumed "
                        "the simulation state; cannot recover losslessly"
                    ) from e
                if not self._oom_degrade():
                    raise
                while True:
                    try:
                        state = self._relayout_ss(state)
                        break
                    except Exception as e2:
                        if not (_is_device_oom(e2) and self._oom_degrade()):
                            raise
                state = self.refresh(state, params_k)  # rebuild layouts
        raise RuntimeError("OOM degrade ladder did not converge")

    @staticmethod
    def _check_vel(state, ovf: int):
        if ovf & OVF_VEL:
            raise RuntimeError(
                "Simulation diverged: max system velocity "
                f"{float(state.max_vel):.3g} exceeds the error-out "
                "threshold (SetErrorOutVelocity)."
            )
        if ovf & OVF_AVG_CONTACTS:
            raise RuntimeError(
                "Too many contacts per sphere — the simulation likely "
                "diverged or the force model cannot hold the packing "
                "(SetErrorOutAvgContacts)."
            )
