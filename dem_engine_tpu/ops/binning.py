"""Broad + mid phase contact detection: cell list over a uniform bin grid.

Design translation (SURVEY.md §7): the reference's multi-bin sphere
membership + CUB radix-sort/RLE/scan pipeline + per-bin shared-memory n²
sweep (DEMCubContactDetection.cu, DEMBinSphereKernels.cu,
DEMContactKernels_*.cu) is re-expressed TPU-natively as:

  1. every sphere belongs to exactly ONE bin (its center's), with
     ``bin_size = 2 * max(radius + margin)`` so any touching pair is within
     one bin of each other — this removes DEME's variable-length
     bins-per-sphere stage entirely;
  2. ``lax.sort`` by bin id (XLA's radix path) + ``searchsorted`` replaces
     CUB SortByKeys / RunLengthEncode / PrefixScan;
  3. pair enumeration sweeps a 14-bin half shell per sphere with a static
     per-bin occupancy cap, producing a fixed-capacity padded pair table
     (DEME instead resizes device vectors);
  4. overflow (bin occupancy, table capacity) sets flags surfaced to the
     host, which grows capacities and re-runs — the functional equivalent
     of DEME's error-out-or-resize behavior (SURVEY.md §4.2).

`bin_size` and bin counts are traced scalars: the grid auto-adapts to the
current velocity-dependent margins with NO recompilation (the analogue of
kT's adaptive bin-size tuner, kT.cpp:43-98).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..defines import F, I

# half shell: the 13 forward neighbor offsets + self bin; each unordered bin
# pair is visited exactly once
_HALF_SHELL = np.asarray(
    [[0, 0, 0], [1, 0, 0], [-1, 1, 0], [0, 1, 0], [1, 1, 0]]
    + [[dx, dy, 1] for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
    np.int32,
)

_MAX_TOTAL_BINS = float(2**30)
_SENTINEL_BIN = np.int32(2**31 - 1)


def build_grid(domain, reach_max, factor=None):
    """Choose bin size and per-axis bin counts (all traced).

    Plays the role of decideBinSize + the kT auto-tuner
    (APIPrivate.cpp:489-566) but is recomputed every refresh for free.
    `factor` (traced, >= 1) scales the cell above the one-bin-per-sphere
    floor of 2*reach: the engine's adaptive bin tuner and the user's
    SetBinSize/SetInitBinSize drive it without recompiles (sizes below
    the floor would silently miss pairs beyond one cell, so it clamps).
    """
    bs = 2.0 * reach_max * 1.01 + 1e-30
    if factor is not None:
        bs = bs * jnp.maximum(factor, 1.0)
    nb = jnp.maximum(jnp.ceil(domain / bs), 1.0)
    prod = nb[0] * nb[1] * nb[2]
    scale = jnp.maximum(1.0, jnp.cbrt(prod / _MAX_TOTAL_BINS))
    # per-axis cap at 2^23: the Pallas sweep carries per-axis indices in
    # f32 records, which are only integer-exact below 2^24 (an extreme
    # aspect-ratio domain can blow one axis while the product stays small)
    scale = jnp.maximum(scale, jnp.max(domain) / bs / float(2**23))
    bs = bs * scale
    nb = jnp.maximum(jnp.ceil(domain / bs), 1.0).astype(I)
    return bs, nb


def bin_index_3d(pos, bin_size, nb):
    idx = jnp.floor(pos / bin_size).astype(I)
    return jnp.clip(idx, 0, nb - 1)


def flat_bin(idx3, nb):
    return (idx3[..., 2] * nb[1] + idx3[..., 1]) * nb[0] + idx3[..., 0]


@dataclasses.dataclass
class SphereBinTable:
    """Sorted (bin, sphere) table shared by the SS and ST sweeps.

    `rec` packs the candidate payload [pos3, reach, owner, family, id] into
    one f32 row per sphere so the sweep does a single wide row-gather per
    candidate slot instead of many scalar gathers (TPU gathers cost per
    row, not per element). Integer payloads are exact in f32 below 2^24.
    """

    sorted_bin: jnp.ndarray   # i32[Spad]
    rec: jnp.ndarray          # f32[Spad,7] pos3 reach owner family id
    order: jnp.ndarray        # i32[Spad] original sphere id (=S for padding)
    idx3: jnp.ndarray         # i32[Spad,3] sorted 3d bin indices
    max_occ: jnp.ndarray      # i32[] max spheres in any bin


jax.tree_util.register_dataclass(
    SphereBinTable,
    data_fields=("sorted_bin", "rec", "order", "idx3", "max_occ"),
    meta_fields=(),
)


def build_sphere_table(pos, reach, owner, family, bin_size, nb, pad_to,
                       member=None):
    """Sort spheres by bin id; pad to a static size with sentinel bins.

    `member` (bool[S], traced) restricts the table to a subset: excluded
    spheres sort to the sentinel tail with reach -1e30, so sweeps treat
    them exactly like padding (the two-class polydisperse path classes
    spheres by radius with a traced threshold — no static split, no
    recompiles when the threshold moves)."""
    S = pos.shape[0]
    idx3 = bin_index_3d(pos, bin_size, nb)
    binid = flat_bin(idx3, nb)
    if member is not None:
        binid = jnp.where(member, binid, _SENTINEL_BIN)
    sorted_bin, order = jax.lax.sort(
        (binid, jnp.arange(S, dtype=I)), num_keys=1
    )
    pad = pad_to - S
    if pad > 0:
        sorted_bin = jnp.concatenate(
            [sorted_bin, jnp.full((pad,), _SENTINEL_BIN, I)]
        )
        order = jnp.concatenate([order, jnp.full((pad,), S, I)])
    # ONE packed row gather through the sort order (separate width-1 f32
    # gathers cost ~13-15 ns/row each on this TPU; a packed i16-bitcast
    # row gather is ~5 ns/row total — stage-G refresh bisect, round 4)
    from .forces import gather_rows

    src = jnp.concatenate(
        [
            pos,
            reach[:, None],
            owner.astype(F)[:, None],
            family.astype(F)[:, None],
            idx3.astype(F),
        ]
        + ([member.astype(F)[:, None]] if member is not None else []),
        axis=1,
    )
    g = gather_rows(src, jnp.minimum(order, S - 1))
    ok = order < S
    if member is not None:
        # excluded spheres are full padding: id -> S so they never act as
        # sweep rows, sentinel bin so they are never candidates
        ok = ok & (g[:, 9] > 0.5)
    rec = jnp.concatenate(
        [
            g[:, 0:3],
            jnp.where(ok, g[:, 3], -1e30)[:, None],
            jnp.where(ok, g[:, 4], -1.0)[:, None],
            jnp.where(ok, g[:, 5], 0.0)[:, None],
            jnp.where(ok, order, S).astype(F)[:, None],
        ],
        axis=1,
    )
    # padding rows get the top-corner bin: their sorted position (after the
    # sentinel sort key) then stays consistent with a maximal bin index, so
    # per-tile coarse window ends in the Pallas sweep bound real rows
    sidx3 = jnp.where(ok[:, None], g[:, 6:9].astype(I), nb[None, :] - 1)

    # max bin occupancy via run-length over the sorted bins
    k = jnp.arange(pad_to, dtype=I)
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_bin[1:] != sorted_bin[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(boundary, k, 0))
    occ = jnp.where(sorted_bin != _SENTINEL_BIN, k - run_start + 1, 0)
    max_occ = occ.max() if pad_to > 0 else jnp.zeros((), I)

    if member is not None:
        # excluded rows read as padding everywhere (Pallas sweep decode
        # keys its neutralization on order == S)
        order = jnp.where(ok, order, S)
    return SphereBinTable(sorted_bin, rec, order, sidx3, max_occ)


def _compact(hit_flat, payloads, cap, base_total, outs):
    """Scatter hits into fixed-capacity output arrays.

    dest indices are unique (strictly increasing over the hits), so the
    scatter is race-free; invalid lanes go to index `cap` and are dropped.
    """
    csum = jnp.cumsum(hit_flat.astype(I))
    dest = jnp.where(hit_flat, base_total + csum - 1, cap)
    dest = jnp.where(dest < cap, dest, cap)
    new_outs = tuple(
        o.at[dest].set(p, mode="drop", unique_indices=True)
        for o, p in zip(outs, payloads)
    )
    return new_outs, base_total + csum[-1] if hit_flat.size else base_total


def find_pairs_ss(pos, reach, owner, family, family_mask, bin_size, nb,
                  cap, max_per_bin, chunk=0, member=None, base=None,
                  outs=None):
    """Sphere–sphere candidate pairs within summed reach.

    Returns (idA, idB, count, max_occ) with idA < idB canonical ordering
    (stable roles across refreshes so contact history maps cleanly).
    `member` restricts both rows and candidates to a class subset;
    (`outs`, `base`) append into a prior sweep's compacted output.
    """
    S = pos.shape[0]
    if chunk <= 0:
        chunk = min(max(S, 1), 65536)
    n_chunks = -(-S // chunk)
    spad = n_chunks * chunk

    tab = build_sphere_table(pos, reach, owner, family, bin_size, nb, spad,
                             member=member)
    fam_mask_flat = family_mask.reshape(-1)
    offs = jnp.asarray(_HALF_SHELL)  # (14,3)
    mpb = max_per_bin

    outA0, outB0 = outs if outs is not None else (
        jnp.full((cap,), -1, I), jnp.full((cap,), -1, I))

    def body(carry, ci):
        outA, outB, total = carry
        k0 = ci * chunk
        kk = k0 + jnp.arange(chunk, dtype=I)
        my_idx3 = jax.lax.dynamic_slice_in_dim(tab.idx3, k0, chunk)
        my_rec = jax.lax.dynamic_slice_in_dim(tab.rec, k0, chunk)
        my_pos = my_rec[:, 0:3]
        my_reach = my_rec[:, 3]
        my_own = my_rec[:, 4]
        my_fam = my_rec[:, 5].astype(I)
        my_id = my_rec[:, 6].astype(I)
        row_ok = my_id < S

        tgt3 = my_idx3[:, None, :] + offs[None, :, :]          # (ch,14,3)
        ok3 = jnp.all((tgt3 >= 0) & (tgt3 < nb[None, None, :]), axis=-1)
        tgt = jnp.where(ok3, flat_bin(tgt3, nb), -2)           # (ch,14)

        starts = jnp.searchsorted(tab.sorted_bin, tgt)         # (ch,14)
        ends = jnp.searchsorted(tab.sorted_bin, tgt, side="right")
        slots = starts[..., None] + jnp.arange(mpb, dtype=I)   # (ch,14,mpb)
        slots_c = jnp.minimum(slots, spad - 1)
        valid = (slots < ends[..., None]) & (slots < spad)
        same_bin = (jnp.arange(14) == 0)[None, :, None]
        valid &= jnp.where(same_bin, slots > kk[:, None, None], True)
        valid &= row_ok[:, None, None]

        crec = tab.rec[slots_c]            # one wide row-gather
        cpos = crec[..., 0:3]
        cre = crec[..., 3]
        cown = crec[..., 4]
        cfam = crec[..., 5].astype(I)
        cid = crec[..., 6].astype(I)

        d = my_pos[:, None, None, :] - cpos
        d2 = jnp.sum(d * d, axis=-1)
        rr = my_reach[:, None, None] + cre
        hit = valid & (d2 < rr * rr)
        hit &= cown != my_own[:, None, None]
        hit &= fam_mask_flat[my_fam[:, None, None] * 256 + cfam]

        a = jnp.broadcast_to(my_id[:, None, None], hit.shape)
        lo = jnp.minimum(a, cid).reshape(-1)
        hi = jnp.maximum(a, cid).reshape(-1)
        (outA, outB), total = _compact(
            hit.reshape(-1), (lo, hi), cap, total, (outA, outB)
        )
        return (outA, outB, total), None

    (outA, outB, total), _ = jax.lax.scan(
        body, (outA0, outB0,
               base if base is not None else jnp.zeros((), I)),
        jnp.arange(n_chunks, dtype=I),
    )
    return outA, outB, total, tab.max_occ, tab


_FULL_SHELL = np.stack(
    np.meshgrid(*[np.arange(-1, 2)] * 3, indexing="ij"), axis=-1
).reshape(-1, 3).astype(np.int32)  # 27 neighbor offsets


def compact_member(member, lcap, *arrays):
    """Stable-compact the `member` rows of `arrays` into static-size lcap
    heads (members keep ascending index order, so canonical id ordering is
    preserved through the compaction). Returns
    (compacted tuple, orig_id i32[lcap] (=S on dead rows), live bool[lcap],
    n_member, ovf bool[] — more members than lcap)."""
    S = member.shape[0]
    key = jnp.where(member, 0, 1).astype(I)
    _, order = jax.lax.sort((key, jnp.arange(S, dtype=I)), num_keys=1)
    sel = order[:lcap]
    n_mem = jnp.sum(member.astype(I))
    live = jnp.arange(lcap, dtype=I) < n_mem
    outs = tuple(a[sel] for a in arrays)
    orig = jnp.where(live, sel, S)
    return outs, orig, live, n_mem, n_mem > lcap


def build_cross_entries(pos_l, footprint, live_l, bin_size, nb):
    """Multi-bin registration of (compacted) large-class spheres: each
    sphere enters every bin whose cell cube is within `footprint` (its
    reach + the other class's max reach) of its center, so a cross pair
    is found by scanning ONLY the small sphere's own bin — the reference's
    multi-bin sphere membership (DEMBinSphereKernels.cu:60-153) applied to
    the large class. `footprint <= bin_size` is the caller's invariant
    (coarse cell >= reach_l_max and >= reach_s_max + reach_l_max ... / 2),
    so the 27-offset full shell statically covers the footprint.

    Boundary bins use half-open cubes (positions outside the domain clip
    into edge bins; the extended cube keeps the registration a superset of
    every position that clips there).

    Returns (entry_bins i32[L*27] sorted, entry_lidx i32[L*27] compact
    large index per entry, occ_x i32[] max entries in one bin)."""
    L = pos_l.shape[0]
    c3 = bin_index_3d(pos_l, bin_size, nb)
    offs = jnp.asarray(_FULL_SHELL)                        # (27,3)
    tgt3 = c3[:, None, :] + offs[None, :, :]               # (L,27,3)
    ok = jnp.all((tgt3 >= 0) & (tgt3 < nb[None, None, :]), axis=-1)
    ok &= live_l[:, None]
    lo = jnp.where(tgt3 == 0, -jnp.inf,
                   tgt3.astype(F) * bin_size)
    hi = jnp.where(tgt3 == nb[None, None, :] - 1, jnp.inf,
                   (tgt3 + 1).astype(F) * bin_size)
    cl = jnp.clip(pos_l[:, None, :], lo, hi)
    d = pos_l[:, None, :] - cl
    ok &= jnp.sum(d * d, axis=-1) <= footprint[:, None] ** 2
    binid = jnp.where(ok, flat_bin(tgt3, nb), _SENTINEL_BIN)
    lidx = jnp.broadcast_to(
        jnp.arange(L, dtype=I)[:, None], (L, 27)
    )
    sb, sl = jax.lax.sort(
        (binid.reshape(-1), lidx.reshape(-1)), num_keys=1
    )
    E = L * 27
    k = jnp.arange(E, dtype=I)
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), sb[1:] != sb[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(boundary, k, 0))
    occ = jnp.where(sb != _SENTINEL_BIN, k - run_start + 1, 0)
    occ_x = occ.max() if E else jnp.zeros((), I)
    return sb, sl, occ_x


def find_pairs_cross_fine(pos, reach, owner, family, row_member, rec_l,
                          entry_bins, entry_lidx, family_mask, bin_size,
                          nb, cap, mpb_x, base=None, outs=None, chunk=0):
    """Cross-class candidates via the multi-bin entry table: rows are
    `row_member` (small) spheres, each scanning the entries of its OWN
    coarse bin only (build_cross_entries pre-expanded the large class's
    footprints, so no neighbor-shell scan and no per-row searchsorted fan
    out — the round-3 coarse slot sweep scanned 27 offsets x max_per_bin
    for EVERY small sphere and was the 10x poly refresh cost,
    VERDICT r3 #3). Classes are disjoint so each unordered pair is
    visited exactly once. Appends into (outs, base)."""
    S = pos.shape[0]
    E = entry_bins.shape[0]
    if chunk <= 0:
        chunk = min(max(S, 1), 65536)
    n_chunks = -(-S // chunk)
    spad_rows = n_chunks * chunk
    fam_mask_flat = family_mask.reshape(-1)

    if outs is None:
        outs = (jnp.full((cap,), -1, I), jnp.full((cap,), -1, I))
    if base is None:
        base = jnp.zeros((), I)

    pad = spad_rows - S

    def padded(x, fill):
        if not pad:
            return x
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
        )

    live_row = padded(row_member, False)
    posp = padded(pos, 0.0)
    reachp = padded(reach, -1e30)
    ownp = padded(owner, -1)
    famp = padded(family, 0)

    myb = flat_bin(bin_index_3d(posp, bin_size, nb), nb)
    myb = jnp.where(live_row, myb, -2)
    starts_all = jnp.searchsorted(
        entry_bins, myb, method="sort").astype(I)
    ends_all = jnp.searchsorted(
        entry_bins, myb, side="right", method="sort").astype(I)

    def body(carry, ci):
        outA, outB, total = carry
        k0 = ci * chunk
        my_pos = jax.lax.dynamic_slice_in_dim(posp, k0, chunk)
        my_reach = jax.lax.dynamic_slice_in_dim(reachp, k0, chunk)
        my_own = jax.lax.dynamic_slice_in_dim(ownp, k0, chunk)
        my_fam = jax.lax.dynamic_slice_in_dim(famp, k0, chunk)
        my_live = jax.lax.dynamic_slice_in_dim(live_row, k0, chunk)
        starts = jax.lax.dynamic_slice_in_dim(starts_all, k0, chunk)
        ends = jax.lax.dynamic_slice_in_dim(ends_all, k0, chunk)
        my_id = k0 + jnp.arange(chunk, dtype=I)

        slots = starts[:, None] + jnp.arange(mpb_x, dtype=I)  # (ch,mpb)
        valid = (slots < ends[:, None]) & (slots < E)
        valid &= my_live[:, None]
        lid = entry_lidx[jnp.minimum(slots, E - 1)]
        crec = rec_l[lid]                   # (ch, mpb, 7) one row-gather
        cpos = crec[..., 0:3]
        cre = crec[..., 3]
        cown = crec[..., 4]
        cfam = crec[..., 5].astype(I)
        cid = crec[..., 6].astype(I)

        d = my_pos[:, None, :] - cpos
        d2 = jnp.sum(d * d, axis=-1)
        rr = my_reach[:, None] + cre
        hit = valid & (d2 < rr * rr) & (rr > 0.0)
        hit &= cown.astype(I) != my_own[:, None]
        hit &= fam_mask_flat[my_fam[:, None] * 256 + cfam]

        a = jnp.broadcast_to(my_id[:, None], hit.shape)
        lo = jnp.minimum(a, cid).reshape(-1)
        hi = jnp.maximum(a, cid).reshape(-1)
        (outA, outB), total = _compact(
            hit.reshape(-1), (lo, hi), cap, total, (outA, outB)
        )
        return (outA, outB, total), None

    (outA, outB, total), _ = jax.lax.scan(
        body, (*outs, base), jnp.arange(n_chunks, dtype=I)
    )
    return outA, outB, total


def find_pairs_st(aabb_min, aabb_max, tri_owner, tri_family, tab: SphereBinTable,
                  family_mask, bin_size, nb, cap, max_span, max_per_bin,
                  bin_lo=None, bin_hi=None, nodes=None, tri_margin=None):
    """Sphere–triangle candidate pairs; rows are triangles.

    Triangles enumerate the bins their (margin + max-sphere-reach expanded)
    AABB overlaps and test the spheres resident in each — reusing the SS
    sphere table, so each (sphere, tri) pair is visited exactly once (a
    sphere lives in exactly one bin). When world-frame `nodes` (T,3,3) and
    `tri_margin` (T,) are given, candidates additionally pass an EXACT
    point-to-triangle distance test, so large/diagonal facets do not
    over-generate (the role of the reference's SAT triangle-box test,
    DEMTriangleBoxIntersect.cu, made exact because we test against the
    actual sphere centers rather than bins).
    """
    T = aabb_min.shape[0]
    fam_mask_flat = family_mask.reshape(-1)
    mpb = max_per_bin
    spad = tab.sorted_bin.shape[0]
    if bin_lo is None:
        bin_lo, bin_hi = aabb_min, aabb_max

    lo3 = bin_index_3d(bin_lo, bin_size, nb)
    hi3 = bin_index_3d(bin_hi, bin_size, nb)
    span3 = hi3 - lo3 + 1
    span_overflow = jnp.any(span3 > max_span)
    span3 = jnp.minimum(span3, max_span)

    sp = max_span
    g = np.stack(
        np.meshgrid(np.arange(sp), np.arange(sp), np.arange(sp),
                    indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)[:, ::-1]  # (sp^3, 3) in (x,y,z) minor-to-major
    g = jnp.asarray(np.ascontiguousarray(g), I)

    # ---- stage 1: precise triangle binning -------------------------------
    # A large inclined facet's AABB covers O(span^3) bins but its
    # slab-expanded plane crosses only O(span^2) of them. The reference
    # prunes with extruded sandwich prisms + a SAT triangle-box test per
    # enumerated bin (DEMBinTriangleKernels.cu:22,
    # DEMTriangleBoxIntersect.cu); the TPU-native equivalent is cheap
    # elementwise math over the (T, span^3) candidate grid — keep a bin
    # iff its center lies within (half-diagonal + max sphere reach +
    # tri margin) of the triangle's PLANE — followed by an
    # output-proportional compaction, so the expensive per-slot sphere
    # scan in stage 2 runs only over bins the facet truly crosses.
    tgt3 = lo3[:, None, :] + g[None, :, :]                     # (T,sp3,3)
    okk = jnp.all(g[None] < span3[:, None, :], axis=-1) & jnp.all(
        tgt3 < nb[None, None, :], axis=-1
    )
    if nodes is not None:
        nrm = jnp.cross(nodes[:, 1] - nodes[:, 0], nodes[:, 2] - nodes[:, 0])
        nrm = nrm / jnp.maximum(
            jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-30)
        # bins anchor at coordinate 0 (bin_index_3d: floor(pos/bs))
        ctr = (tgt3.astype(F) + 0.5) * bin_size                # (T,sp3,3)
        pd = jnp.abs(
            jnp.sum(ctr * nrm[:, None, :], axis=-1)
            - jnp.sum(nodes[:, 0] * nrm, axis=-1)[:, None]
        )
        # any sphere's reach <= bin_size/2 by construction (build_grid);
        # half-diagonal covers the worst center-offset inside the bin
        thr = (0.5 * np.sqrt(3.0) + 0.5) * bin_size
        if tri_margin is not None:
            thr = thr + tri_margin[:, None]
        okk &= pd <= thr

    # compact surviving (tri, bin) pairs to a span^2-scaled capacity
    tb_cap = int(min(max(T, 1) * sp * sp * sp,
                     max(4096, 6 * max(T, 1) * sp * sp)))
    tgt_all = jnp.where(okk, flat_bin(tgt3, nb), -2).reshape(-1)
    tri_all = jnp.broadcast_to(
        jnp.arange(T, dtype=I)[:, None], okk.shape).reshape(-1)
    tb_bin = jnp.full((tb_cap,), -2, I)
    tb_tri = jnp.full((tb_cap,), 0, I)
    (tb_bin, tb_tri), tb_total = _compact(
        okk.reshape(-1), (tgt_all, tri_all), tb_cap,
        jnp.zeros((), I), (tb_bin, tb_tri),
    )
    # an overflow walks the same ladder as an over-span AABB (the engine
    # grows max_span, which also grows tb_cap, and finally flips to the
    # brute-force O(S*T) path)
    span_overflow |= tb_total > tb_cap

    # ---- stage 2: per-slot sphere scan over surviving bins ----------------
    starts = jnp.searchsorted(tab.sorted_bin, tb_bin)          # (tb,)
    ends = jnp.searchsorted(tab.sorted_bin, tb_bin, side="right")
    slots = starts[:, None] + jnp.arange(mpb, dtype=I)         # (tb,mpb)
    slots_c = jnp.minimum(slots, spad - 1)
    valid = (slots < ends[:, None]) & (slots < spad)

    crec = tab.rec[slots_c]
    cpos = crec[..., 0:3]
    cre = crec[..., 3]
    cown = crec[..., 4].astype(I)
    cfam = crec[..., 5].astype(I)
    cid = crec[..., 6].astype(I)

    # per-candidate triangle data: row gathers over the compacted pairs
    t_amin = aabb_min[tb_tri][:, None, :]
    t_amax = aabb_max[tb_tri][:, None, :]

    # coarse test: sphere center within reach of the tri AABB
    clamped = jnp.clip(cpos, t_amin, t_amax)
    d = cpos - clamped
    d2 = jnp.sum(d * d, axis=-1)
    hit = valid & (d2 < cre * cre)
    if nodes is not None:
        # exact narrow candidate test: distance to the triangle itself
        from . import narrowphase

        tn = nodes[tb_tri]                                     # (tb,3,3)
        closest = narrowphase.closest_point_triangle(
            cpos, tn[:, None, 0], tn[:, None, 1], tn[:, None, 2],
        )
        dt2 = jnp.sum((cpos - closest) ** 2, axis=-1)
        rr = cre + (tri_margin[tb_tri][:, None] if tri_margin is not None
                    else 0.0)
        hit &= dt2 < rr * rr
    hit &= cown != tri_owner[tb_tri][:, None]
    hit &= fam_mask_flat[cfam * 256 + tri_family[tb_tri][:, None]]

    tri_ids = jnp.broadcast_to(tb_tri[:, None], hit.shape).reshape(-1)
    outA = jnp.full((cap,), -1, I)
    outB = jnp.full((cap,), -1, I)
    (outA, outB), total = _compact(
        hit.reshape(-1), (cid.reshape(-1), tri_ids), cap,
        jnp.zeros((), I), (outA, outB),
    )
    return outA, outB, total, span_overflow


def find_pairs_sa(overlap_margined, sph_owner, sph_family, anal_owner,
                  anal_family, family_mask, cap):
    """Sphere–analytical pairs from a precomputed (S, A) margined-overlap
    matrix (the caller runs the narrow phase with margins; analytical
    components are few, so brute force is cheapest — the reference likewise
    scans all analytical geometries per sphere, DEMBinSphereKernels.cu:11)."""
    S, A = overlap_margined.shape
    hit = overlap_margined > 0.0
    hit &= sph_owner[:, None] != anal_owner[None, :]
    hit &= family_mask[sph_family[:, None], anal_family[None, :]]

    sph_ids = jnp.broadcast_to(jnp.arange(S, dtype=I)[:, None], hit.shape)
    anal_ids = jnp.broadcast_to(jnp.arange(A, dtype=I)[None, :], hit.shape)
    outA = jnp.full((cap,), -1, I)
    outB = jnp.full((cap,), -1, I)
    (outA, outB), total = _compact(
        hit.reshape(-1), (sph_ids.reshape(-1), anal_ids.reshape(-1)),
        cap, jnp.zeros((), I), (outA, outB),
    )
    return outA, outB, total
