"""Pallas candidate-sweep kernel v3 + output-proportional decode.

Replaces v2 (ops/pallas_sweep2.py). Two structural changes, both driven by
measured TPU costs (tools/profile_prims.py):

1. **No per-sphere searchsorted.** v2 needed per-(sphere, offset) window
   starts/ends computed outside with `searchsorted(method="sort")` — two
   sorts over S*14 queries (~50 ms at 786k spheres). v3 ships the sorted
   3-D bin indices inside the candidate records and derives run starts
   IN-KERNEL by bin-identity matching: the half shell decomposes into 5
   contiguous flat-bin runs (same-row, row above, and three rows in the
   z+1 layer), and within the sorted slab each run is a contiguous slot
   interval whose start is a masked min-reduce. Outside the kernel only a
   per-TILE coarse base remains (2 searches per 256 spheres).

2. **Output-proportional decode.** v2 expanded every candidate slot
   (S x 14 x MPB) and compacted with a scatter — 233 ms at 44M candidate
   slots, by far the dominant CD cost. v3's kernel emits per-sphere hit
   bitmasks (5 runs x 64 bits) + run starts; the decode inverts
   "output slot -> (sphere, k-th hit)" with a cumsum + scatter/cummax +
   one wide row-gather + a k-th-set-bit extraction, all O(cap + S).

Reference parity: this is the broad+mid phase of contactDetection
(DEMCubContactDetection.cu; per-bin n^2 sweep DEMContactKernels_SphereSphere.cu)
re-expressed for the TPU memory system.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..defines import F, I

TILE = 256
WIN = 1024
_BIG = 2**30  # plain int: jnp scalars would be captured as tracer consts

# the 5 contiguous flat-bin runs of the half shell:
#   (dz, dy, dx_lo, dx_hi); run 0 additionally requires slot > my_slot
RUNS = ((0, 0, 0, 1), (0, 1, -1, 1), (1, -1, -1, 1), (1, 0, -1, 1),
        (1, 1, -1, 1))
_LAYER_RUNS = {0: (0, 1), 1: (2, 3, 4)}

# output column layout (TILE, 128) i32
_COL_MASK0 = 0    # 10 words: run r word w at column 2r+w
_COL_ST = 10      # 5 run starts
_COL_FLAGS = 15   # bit0/1: layer window overflow, bit2: >64 hits in a run


def _make_kernel(tile, win, spad):
    n_chunks = win // 128

    def kernel(bases_ref, my_ref, recT_hbm, out_ref, slab_ref, sem):
        t = pl.program_id(0)
        mv = jnp.transpose(my_ref[...])          # (tile, 8)
        my_pos = mv[:, 0:3]
        my_reach = mv[:, 3:4]
        my_own = mv[:, 4:5]
        my_b = mv[:, 5:8]                        # (tile, 3) f32 bin idx
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
        my_slot = t * tile + row_iota            # (tile, 1)

        masks = [jnp.zeros((tile, 1), jnp.int32) for _ in range(10)]
        sts = [None] * 5
        sts[0] = my_slot + 1
        flags = jnp.zeros((tile, 1), jnp.int32)

        for L in (0, 1):
            runs = _LAYER_RUNS[L]
            base = bases_ref[4 * t + 2 * L]
            end = bases_ref[4 * t + 2 * L + 1]
            base = jnp.maximum(base, 0)
            base = pl.multiple_of((base // 128) * 128, 128)
            dma = pltpu.make_async_copy(
                recT_hbm.at[:, pl.ds(base, win)], slab_ref, sem
            )
            dma.start()
            dma.wait()
            # scan only the chunks this tile's runs can reach (the coarse
            # ends make window coverage exact; overflow is checked outside)
            nck = jnp.clip(
                (jnp.minimum(end, base + win) - base + 127) // 128,
                0, n_chunks,
            )

            carry0 = (
                tuple(masks[2 * r] for r in runs),
                tuple(masks[2 * r + 1] for r in runs),
                tuple(sts[r] if r == 0 else
                      jnp.full((tile, 1), _BIG, jnp.int32) for r in runs),
                flags,
            )

            # rolled chunk loop: an unrolled version keeps ~100 live
            # (tile, 128) intermediates and overflows Mosaic's scoped VMEM
            def chunk_body(ci, carry):
                m0, m1, st_t, flg = carry
                off = pl.multiple_of(ci * 128, 128)
                c = slab_ref[:, pl.ds(off, 128)]           # (8, 128)
                slot = base + off + jax.lax.broadcasted_iota(
                    jnp.int32, (tile, 128), 1
                )
                dx = c[5:6, :] - my_b[:, 0:1]
                dy = c[6:7, :] - my_b[:, 1:2]
                dz = c[7:8, :] - my_b[:, 2:3]
                d2 = jnp.zeros((tile, 128), F)
                for ax in range(3):
                    d = my_pos[:, ax:ax + 1] - c[ax:ax + 1, :]
                    d2 = d2 + d * d
                rr = my_reach + c[3:4, :]
                geom = (d2 < rr * rr) & (my_own != c[4:5, :])
                geom &= my_reach > -1e29
                geom &= c[3:4, :] > -1e29  # exclude padding candidates

                m0o, m1o, sto = [], [], []
                for k, r in enumerate(runs):
                    dzr, dyr, lo, hi = RUNS[r]
                    member = ((dz == dzr) & (dy == dyr)
                              & (dx >= lo) & (dx <= hi))
                    if r == 0:
                        member = member & (slot > my_slot)
                        st = st_t[k]
                    else:
                        first = jnp.min(
                            jnp.where(member, slot, _BIG), axis=1,
                            keepdims=True,
                        )
                        st = jnp.minimum(st_t[k], first)
                    hit = geom & member
                    m = slot - st
                    mc = jnp.clip(m, 0, 31)
                    w0b = jnp.where(hit & (m < 32), jnp.int32(1) << mc, 0)
                    mc2 = jnp.clip(m - 32, 0, 31)
                    w1b = jnp.where(hit & (m >= 32) & (m < 64),
                                    jnp.int32(1) << mc2, 0)
                    m0o.append(m0[k] | jnp.sum(w0b, axis=1, keepdims=True))
                    m1o.append(m1[k] | jnp.sum(w1b, axis=1, keepdims=True))
                    occ_ovf = jnp.any(hit & (m >= 64), axis=1,
                                      keepdims=True)
                    flg = flg | jnp.where(occ_ovf, 4, 0)
                    sto.append(st)

                return (tuple(m0o), tuple(m1o), tuple(sto), flg)

            m0, m1, st_t, flags = jax.lax.fori_loop(
                0, nck, chunk_body, carry0
            )
            for k, r in enumerate(runs):
                masks[2 * r] = m0[k]
                masks[2 * r + 1] = m1[k]
                sts[r] = st_t[k]

        cols = masks + sts + [flags]
        pad = jnp.zeros((tile, 128 - len(cols)), jnp.int32)
        out_ref[...] = jnp.concatenate(cols + [pad], axis=1)

    return kernel


def sweep_v3(rec_T, bases, spad, interpret=False, tile=None, win=None):
    """rec_T: (8, spad) f32 field-major records
    [px py pz reach owner bx by bz]; padding rows reach=-1e30, bins=2e9.
    bases: (n_tiles*4,) i32, flattened [start_L0, end_L0, start_L1,
    end_L1] per tile (2-D SMEM prefetch arrays get lane-padded to 128).
    Returns (spad, 128) i32 per-sphere masks/starts/flags."""
    tile = tile or TILE
    win = win or WIN
    assert spad % tile == 0 and win % 128 == 0
    rec_pad = jnp.concatenate(
        [rec_T,
         jnp.zeros((8, win), F).at[3].set(-1e30).at[5:8].set(2e9)],
        axis=1,
    )
    out = pl.pallas_call(
        _make_kernel(tile, win, spad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(spad // tile,),
            in_specs=[
                pl.BlockSpec((8, tile), lambda t, b: (0, t),
                             memory_space=pltpu.VMEM),
                # slab source stays in HBM (ANY lets the compiler pull the
                # whole array into VMEM, which OOMs past ~500k spheres)
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec((tile, 128), lambda t, b: (t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((8, win), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((spad, 128), jnp.int32),
        interpret=interpret,
    )(bases, rec_T, rec_pad)
    return out


def _kth_set_bit(word, k):
    """Position of the k-th (0-based) set bit of each i32 word (k < 32).

    Binary descent on low-half popcounts: 5 steps instead of the naive
    31-step clear-lowest-bit loop (this runs per decoded PAIR — ~6x fewer
    vector ops on a cap-sized array)."""
    w = word
    kk = k
    pos = jnp.zeros_like(word)
    for shift in (16, 8, 4, 2, 1):
        low = w & ((1 << shift) - 1)
        c = jax.lax.population_count(low)
        go_hi = kk >= c
        kk = jnp.where(go_hi, kk - c, kk)
        w = jnp.where(go_hi, jax.lax.shift_right_logical(w, shift), low)
        pos = pos + jnp.where(go_hi, shift, 0)
    return pos


def decode_hits(out, order, cap, spad):
    """Invert the kernel output into a compact (idA, idB) pair table.

    Work is O(spad + cap): one cumsum, one boundary scatter + cummax, one
    (spad, 18)-wide row-gather, one narrow gather for idB. No candidate-
    space expansion.
    Returns (sA_slot, sB_slot, idA, idB, total, occ_ovf);
    idA/idB are -1 beyond `total` (canonical idA < idB).
    """
    masks = out[:, 0:10]
    sts = out[:, 10:15]
    flags = out[:, 15]
    rows = jax.lax.population_count(masks).sum(axis=1)        # (spad,)
    base_inc = jnp.cumsum(rows)
    total = base_inc[-1]
    starts_excl = base_inc - rows

    # p -> row: scatter each non-empty row's output start, then cummax
    has = rows > 0
    dest = jnp.where(has, starts_excl, cap)
    rowid = jnp.full((cap,), -1, I).at[dest].max(
        jnp.arange(spad, dtype=I), mode="drop")
    row = jax.lax.cummax(rowid)
    p = jnp.arange(cap, dtype=I)
    valid = (p < total) & (row >= 0)
    row_c = jnp.clip(row, 0, spad - 1)

    info = jnp.concatenate(
        [masks, sts, starts_excl[:, None], order[:, None].astype(I)],
        axis=1,
    )                                                          # (spad, 17)
    # i16-bitcast row gather (bit-exact i32 round trip): a plain i32 row
    # gather costs ~13-15 ns/row at cap rows, the bitcast one ~5 ns/row
    from .forces import gather_rows

    g = jax.lax.bitcast_convert_type(
        gather_rows(jax.lax.bitcast_convert_type(info, jnp.float32),
                    row_c), I)
    k = p - g[:, 15]

    # word/run selection as an unrolled loop with (cap,) carries: the
    # vectorized (cap, 10) formulation materialized several 157 MB
    # intermediates (popcounts, cumsums, broadcast compares) and decode
    # was HBM-bound, not compute-bound. cum_j is nondecreasing in j, so
    # `cum_j <= k` is a prefix property: w = popcount of the prefix, the
    # selected word is the first j past it.
    cum = jnp.zeros_like(k)
    w = jnp.zeros_like(k)
    ksub = jnp.zeros_like(k)
    wsel = jnp.zeros_like(k)
    selected = jnp.zeros(k.shape, bool)
    for j in range(10):
        wj = g[:, j]
        pcj = jax.lax.population_count(wj)
        cum = cum + pcj
        le = cum <= k
        w = w + le.astype(I)
        ksub = ksub + jnp.where(le, pcj, 0)
        sel_now = (~le) & (~selected)
        wsel = jnp.where(sel_now, wj, wsel)
        selected |= ~le
    kk = k - ksub
    pos = _kth_set_bit(wsel, kk)
    run = w // 2
    m = (w % 2) * 32 + pos
    st = jnp.zeros_like(k)
    for j in range(5):
        st = jnp.where(run == j, g[:, 10 + j], st)
    slot_b = st + m
    slot_a = row_c
    idA0 = g[:, 16]
    idB0 = jax.lax.bitcast_convert_type(
        gather_rows(
            jax.lax.bitcast_convert_type(order[:, None], jnp.float32),
            jnp.clip(slot_b, 0, spad - 1),
        ), I)[:, 0]
    lo = jnp.minimum(idA0, idB0)
    hi = jnp.maximum(idA0, idB0)
    idA = jnp.where(valid, lo, -1)
    idB = jnp.where(valid, hi, -1)
    occ_ovf = jnp.any((flags & 4) != 0)
    return slot_a, slot_b, idA, idB, total, occ_ovf


def find_pairs_ss_pallas3(pos, reach, owner, family, family_mask, bin_size,
                          nb, cap, interpret=None, tile=None, win=None,
                          family_filter=True, member=None):
    """Sphere-sphere candidate pairs through the v3 kernel.

    Returns (idA, idB, count, max_occ, tab, win_ovf) matching the
    find_pairs_ss contract; count may exceed cap (caller raises OVF_SS_CAP).
    When family_filter is False the (traced) family mask is assumed all-
    true over sphere families and the post-filter is skipped.
    """
    from . import binning

    if interpret is None:  # Mosaic needs hardware; CPU tests interpret
        interpret = jax.default_backend() == "cpu"
    tile = tile or TILE
    win = win or WIN
    S = pos.shape[0]
    spad = max(-(-S // tile), win // tile) * tile
    tab = binning.build_sphere_table(
        pos, reach, owner, family, bin_size, nb, spad, member=member
    )

    # coarse per-(tile, layer) slab windows: the first row's lowest run bin
    # (start, searched left) and the last row's highest run bin (end,
    # searched right). Sorted bins are monotone within a tile, so these
    # bound every row's runs; if a window can't cover its tile's span the
    # refresh flags OVF_PALLAS_WIN and the engine grows pallas_win.
    n_tiles = spad // tile
    first = binning.flat_bin(tab.idx3[::tile], nb)           # (n_tiles,)
    last = binning.flat_bin(tab.idx3[tile - 1::tile], nb)
    sz = nb[0] * nb[1]
    q_s = jnp.stack([first, first + sz - nb[0] - 1], axis=1).reshape(-1)
    q_e = jnp.stack([last + nb[0] + 1, last + sz + nb[0] + 1],
                    axis=1).reshape(-1)
    starts = jnp.searchsorted(tab.sorted_bin, q_s, method="sort").astype(I)
    ends = jnp.searchsorted(tab.sorted_bin, q_e, side="right",
                            method="sort").astype(I)
    win_ovf = jnp.any(ends - (starts // 128) * 128 > win)
    bases = jnp.stack(
        [starts.reshape(-1, 2), ends.reshape(-1, 2)], axis=2
    ).reshape(-1)                                            # s0 e0 s1 e1

    # field-major records; bin idx rides along so the kernel can match runs.
    # In-array padding rows (order == S) carry the top-corner bin (nb-1)
    # from build_sphere_table — push them to 2e9 so they can never be run
    # members (their reach is already -1e30).
    idx3f = jnp.where((tab.order < S)[:, None], tab.idx3.astype(F), 2e9)
    recT = jnp.concatenate([tab.rec[:, 0:5].T, idx3f.T], axis=0)

    out = sweep_v3(recT, bases, spad, interpret=interpret, tile=tile,
                   win=win)
    slot_a, slot_b, idA, idB, total, occ_ovf = decode_hits(
        out, tab.order, cap, spad)

    if family_filter:
        live = idA >= 0
        famA = tab.rec[slot_a, 5].astype(I)
        famB = tab.rec[jnp.clip(slot_b, 0, spad - 1), 5].astype(I)
        keep = live & family_mask[famA, famB]
        killed = jnp.sum(live & ~keep)
        count = jnp.maximum(total - killed, 0)
        # re-compact: downstream consumers (persistency re-injection in
        # history.carry_history in particular) assume live pairs occupy
        # [0, count) with no holes (ADVICE r2 #3)
        csum = jnp.cumsum(keep.astype(I))
        dest = jnp.where(keep, csum - 1, cap)
        idA = jnp.full((cap,), -1, I).at[dest].set(
            idA, mode="drop", unique_indices=True)
        idB = jnp.full((cap,), -1, I).at[dest].set(
            idB, mode="drop", unique_indices=True)
    else:
        count = total

    max_occ = jnp.where(occ_ovf, jnp.int32(1 << 20), tab.max_occ)
    return idA, idB, count, max_occ, tab, win_ovf
