"""Pallas candidate-sweep kernel, Mosaic-aligned layout (v2).

Same algorithm as ops/pallas_sweep.py (windowed VMEM slabs + bitmask hit
emission) but with every memory access either a full block or a
128-lane-aligned slice, per Mosaic's tiling rules:

  * records are FIELD-MAJOR: rec_T (8, Spad); the slab scratch is (8, WIN)
    and window chunks are (8, 128) lane-aligned slices;
  * per-tile inputs (records, starts, ends) are read as full blocks and
    transposed once in-register;
  * the output block is a full (TILE, 128) i32 store (columns 0..13 carry
    the per-offset bitmasks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..defines import F, I

TILE = 256
WIN = 1024
MPB = 16
WCHUNK = 128


def _make_kernel(tile, win):
    def kernel(my_ref, se_ref, recT_hbm, mask_ref, slab_ref, sem):
        # my_ref: (8, tile) this tile's records (field-major)
        # se_ref: (32, tile) rows 0..13 starts, rows 16..29 ends
        # recT_hbm: (8, Spad) all records, field-major, HBM
        # mask_ref: (tile, 128) output; cols 0..13 = offset bitmasks
        mv = jnp.transpose(my_ref[...])          # (tile, 8)
        sev = jnp.transpose(se_ref[...])         # (tile, 32)
        my_pos = mv[:, 0:3]
        my_reach = mv[:, 3:4]
        my_own = mv[:, 4:5]
        my_slot = mv[:, 7:8]
        spad = recT_hbm.shape[1]

        accs = []
        for o in range(14):
            base = jnp.minimum(sev[0, o].astype(jnp.int32), spad - win)
            # Mosaic requires the lane-dim DMA offset to be 128-divisible
            base = pl.multiple_of((base // 128) * 128, 128)
            dma = pltpu.make_async_copy(
                recT_hbm.at[:, pl.ds(base, win)], slab_ref, sem
            )
            dma.start()
            dma.wait()

            st = sev[:, o:o + 1].astype(jnp.int32)          # (tile,1)
            en = sev[:, 16 + o:17 + o].astype(jnp.int32)    # (tile,1)
            acc = jnp.zeros((tile, 1), jnp.int32)
            for w0 in range(0, win, WCHUNK):
                c = slab_ref[:, w0:w0 + WCHUNK]             # (8, 128)
                d2 = jnp.zeros((tile, WCHUNK), F)
                for ax in range(3):
                    d = my_pos[:, ax:ax + 1] - c[ax:ax + 1, :]
                    d2 = d2 + d * d
                rr = my_reach + c[3:4, :]
                wslot = base + w0 + jax.lax.broadcasted_iota(
                    jnp.int32, (tile, WCHUNK), 1
                )
                hit = d2 < rr * rr
                hit &= my_own != c[4:5, :]
                hit &= my_reach > -1e29  # exclude padding rows here
                hit &= (wslot >= st) & (wslot < en)
                if o == 0:
                    hit &= wslot.astype(F) > my_slot
                m = wslot - st
                hit &= m < MPB
                bits = jnp.where(hit, jnp.int32(1) << m, 0)
                acc = acc + jnp.sum(bits, axis=1, keepdims=True)
            accs.append(acc)
        out = jnp.concatenate(
            accs + [jnp.zeros((tile, 128 - 14), jnp.int32)], axis=1
        )
        mask_ref[...] = out

    return kernel


def sweep_bitmask_v2(rec_T, se, rec_T_padded=None, interpret=False,
                     tile=None, win=None):
    """rec_T: (8, Spad) field-major records (row 7 = slot index).
    se: (32, Spad) f32 — rows 0..13 window starts, 16..29 window ends.
    rec_T_padded: (8, Spad + win) slab source (defaults to rec_T padded
    with far-away sentinels). Returns (Spad, 128) i32 bitmasks."""
    tile = tile or TILE
    win = win or WIN
    spad = rec_T.shape[1]
    if rec_T_padded is None:
        rec_T_padded = jnp.concatenate(
            [rec_T, jnp.zeros((8, win), F).at[3].set(-1e30)], axis=1
        )
    assert spad % tile == 0
    out = pl.pallas_call(
        _make_kernel(tile, win),
        grid=(spad // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, tile), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tile, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((spad, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((8, win), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(rec_T, se, rec_T_padded)
    return out


def find_pairs_ss_pallas2(pos, reach, owner, family, family_mask, bin_size,
                          nb, cap, interpret=False, tile=None, win=None):
    """find_pairs_ss through the v2 kernel (see pallas_sweep.py for the
    decode-stage contract)."""
    from . import binning

    tile = tile or TILE
    win = win or WIN
    S = pos.shape[0]
    spad = max(-(-S // tile), win // tile) * tile
    tab = binning.build_sphere_table(
        pos, reach, owner, family, bin_size, nb, spad
    )
    offs = jnp.asarray(binning._HALF_SHELL)
    tgt3 = tab.idx3[:, None, :] + offs[None, :, :]
    ok3 = jnp.all((tgt3 >= 0) & (tgt3 < nb[None, None, :]), axis=-1)
    tgt = jnp.where(ok3, binning.flat_bin(tgt3, nb), -2)
    starts = jnp.searchsorted(
        tab.sorted_bin, tgt, method="sort"
    ).astype(I)
    ends = jnp.searchsorted(
        tab.sorted_bin, tgt, side="right", method="sort"
    ).astype(I)
    ends = jnp.minimum(ends, starts + MPB)

    tile_base = starts.reshape(-1, tile, 14)[:, 0:1, :]
    # the kernel aligns the slab start down by up to 127 slots
    win_ovf = jnp.any((ends.reshape(-1, tile, 14) - tile_base) > win - 128)

    k = jnp.arange(spad, dtype=F)
    rec = jnp.concatenate([tab.rec, k[:, None]], axis=1)
    rec_T = rec.T  # (8, spad); slab source gets sentinel padding inside
    se = jnp.concatenate(
        [
            starts.astype(F).T,                       # rows 0..13
            jnp.zeros((2, spad), F),
            ends.astype(F).T,                         # rows 16..29
            jnp.zeros((2, spad), F),
        ],
        axis=0,
    )

    mask = sweep_bitmask_v2(rec_T, se, interpret=interpret, tile=tile,
                            win=win)[:, :14]

    # decode: purely arithmetic payloads (sorted-space slots); the id /
    # family gathers run AFTER compaction over the small live set
    m = jnp.arange(MPB, dtype=I)
    hit = ((mask[..., None] >> m) & 1).astype(bool)
    slot_b = starts[..., None] + m
    slot_a = jnp.broadcast_to(
        jnp.arange(spad, dtype=I)[:, None, None], hit.shape
    )
    sA = jnp.full((cap,), spad - 1, I)
    sB = jnp.full((cap,), spad - 1, I)
    (sA, sB), total0 = binning._compact(
        hit.reshape(-1),
        (slot_a.reshape(-1), jnp.minimum(slot_b, spad - 1).reshape(-1)),
        cap, jnp.zeros((), I), (sA, sB),
    )
    # post-compaction: resolve ids + family mask, then squeeze out rejects
    live0 = jnp.arange(cap, dtype=I) < jnp.minimum(total0, cap)
    idA0 = tab.order[sA]
    idB0 = tab.order[sB]
    famA = tab.rec[sA, 5].astype(I)
    famB = tab.rec[sB, 5].astype(I)
    keep = live0 & family_mask[famA, famB]
    lo = jnp.minimum(idA0, idB0)
    hi = jnp.maximum(idA0, idB0)
    outA = jnp.full((cap,), -1, I)
    outB = jnp.full((cap,), -1, I)
    (outA, outB), total = binning._compact(
        keep, (lo, hi), cap, jnp.zeros((), I), (outA, outB)
    )
    # a pre-filter (stage-1) overflow is an ordinary table-capacity overflow:
    # report the larger stage-1 count as `total` so the caller's
    # `count > cap` check raises OVF_SS_CAP and grows cap_ss, NOT the VMEM
    # window (which only OVF_PALLAS_WIN should grow)
    total = jnp.maximum(total, total0)
    return outA, outB, total, tab.max_occ, tab, win_ovf
