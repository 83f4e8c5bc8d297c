"""Pallas TPU kernel for the sphere-sphere candidate sweep.

The XLA sweep (ops/binning.py) tests 14 half-shell bins × max_per_bin slots
per sphere through row-gathers. This kernel replaces the gathers with dense
VMEM work: for each tile of T sorted spheres and each shell offset, it DMAs
the contiguous candidate window (sorted spheres are bin-contiguous; window
starts are monotone) into VMEM and compares the whole tile against the
whole window in (T × 8) blocks. Hits are emitted as a per-(sphere, offset)
BITMASK over the window slot m = candidate_slot - start (a per-lane shift +
OR — no dynamic indexing anywhere), which the XLA side decodes and
compacts exactly like the gather sweep.

Everything here is plain VPU work on contiguous VMEM: the kernel performs
zero gathers and zero scatters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..defines import F, I

TILE = 256      # spheres per grid step
WIN = 1024      # candidate window slab (must cover tile span + mpb)
MPB = 16        # bits per (sphere, offset) mask; fixed for u16-style masks
WCHUNK = 8      # window rows compared per inner iteration


def _make_sweep_kernel(tile, win):
    def _sweep_kernel(starts_ref, ends_ref, myrec_ref, rec_hbm, mask_ref,
                      slab_ref, sem):
        # myrec: (tile, 8) this tile's sorted records
        # starts/ends: (tile, 14) candidate windows per shell offset
        # rec_hbm: (Spad, 8) full sorted record table in HBM
        # mask: (tile, 14) i32 output bitmasks
        my_pos = myrec_ref[:, 0:3]
        my_reach = myrec_ref[:, 3]
        my_own = myrec_ref[:, 4]
        my_slot = myrec_ref[:, 7]  # global sorted slot index (f32, exact)

        spad = rec_hbm.shape[0]
        for o in range(14):
            # clamp so the static slab stays in bounds (coverage only grows)
            base = jnp.minimum(starts_ref[0, o], spad - win)
            dma = pltpu.make_async_copy(
                rec_hbm.at[pl.ds(base, win), :], slab_ref, sem
            )
            dma.start()
            dma.wait()

            st = starts_ref[:, o]
            en = ends_ref[:, o]
            acc = jnp.zeros((tile,), jnp.int32)
            # compare the tile against the window in row chunks
            for w0 in range(0, win, WCHUNK):
                cand = slab_ref[w0:w0 + WCHUNK, :]     # (WCHUNK, 8)
                cpos = cand[:, 0:3]
                cre = cand[:, 3]
                cown = cand[:, 4]
                # (tile, WCHUNK) pairwise tests
                d = my_pos[:, None, :] - cpos[None, :, :]
                d2 = jnp.sum(d * d, axis=-1)
                rr = my_reach[:, None] + cre[None, :]
                wslot = base + w0 + jax.lax.broadcasted_iota(
                    jnp.int32, (tile, WCHUNK), 1
                )
                hit = (d2 < rr * rr)
                hit &= my_own[:, None] != cown[None, :]
                hit &= (wslot >= st[:, None]) & (wslot < en[:, None])
                # same-bin offset (o == 0): only slots after me
                if o == 0:
                    hit &= wslot.astype(F) > my_slot[:, None]
                m = wslot - st[:, None]                # bit position
                hit &= m < MPB
                bits = jnp.where(hit, jnp.int32(1) << m, 0)
                acc = acc | bits.sum(axis=1).astype(jnp.int32)
            mask_ref[:, o] = acc

    return _sweep_kernel


def sweep_bitmask(rec, starts, ends, interpret=False, tile=None, win=None):
    """Run the kernel over all tiles.

    rec: (Spad, 8) packed sorted records with rec[:,7] = global slot index.
    starts/ends: (Spad, 14) i32 candidate windows (clamped so that
    start >= end means empty and end - start <= MPB).
    Returns (Spad, 14) i32 bitmasks.
    """
    tile = tile or TILE
    win = win or WIN
    spad = rec.shape[0]
    assert spad % tile == 0
    n_tiles = spad // tile
    grid = (n_tiles,)
    out = pl.pallas_call(
        _make_sweep_kernel(tile, win),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 14), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 14), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 8), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # rec stays in HBM
        ],
        out_specs=pl.BlockSpec((tile, 14), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((spad, 14), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((win, 8), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(starts, ends, rec, rec)
    return out


def find_pairs_ss_pallas(pos, reach, owner, family, family_mask, bin_size,
                         nb, cap, chunk_unused=0, interpret=False,
                         tile=None, win=None):
    """Drop-in replacement for binning.find_pairs_ss using the kernel.

    Family masking is applied in the XLA decode stage (the kernel tests
    geometry + ownership only). max_per_bin is fixed at MPB (16).
    """
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
    starts = jnp.searchsorted(tab.sorted_bin, tgt).astype(I)
    ends = jnp.searchsorted(tab.sorted_bin, tgt, side="right").astype(I)
    ends = jnp.minimum(ends, starts + MPB)

    # window-overflow guard: every candidate must live inside the tile slab
    tile_base = starts.reshape(-1, tile, 14)[:, 0:1, :]
    win_ovf = jnp.any(
        (ends.reshape(-1, tile, 14) - tile_base) > win
    )

    # slot index rides the spare record column (exact in f32 < 2^24)
    k = jnp.arange(spad, dtype=F)
    rec = tab.rec.at[:, 7].set(k) if tab.rec.shape[1] > 7 else (
        jnp.concatenate([tab.rec, k[:, None]], axis=1)
    )

    mask = sweep_bitmask(rec, starts, ends, interpret=interpret,
                         tile=tile, win=win)

    # decode + compact (same shape as the gather sweep's output stage)
    m = jnp.arange(MPB, dtype=I)
    hit = ((mask[..., None] >> m) & 1).astype(bool)      # (Spad,14,MPB)
    slots = jnp.minimum(starts[..., None] + m, spad - 1)
    fam_flat = family_mask.reshape(-1)
    my_fam = tab.rec[:, 5].astype(I)
    cand_fam = tab.rec[:, 5].astype(I)[slots]
    hit &= fam_flat[my_fam[:, None, None] * 256 + cand_fam]
    hit &= (tab.order < S)[:, None, None]  # mask padding rows
    my_id = tab.order
    cand_id = tab.order[slots]
    a = jnp.broadcast_to(my_id[:, None, None], hit.shape)
    lo = jnp.minimum(a, cand_id).reshape(-1)
    hi = jnp.maximum(a, cand_id).reshape(-1)
    outA = jnp.full((cap,), -1, I)
    outB = jnp.full((cap,), -1, I)
    (outA, outB), total = binning._compact(
        hit.reshape(-1), (lo, hi), cap, jnp.zeros((), I), (outA, outB)
    )
    return outA, outB, total, tab.max_occ, tab, win_ovf
