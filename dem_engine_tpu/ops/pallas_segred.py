"""Pallas sorted segment-sum: one-hot matmuls on the MXU.

XLA's `segment_sum` (even with sorted indices) lowers to a scatter that
measured ~35 ms per 3.1M x 6 reduction on v5e — it is the hot half of the
per-step wrench reduction. This kernel reformulates the reduction as a
sequence of per-tile one-hot matmuls accumulated into a VMEM-resident
output: contacts are sorted by owner, so each TILE of rows touches a
narrow, monotonically advancing owner window.

    out[8, o] += sum_j rec[8, j] * (ids[j] == o)
              == rec_tile (8, TILE) @ one_hot (TILE, OWIN)

The full (8, N_pad) accumulator lives in VMEM (same output block for
every grid step => Pallas keeps it resident), so this path is gated on
n_owners <~ 350k; larger runs fall back to XLA segment_sum.

Parity: DEMCubForceCollection.cu:19-170 (sort + reduce-by-key).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..defines import F, I

TILE = 512
OWIN = 256

#: accumulator rows above this owner count exceed a safe VMEM budget
MAX_OWNERS = 350_000


def _make_kernel(tile, owin, n_pad, n_owners):
    def kernel(rec_ref, out_ref, flag_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
            flag_ref[...] = jnp.zeros_like(flag_ref)

        rv = rec_ref[...]                       # (8, tile): rows 0..5 rec,
        ids = rv[6:7, :].astype(jnp.int32)      # row 6 = sorted owner ids
        live = ids < n_owners                   # dead/pad rows: id == N
        b0 = jnp.min(jnp.where(live, ids, n_owners))
        b0 = jnp.minimum((b0 // 128) * 128, n_pad - owin)
        b0 = pl.multiple_of(b0, 128)  # annotate after the clamp
        rel = ids - b0                          # (1, tile)
        spill = jnp.any(live & (rel >= owin))
        # Mosaic rejects scalar VMEM stores: broadcast the flag
        flag_ref[...] = flag_ref[...] | (
            spill.astype(jnp.int32) * jnp.ones((1, 128), jnp.int32)
        )
        ok = live & (rel >= 0) & (rel < owin)
        relc = jnp.clip(rel, 0, owin - 1)
        # one-hot built directly in (owin, tile) orientation — Mosaic
        # cannot legalize (1, tile) transposes
        oh = (jax.lax.broadcasted_iota(jnp.int32, (owin, tile), 0)
              == relc).astype(F)                 # (owin, tile)
        oh = oh * ok.astype(F)
        partial = jax.lax.dot_general(
            rv, oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                        # (8, owin)
        cur = out_ref[:, pl.ds(b0, owin)]
        out_ref[:, pl.ds(b0, owin)] = cur + partial

    return kernel


# ---------------------------------------------------------------------------
# v2: owner-block grid — NO owner-count limit, NO spill condition.
#
# The grid iterates over blocks of OB owners; each block's contact range
# [cstart, cend) in the sorted table is precomputed on the XLA side with one
# searchsorted (the table is sorted by owner id, so ranges partition the
# rows). The kernel walks that range in CH-wide chunks DMA'd from HBM and
# accumulates one-hot MXU matmuls into an (8, OB) VMEM accumulator that is
# its own output block. Chunks shared between adjacent owner blocks are
# visited twice with complementary masks (rel in [0, OB)), so no
# synchronization or window assumption is needed — this removes the v1
# MAX_OWNERS VMEM gate entirely (reference analogue without a size limit:
# DEMCubForceCollection.cu:19-170).
# ---------------------------------------------------------------------------

CHB = 512   # contact chunk width
OBL = 512   # owners per block


def owner_block_ranges(ids_sorted, n_owners, ob=None):
    """Per-owner-block [cstart, cend) ranges in the sorted table, flattened
    to a 1-D i32 scalar-prefetch array (2-D SMEM arrays lane-pad to 128)."""
    ob = ob or OBL
    n_blocks = -(-n_owners // ob)
    q = jnp.minimum(
        jnp.arange(n_blocks + 1, dtype=I) * ob, jnp.int32(n_owners)
    )
    bounds = jnp.searchsorted(ids_sorted, q).astype(I)
    return (
        jnp.stack([bounds[:-1], bounds[1:]], axis=1).reshape(-1),
        n_blocks,
    )


def _make_block_kernel(ch, ob, n_owners):
    def kernel(cr_ref, recT_hbm, out_ref, slab_ref, sem):
        i = pl.program_id(0)
        c0 = cr_ref[2 * i] // ch
        c1 = (cr_ref[2 * i + 1] + ch - 1) // ch
        block_lo = i * ob
        out_ref[...] = jnp.zeros_like(out_ref)

        def body(c, acc):
            off = pl.multiple_of(c * ch, ch)
            dma = pltpu.make_async_copy(
                recT_hbm.at[:, pl.ds(off, ch)], slab_ref, sem
            )
            dma.start()
            dma.wait()
            rv = slab_ref[...]                       # (8, ch)
            ids = rv[6:7, :].astype(jnp.int32)
            rel = ids - block_lo
            ok = (ids < n_owners) & (rel >= 0) & (rel < ob)
            oh = (jax.lax.broadcasted_iota(jnp.int32, (ob, ch), 0)
                  == rel).astype(F) * ok.astype(F)   # (ob, ch)
            return acc + jax.lax.dot_general(
                rv, oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        out_ref[...] = jax.lax.fori_loop(
            c0, c1, body, jnp.zeros((8, ob), F)
        )

    return kernel


def seg_sum_sorted_blocks(rec6, ids_sorted, n_owners, interpret=None,
                          ch=None, ob=None):
    """Owner-block sorted segment sum: rec6 (cap, 6) f32, ids_sorted (cap,)
    ascending i32 with dead rows >= n_owners. Returns (n_owners, 6) f32.
    Unlike seg_sum_sorted there is no owner-count gate and no spill."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    ch = ch or CHB
    ob = ob or OBL
    cap = rec6.shape[0]
    pad = (-cap) % ch
    if pad:
        rec6 = jnp.concatenate([rec6, jnp.zeros((pad, 6), F)], axis=0)
        ids_sorted = jnp.concatenate(
            [ids_sorted, jnp.full((pad,), n_owners, I)], axis=0)
    capp = cap + pad
    ids_c = jnp.minimum(ids_sorted, n_owners)
    recT = jnp.concatenate(
        [rec6.T, ids_c.astype(F)[None, :], jnp.zeros((1, capp), F)],
        axis=0,
    )                                                # (8, capp)
    cr, n_blocks = owner_block_ranges(ids_c, n_owners, ob)
    out = pl.pallas_call(
        _make_block_kernel(ch, ob, int(n_owners)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((8, ob), lambda i, c: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((8, ch), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((8, n_blocks * ob), F),
        interpret=interpret,
    )(cr, recT)
    return out[:6, :n_owners].T


def seg_sum_sorted(rec6, ids_sorted, n_owners, interpret=False,
                   tile=None, owin=None):
    """rec6: (cap, 6) f32; ids_sorted: (cap,) i32 ascending, dead rows
    mapped to >= n_owners. Returns ((n_owners, 6) f32, spill flag). On a
    spill (a tile spanning > OWIN-128 owners — very sparse tables) the
    result is invalid and the caller must use the XLA fallback."""
    tile = tile or TILE
    owin = owin or OWIN
    cap = rec6.shape[0]
    pad = (-cap) % tile
    if pad:
        rec6 = jnp.concatenate([rec6, jnp.zeros((pad, 6), F)], axis=0)
        ids_sorted = jnp.concatenate(
            [ids_sorted, jnp.full((pad,), n_owners, I)], axis=0)
    capp = cap + pad
    # dead/pad ids collapse to n_owners (row sliced off afterwards)
    ids_c = jnp.minimum(ids_sorted, n_owners)
    recT = jnp.concatenate(
        [rec6.T, ids_c.astype(F)[None, :], jnp.zeros((1, capp), F)],
        axis=0,
    )                                            # (8, capp)
    n_pad = ((n_owners + 1 + owin + 127) // 128) * 128
    out, flags = pl.pallas_call(
        _make_kernel(tile, owin, n_pad, int(n_owners)),
        grid=(capp // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, n_pad), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, n_pad), F),
            jax.ShapeDtypeStruct((1, 128), jnp.int32),
        ),
        interpret=interpret,
    )(recT)
    return out[:6, :n_owners].T, flags[0, 0] != 0
