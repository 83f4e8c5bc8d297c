"""Spatially-decomposed sphere-sphere contact detection over a device mesh.

This is the multi-chip scaling level the reference cannot express (its kT
is a single-GPU pipeline stage, kT.cpp:193-216): the domain is partitioned
into D x-slabs, one per device. Inside one `shard_map`:

  1. **bucket exchange**: each device bins its (index-sharded, spatially
     arbitrary) spheres by destination slab — including halo membership,
     an interval overlap of 2 bin widths around each slab — compacts them
     into fixed-capacity buckets and `all_to_all`s them, so every device
     ends up holding its residents plus a halo of neighbors' boundary
     spheres;
  2. **shard-local CD**: the usual sorted-bin half-shell sweep
     (ops/binning.py) runs on the local (resident + halo) set against the
     GLOBAL bin grid, so flat bin ids and pair semantics are unchanged;
  3. **exactly-once emission**: a pair is emitted only where its ROW
     sphere is resident; for same-bin pairs where the candidate is a halo
     copy, global-id ordering decides the owning device. Forward-shell
     pairs are inherently unique (the lower-bin sphere owns them).

The result is a contact table sharded over the mesh whose per-device CD
work is O(S/D) — sort, sweep and compaction all local; the only
communication is the O(S/D) bucket all_to_all and scalar psums.

Correctness invariant: the emitted pair SET equals the global sweep's
(tests/test_spatial_refresh.py asserts set equality on an 8-device mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..defines import F, I
from ..ops import binning

_INVALID_REACH = -1e30


def _slab_of(px, slab_w, n_dev):
    return jnp.clip(jnp.floor(px / slab_w).astype(I), 0, n_dev - 1)


def _local_sweep(rec, resident, fam_mask_flat, bin_size, nb, cap_loc,
                 max_per_bin):
    """Half-shell sweep over the local (resident + halo) sphere set.

    rec: (L, 8) rows [pos3, reach, owner, family, gid, resident]; invalid
    rows have reach = -1e30. Emission rules (see module docstring) make
    each global pair appear on exactly one device.
    """
    L = rec.shape[0]
    pos = rec[:, 0:3]
    reach = rec[:, 3]
    valid = reach > _INVALID_REACH * 0.5

    idx3 = binning.bin_index_3d(pos, bin_size, nb)
    binid = jnp.where(valid, binning.flat_bin(idx3, nb),
                      binning._SENTINEL_BIN)
    order = jnp.arange(L, dtype=I)
    sorted_bin, perm = jax.lax.sort((binid, order), num_keys=1)
    srec = rec[perm]
    sres = resident[perm] & valid[perm]
    sidx3 = idx3[perm]

    # occupancy (complete for every bin that has a local resident)
    k = jnp.arange(L, dtype=I)
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_bin[1:] != sorted_bin[:-1]])
    run_start = jax.lax.cummax(jnp.where(boundary, k, 0))
    occ = jnp.where(sorted_bin != binning._SENTINEL_BIN, k - run_start + 1,
                    0)
    max_occ = occ.max() if L else jnp.zeros((), I)

    offs = jnp.asarray(binning._HALF_SHELL)          # (14, 3)
    mpb = max_per_bin

    my_pos = srec[:, 0:3]
    my_reach = srec[:, 3]
    my_own = srec[:, 4]
    my_fam = srec[:, 5].astype(I)
    my_id = srec[:, 6].astype(I)
    row_ok = sres & (my_reach > _INVALID_REACH * 0.5)

    tgt3 = sidx3[:, None, :] + offs[None, :, :]      # (L, 14, 3)
    ok3 = jnp.all((tgt3 >= 0) & (tgt3 < nb[None, None, :]), axis=-1)
    tgt = jnp.where(ok3, binning.flat_bin(tgt3, nb), -2)

    starts = jnp.searchsorted(sorted_bin, tgt)
    ends = jnp.searchsorted(sorted_bin, tgt, side="right")
    slots = starts[..., None] + jnp.arange(mpb, dtype=I)   # (L, 14, mpb)
    slots_c = jnp.minimum(slots, L - 1)
    in_run = (slots < ends[..., None]) & (slots < L)

    crec = srec[slots_c]
    cres = sres[slots_c]
    cpos = crec[..., 0:3]
    cre = crec[..., 3]
    cown = crec[..., 4]
    cfam = crec[..., 5].astype(I)
    cid = crec[..., 6].astype(I)

    same_bin = (jnp.arange(14) == 0)[None, :, None]
    # same-bin dedup: resident candidates by slot order (each unordered
    # local pair once); halo candidates by global-id order (the device
    # holding the LOWER id as resident owns the pair)
    own_rule = jnp.where(
        cres, slots > k[:, None, None],
        cid > my_id[:, None, None],
    )
    sel = jnp.where(same_bin, own_rule, True)

    d = my_pos[:, None, None, :] - cpos
    d2 = jnp.sum(d * d, axis=-1)
    rr = my_reach[:, None, None] + cre
    hit = in_run & sel & (d2 < rr * rr)
    hit &= cre > _INVALID_REACH * 0.5
    hit &= cown != my_own[:, None, None]
    hit &= row_ok[:, None, None]
    hit &= fam_mask_flat[my_fam[:, None, None] * 256 + cfam]

    a = jnp.broadcast_to(my_id[:, None, None], hit.shape)
    lo = jnp.minimum(a, cid).reshape(-1)
    hi = jnp.maximum(a, cid).reshape(-1)
    outA = jnp.full((cap_loc,), -1, I)
    outB = jnp.full((cap_loc,), -1, I)
    (outA, outB), total = binning._compact(
        hit.reshape(-1), (lo, hi), cap_loc, jnp.zeros((), I),
        (outA, outB),
    )
    return outA, outB, total, max_occ


def find_pairs_ss_spatial(pos, reach, owner, family, family_mask, bin_size,
                          nb, domain, cap, max_per_bin, mesh: Mesh,
                          capx: int, axis: str = "shard"):
    """Spatially-decomposed find_pairs_ss over `mesh`.

    pos/reach/owner/family are the GLOBAL sphere arrays (index-sharded or
    replicated — shard_map partitions them); returns (idA, idB, count,
    max_occ, bucket_ovf) where idA/idB are (cap,) sharded over the mesh
    with each device's live pairs compacted to the front of its shard.
    """
    n_dev = mesh.devices.size
    S = pos.shape[0]
    assert S % n_dev == 0 and cap % n_dev == 0
    cap_loc = cap // n_dev
    fam_mask_flat = family_mask.reshape(-1)
    gids = jnp.arange(S, dtype=I)

    def local_fn(pos_l, reach_l, owner_l, family_l, gid_l, bs, nb_l, dom):
        d = jax.lax.axis_index(axis)
        slab_w = dom[0] / n_dev
        hw = 2.0 * bs  # halo: candidate cells span row_bin +- 1
        px = pos_l[:, 0]
        # clamp into the domain for bucket membership: escaped spheres
        # (|px| beyond the halo) must still be resident SOMEWHERE — the
        # global sweep clips them into edge bins (binning.bin_index_3d),
        # so route them to the edge slabs to keep pair-set equality
        px = jnp.clip(px, 0.0, dom[0])
        rows = jnp.concatenate(
            [
                pos_l,
                reach_l[:, None],
                owner_l.astype(F)[:, None],
                family_l.astype(F)[:, None],
                gid_l.astype(F)[:, None],
                jnp.zeros((pos_l.shape[0], 1), F),
            ],
            axis=1,
        )                                            # (S_loc, 8)
        invalid = jnp.zeros((1, 8), F).at[0, 3].set(_INVALID_REACH)
        invalid = invalid.at[0, 6].set(-1.0)

        bufs = []
        ovf = jnp.zeros((), bool)
        for t in range(n_dev):
            lo = t * slab_w - hw
            hi = (t + 1) * slab_w + hw
            m = (px >= lo) & (px < hi)
            csum = jnp.cumsum(m.astype(I))
            dst = jnp.where(m, csum - 1, capx)
            buf = jnp.tile(invalid, (capx + 1, 1))
            buf = buf.at[dst].set(rows, mode="drop", unique_indices=True)
            bufs.append(buf[:capx])
            ovf |= (csum[-1] if m.size else jnp.zeros((), I)) > capx
        send = jnp.stack(bufs, axis=0)               # (D, capx, 8)
        recv = jax.lax.all_to_all(send, axis, 0, 0, tiled=False)
        rec = recv.reshape(n_dev * capx, 8)
        rvalid = rec[:, 3] > _INVALID_REACH * 0.5
        resident = rvalid & (_slab_of(rec[:, 0], slab_w, n_dev) == d)

        outA, outB, total, occ = _local_sweep(
            rec, resident, fam_mask_flat, bs, nb_l, cap_loc, max_per_bin,
        )
        count = jax.lax.psum(total, axis)
        max_occ = jax.lax.pmax(occ, axis)
        ovf_ss = jax.lax.psum((total > cap_loc).astype(I), axis) > 0
        bucket_ovf = jax.lax.psum(ovf.astype(I), axis) > 0
        return outA, outB, count, max_occ, ovf_ss, bucket_ovf

    sharded = P(axis)
    repl = P()
    kw = dict(
        mesh=mesh,
        in_specs=(sharded, sharded, sharded, sharded, sharded,
                  repl, repl, repl),
        out_specs=(sharded, sharded, repl, repl, repl, repl),
    )
    try:
        fn = shard_map(local_fn, check_vma=False, **kw)
    except TypeError:
        fn = shard_map(local_fn, check_rep=False, **kw)
    idA, idB, count, max_occ, ovf_ss, bucket_ovf = fn(
        pos, reach, owner, family, gids, bin_size, nb, domain,
    )
    # a device-local capacity overflow means pairs were dropped: surface
    # it through the ordinary SS-capacity growth path by reporting a
    # count that exceeds cap
    count = jnp.where(ovf_ss, jnp.int32(cap + 1), count)
    return idA, idB, count, max_occ, bucket_ovf
