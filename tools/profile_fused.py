"""Component timing of the fused step at scale: B-gather, permute,
kernel F, segred-B, each inside a lax.scan of reps (dispatch floor is
~15-22 ms, so single-shot timings are noise)."""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dem_engine_tpu.utils import compile_cache
compile_cache.enable()

from dem_engine_tpu.defines import F, I
from dem_engine_tpu.ops import forces
from dem_engine_tpu.ops.pallas_force import fused_hertz_ss, fused_step_ss, CH, OB
from dem_engine_tpu.ops.pallas_segred import (
    owner_block_ranges, seg_sum_sorted_blocks)
from dem_engine_tpu.solver import refresh_contacts
from tools.check_fused_tpu import build


def timed(name, fn, *args, reps=10):
    def loop(x):
        y, _ = jax.lax.scan(lambda c, _: (fn(c), None), x, length=reps)
        return y

    g = jax.jit(loop)
    y = g(*args)  # compile + run
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), y)
    t0 = time.perf_counter()
    y = g(*args)
    s = 0.0
    for leaf in jax.tree_util.tree_leaves(y):
        s += float(leaf.sum()) if leaf.dtype != jnp.int32 else 0.0
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {dt:.2f} ms  (chk {s:.3e})")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    args = ap.parse_args()
    state, params, cfg = build(args.n)
    state = jax.jit(lambda s, p: refresh_contacts(s, p, cfg))(state, params)
    print("contacts:", int(state.ss.count), "cap:", state.ss.cap,
          "owners:", state.owners.n)

    table = state.ss
    owners = state.owners
    N = owners.n
    cap = table.cap
    live = table.idA >= 0
    h = params.h

    def bgather(krec):
        own_b = jnp.where(table.idA >= 0, table.own_b, 0)
        bt = forces.gather_rows(krec, own_b)
        return krec * 1.000001 + bt.sum() * 1e-30

    krec0 = forces.pack_kinematics(owners)
    timed("B-gather (cap,16)", bgather, krec0)

    def bgather_T(krec):
        own_b = jnp.where(table.idA >= 0, table.own_b, 0)
        btT = forces.gather_rows(krec, own_b).T
        return krec * 1.000001 + btT.sum() * 1e-30

    timed("B-gather + transpose", bgather_T, krec0)

    def permute(rec):
        return rec[table.perm_b] * 1.000001

    rec0 = jnp.ones((cap, 8), F)
    timed("rec_b permute (cap,8)", permute, rec0)

    def permute_i16(rec):
        return forces.gather_rows(rec, table.perm_b) * 1.000001

    timed("rec_b permute i16-bitcast", permute_i16, rec0)

    def permute_sortkey(rec):
        ops = jax.lax.sort(
            (jnp.where(table.idA >= 0, table.own_b, 2**30),)
            + tuple(rec[:, i] for i in range(6)), num_keys=1)
        return rec * 1.000001 + sum(o.sum() for o in ops[1:]) * 1e-30

    timed("rec_b sort-by-ownb (6 payload)", permute_sortkey, rec0)

    def segb(rec):
        out = seg_sum_sorted_blocks(rec[:, :6], table.own_b_sorted, N)
        return rec * 1.000001 + out.sum() * 1e-30

    timed("segred-B blocks", segb, rec0)

    # kernel F alone (fixed inputs except krecT chained)
    pn = forces.premix_names(cfg.force_model)
    prows = [table.premix[n] for n in pn] + [jnp.zeros((cap,), F)]
    premixT = jnp.stack(prows, axis=0)
    wc_names = sorted(table.wildcards)
    wrows = [table.wildcards[n] for n in wc_names]
    wrows += [jnp.zeros((cap,), F)] * (8 - len(wrows))
    wcT = jnp.stack(wrows, axis=0)
    ids_a = jnp.where(table.own_a >= 0, table.own_a, N)
    cr, n_blocks = owner_block_ranges(ids_a, N, OB)
    npad = n_blocks * OB
    krecT0 = jnp.concatenate(
        [krec0, jnp.zeros((npad - N, 16), F)], axis=0).T
    own_b = jnp.where(live, table.own_b, 0)
    btT0 = forces.gather_rows(krec0, own_b).T

    def kern_f(btT):
        accT, wc_outT, rec_bT = fused_hertz_ss(
            table.statics, premixT, wcT, krecT0, btT, cr, n_blocks,
            h, cfg.voxel_size, True)
        return btT * 1.000001 + accT.sum() * 1e-30 + rec_bT.sum() * 1e-30

    timed("kernel F (fused force+A-reduce)", kern_f, btT0)

    def whole(krec):
        f_acc, t_acc, tbl = fused_step_ss(
            table, owners, params, cfg.voxel_size, cfg.force_model, krec)
        return krec * 1.000001 + f_acc.sum() * 1e-30

    timed("whole fused_step_ss", whole, krec0)


if __name__ == "__main__":
    main()
