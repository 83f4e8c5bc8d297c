"""Component timing of the dual-pass fused step at scale: the two
other-side gathers, each kernel pass, and the whole step, each inside a
lax.scan of reps (dispatch floor is ~15-22 ms, so single-shot timings are
noise)."""

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
from dem_engine_tpu.ops.pallas_force import (
    fused_hertz_pass, fused_step_ss, CH, OB)
from dem_engine_tpu.ops.pallas_segred import owner_block_ranges
from dem_engine_tpu.solver import refresh_contacts
from tools.check_fused_tpu import build


def timed(name, fn, x0, *consts, reps=10):
    """fn(carry, *consts) -> carry. Big operands ride as jit ARGUMENTS —
    closed-over arrays become serialized constants and blow the remote
    compile relay's request-size limit at 262k+."""
    def loop(x, *cs):
        y, _ = jax.lax.scan(
            lambda c, _: (fn(c, *cs), None), x, length=reps)
        return y

    g = jax.jit(loop)
    y = g(x0, *consts)  # compile + run
    # WARMUP SYNC: block_until_ready silently no-ops on this backend; a
    # scalar readback is the only reliable completion barrier (CLAUDE.md).
    # Prefer a float leaf; fall back to an integer leaf (int(sum()) is a
    # completion barrier too) so integer-only outputs still sync.
    leaves = jax.tree_util.tree_leaves(y)
    sync = next((l for l in leaves if l.dtype != jnp.int32), None)
    if sync is not None:
        float(sync.sum())
    elif leaves:
        int(leaves[0].sum())
    else:
        raise AssertionError("no output leaf to sync the warmup on")
    t0 = time.perf_counter()
    y = g(x0, *consts)
    s = 0.0
    for leaf in jax.tree_util.tree_leaves(y):
        s += float(leaf.sum()) if leaf.dtype != jnp.int32 else 0.0
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {dt:.2f} ms  (chk {s:.3e})", flush=True)
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

    def bgather(krec, ownb):
        btT = forces.gather_rows(krec, ownb).T
        return krec * 1.000001 + btT.sum() * 1e-30

    krec0 = forces.pack_kinematics(owners)
    own_b0 = jnp.where(live, table.own_b, 0)
    timed("B-gather+T (cap,16)", bgather, krec0, own_b0)
    timed("A-gather+T (B-pass)", bgather, krec0, table.own_a_b)

    # pass A alone (fixed inputs except chained btT)
    wc_names = sorted(table.wildcards)
    wrows = [table.wildcards[n] for n in wc_names]
    wrows += [jnp.zeros((cap,), F)] * (4 - len(wrows))
    wcT = jnp.stack(wrows, axis=0)
    ids_a = jnp.where(table.own_a >= 0, table.own_a, N)
    cr_a, n_blocks = owner_block_ranges(ids_a, N, OB)
    npad = n_blocks * OB
    krecT0 = jnp.concatenate(
        [krec0, jnp.zeros((npad - N, 16), F)], axis=0)
    btT0 = forces.gather_rows(krec0, own_b0).T

    def pass_a(btT, fstat, wct, krecT, cr):
        accT, wc_outT = fused_hertz_pass(
            fstat, wct, krecT, btT, cr, n_blocks,
            h, cfg.voxel_size, True, side_b=False)
        return btT * 1.000001 + accT.sum() * 1e-30 + wc_outT.sum() * 1e-30

    timed("kernel pass A", pass_a, btT0, table.fstat_a, wcT, krecT0, cr_a)

    ids_b = jnp.minimum(table.own_b_sorted, N)
    cr_b, _ = owner_block_ranges(ids_b, N, OB)
    atT0 = forces.gather_rows(krec0, table.own_a_b).T

    def pass_b(atT, fstat, wct, krecT, cr):
        accT, wc_outT = fused_hertz_pass(
            fstat, wct, krecT, atT, cr, n_blocks,
            h, cfg.voxel_size, True, side_b=True)
        return atT * 1.000001 + accT.sum() * 1e-30 + wc_outT.sum() * 1e-30

    timed("kernel pass B", pass_b, atT0, table.fstat_b, table.wcb[:4],
          krecT0, cr_b)

    def whole(krec, tbl, own):
        f_acc, t_acc, _ = fused_step_ss(
            tbl, own, params, cfg.voxel_size, cfg.force_model, krec)
        return krec * 1.000001 + f_acc.sum() * 1e-30

    timed("whole fused_step_ss", whole, krec0, table, owners)

    from dem_engine_tpu.solver import dynamics_step

    def step(st, pp):
        return dynamics_step(st, pp, cfg)

    timed("whole dynamics_step", step, state, params)


if __name__ == "__main__":
    main()
