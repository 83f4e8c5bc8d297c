"""Isolate the pass-A vs pass-B timing asymmetry: run each side's kernel
code on each side's data layout, twice, in one process."""
import time
import jax
import jax.numpy as jnp
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dem_engine_tpu.utils import compile_cache
compile_cache.enable()
from dem_engine_tpu.defines import F, I
from dem_engine_tpu.ops import forces
from dem_engine_tpu.ops import pallas_force as pf
from dem_engine_tpu.ops.pallas_segred import owner_block_ranges
from dem_engine_tpu.solver import refresh_contacts
from tools.check_fused_tpu import build


def timed(name, fn, x0, *consts, reps=10):
    def loop(x, *cs):
        y, _ = jax.lax.scan(lambda c, _: (fn(c, *cs), None), x, length=reps)
        return y
    g = jax.jit(loop)
    y = g(x0, *consts)
    # force completion with a scalar readback (block_until_ready is
    # unreliable on this backend)
    float(jax.tree_util.tree_leaves(y)[0].sum())
    t0 = time.perf_counter()
    y = g(x0, *consts)
    s = sum(float(l.sum()) for l in jax.tree_util.tree_leaves(y)
            if l.dtype != jnp.int32)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {dt:.2f} ms  (chk {s:.3e})", flush=True)
    return dt


def main():
    state, params, cfg = build(262144)
    state = jax.jit(lambda s, p: refresh_contacts(s, p, cfg))(state, params)
    print("contacts:", int(state.ss.count), "cap:", state.ss.cap, flush=True)
    table, owners = state.ss, state.owners
    N, cap = owners.n, table.cap
    live = table.idA >= 0
    h = params.h
    wc_names = sorted(table.wildcards)
    wrows = [table.wildcards[n] for n in wc_names]
    wrows += [jnp.zeros((cap,), F)] * (4 - len(wrows))
    wcA = jnp.stack(wrows, axis=0)
    wcB = table.wcb[:4]
    ids_a = jnp.where(table.own_a >= 0, table.own_a, N)
    ids_b = jnp.minimum(table.own_b_sorted, N)
    cr_a, n_blocks = owner_block_ranges(ids_a, N, pf.OB)
    cr_b, _ = owner_block_ranges(ids_b, N, pf.OB)
    krec0 = forces.pack_kinematics(owners)
    npad = n_blocks * pf.OB
    krecT0 = jnp.concatenate(
        [krec0, jnp.zeros((npad - N, 16), F)], axis=0)
    own_b0 = jnp.where(live, table.own_b, 0)
    btT0 = forces.gather_rows(krec0, own_b0).T
    atT0 = forces.gather_rows(krec0, table.own_a_b).T

    def mk(side_b):
        def run(ot, fstat, wct, krecT, cr):
            accT, wc_outT = pf.fused_hertz_pass(
                fstat, wct, krecT, ot, cr, n_blocks,
                h, cfg.voxel_size, True, side_b=side_b)
            return (ot * 1.000001 + accT.sum() * 1e-30
                    + wc_outT.sum() * 1e-30)
        return run

    runA, runB = mk(False), mk(True)
    timed("codeA dataA #1", runA, btT0, table.fstat_a, wcA, krecT0, cr_a)
    timed("codeB dataB #1", runB, atT0, table.fstat_b, wcB, krecT0, cr_b)
    timed("codeA dataB   ", runA, atT0, table.fstat_b, wcB, krecT0, cr_b)
    timed("codeB dataA   ", runB, btT0, table.fstat_a, wcA, krecT0, cr_a)
    timed("codeA dataA #2", runA, btT0, table.fstat_a, wcA, krecT0, cr_a)
    timed("codeB dataB #2", runB, atT0, table.fstat_b, wcB, krecT0, cr_b)


if __name__ == "__main__":
    main()
