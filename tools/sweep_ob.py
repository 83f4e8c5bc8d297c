"""Sweep OB (owners per grid block) for the fused pass at 262k."""
import argparse, time
import jax, jax.numpy as jnp
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
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), y)
    t0 = time.perf_counter()
    y = g(x0, *consts)
    s = sum(float(l.sum()) for l in jax.tree_util.tree_leaves(y)
            if l.dtype != jnp.int32)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {dt:.2f} ms  (chk {s:.3e})", flush=True)
    return dt

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--obs", type=str, default="512,256,128")
    args = ap.parse_args()
    state, params, cfg = build(args.n)
    state = jax.jit(lambda s, p: refresh_contacts(s, p, cfg))(state, params)
    print("contacts:", int(state.ss.count), "cap:", state.ss.cap)
    table, owners = state.ss, state.owners
    N, cap = owners.n, table.cap
    live = table.idA >= 0
    h = params.h
    wc_names = sorted(table.wildcards)
    wrows = [table.wildcards[n] for n in wc_names]
    wrows += [jnp.zeros((cap,), F)] * (4 - len(wrows))
    wcT = jnp.stack(wrows, axis=0)
    ids_a = jnp.where(table.own_a >= 0, table.own_a, N)
    krec0 = forces.pack_kinematics(owners)
    own_b0 = jnp.where(live, table.own_b, 0)
    btT0 = forces.gather_rows(krec0, own_b0).T

    for ob in [int(x) for x in args.obs.split(",")]:
        cr_a, n_blocks = owner_block_ranges(ids_a, N, ob)
        npad = n_blocks * ob
        krecT0 = jnp.concatenate(
            [krec0, jnp.zeros((npad - N, 16), F)], axis=0)

        def pass_a(btT, fstat, wct, krecT, cr, nb=n_blocks, ob=ob):
            accT, wc_outT = pf.fused_hertz_pass(
                fstat, wct, krecT, btT, cr, nb,
                h, cfg.voxel_size, True, side_b=False, ob=ob)
            return (btT * 1.000001 + accT.sum() * 1e-30
                    + wc_outT.sum() * 1e-30)

        timed(f"pass A ob={ob}", pass_a, btT0, table.fstat_a, wcT,
              krecT0, cr_a)

if __name__ == "__main__":
    main()
