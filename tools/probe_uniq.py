"""A/B the unique-other fetch vs the direct merged gather at 262k.

Times, inside one jit each (scan of 10 reps, checksum-chained):
  1. merged direct gather (2*cap rows)     -- the round-3 baseline
  2. merged unique gather (2*NB*UB rows)
  3. pass A direct (streamed ot records)
  4. pass A uniq   (uidx stream + in-kernel one-hot expansion)
"""
import argparse
import dataclasses
import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from dem_engine_tpu.utils import compile_cache

compile_cache.enable()

from dem_engine_tpu.defines import F, I
from dem_engine_tpu.ops import forces
from dem_engine_tpu.ops import pallas_force as pf
from dem_engine_tpu.ops.pallas_segred import owner_block_ranges
from dem_engine_tpu.solver import Engine
from tools.check_fused_tpu import build


def timed(name, fn, x0, *consts, reps=10):
    def loop(x, *cs):
        y, _ = jax.lax.scan(lambda c, _: (fn(c, *cs), None), x, length=reps)
        return y

    g = jax.jit(loop)
    y = g(x0, *consts)
    # force completion via scalar readback (block_until_ready no-ops here)
    s = sum(float(l.sum()) for l in jax.tree_util.tree_leaves(y)
            if l.dtype == jnp.float32)
    t0 = time.perf_counter()
    y = g(x0, *consts)
    s = sum(float(l.sum()) for l in jax.tree_util.tree_leaves(y)
            if l.dtype == jnp.float32)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {dt:.2f} ms  (chk {s:.3e})", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--uniq", type=int, default=1024)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    state, params, cfg = build(args.n)
    cfg = dataclasses.replace(cfg, use_fused_force=True,
                              uniq_cap=args.uniq)
    # route through the engine so OVF_UNIQ growth applies
    from dem_engine_tpu.state import ContactTable
    from dem_engine_tpu.ops.forces import premix_names

    nb0 = -(-state.owners.n // pf.OB)
    state = state.replace(ss=ContactTable.empty(
        cfg.cap_ss, cfg.force_model.contact_wildcards,
        premix_names(cfg.force_model), fused=True, slim=True,
        uniq_rows=nb0 * cfg.uniq_cap))
    eng = Engine(cfg)
    state = eng.refresh(state, params)
    cfg = eng.cfg
    table, owners = state.ss, state.owners
    N, cap = owners.n, table.cap
    print(f"contacts={int(table.count)} cap={cap} uniq_cap={cfg.uniq_cap} "
          f"uniq_max={int(table.uniq_max)}", flush=True)

    live = table.idA >= 0
    krec0 = forces.pack_kinematics(owners)
    own_b = jnp.where(live, table.own_b, 0)
    both_idx = jnp.concatenate([own_b, table.own_a_b])
    nu = table.uniq_a.shape[0]
    uniq_idx = jnp.minimum(
        jnp.concatenate([table.uniq_a, table.uniq_b]), N - 1)

    timed("merged direct gather (2cap rows)",
          lambda k: forces.gather_rows(k, both_idx).sum() * 1e-30 + k,
          krec0)
    timed(f"merged uniq gather ({2 * nu} rows)",
          lambda k: forces.gather_rows(k, uniq_idx).sum() * 1e-30 + k,
          krec0)

    ids_a = jnp.where(table.own_a >= 0, table.own_a, N)
    cr_a, n_blocks = owner_block_ranges(ids_a, N, pf.OB)
    npad = n_blocks * pf.OB
    krecT0 = jnp.concatenate([krec0, jnp.zeros((npad - N, 16), F)], axis=0)
    wc_names = sorted(table.wildcards)
    wrows = [table.wildcards[n] for n in wc_names]
    wrows += [jnp.zeros((cap,), F)] * (4 - len(wrows))
    wcT = jnp.stack(wrows, axis=0)
    h = params.h
    btT0 = forces.gather_rows(krec0, own_b).T
    uT0 = table.uidx.reshape(1, cap)
    uslab0 = forces.gather_rows(krec0, jnp.minimum(table.uniq_a, N - 1))

    interp = jax.default_backend() == "cpu"

    def pass_direct(btT, fstat, wct, krecT, cr):
        accT, wc_outT = pf.fused_hertz_pass(
            fstat, wct, krecT, btT, cr, n_blocks, h, cfg.voxel_size,
            True, side_b=False, interpret=interp)
        return btT * 1.000001 + accT.sum() * 1e-30 + wc_outT.sum() * 1e-30

    def pass_uniq(uslab, fstat, wct, krecT, uT, cr):
        accT, wc_outT = pf.fused_hertz_pass(
            fstat, wct, krecT, uT, cr, n_blocks, h, cfg.voxel_size,
            True, side_b=False, uslab=uslab, ub=cfg.uniq_cap,
            interpret=interp)
        return (uslab * 1.000001 + accT.sum() * 1e-30
                + wc_outT.sum() * 1e-30)

    timed("pass A direct", pass_direct, btT0, table.fstat_a, wcT, krecT0,
          cr_a)
    timed("pass A uniq", pass_uniq, uslab0, table.fstat_a, wcT, krecT0,
          uT0, cr_a)


if __name__ == "__main__":
    main()
