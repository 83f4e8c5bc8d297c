"""Component timing of refresh_contacts at the bench shape: the fused
run_chunks numbers imply ~950 ms per refresh at 262k/cap 3.15M (C2,
round 4) while round-2 notes put the raw CD sweep at ~194 ms — find the
other ~750 ms. Times, each in a scan of reps with chained inputs and a
scalar readback:
  1. full refresh_contacts
  2. CD only (find_pairs_ss_pallas3 incl. sphere table build)
  3. history carry (sort-merge at 2cap)
  4. finalize_table (sorts + layouts)
  5. fused-layout build alone (fstat/wcb gathers, approximated by its
     dominant gather_rows_T calls)
"""

import argparse
import time

import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dem_engine_tpu.utils import compile_cache
compile_cache.enable()

from dem_engine_tpu.defines import F, I
from dem_engine_tpu.ops import binning, forces, history
from dem_engine_tpu.ops.pallas_sweep3 import find_pairs_ss_pallas3
from dem_engine_tpu.solver import refresh_contacts, sphere_margins, \
    sphere_world_pos
from tools.check_fused_tpu import build


def timed(name, fn, x0, *consts, reps=5):
    def loop(x, *cs):
        y, _ = jax.lax.scan(
            lambda c, _: (fn(c, *cs), None), x, length=reps)
        return y

    g = jax.jit(loop)
    t0 = time.perf_counter()
    y = g(x0, *consts)
    leaves = jax.tree_util.tree_leaves(y)
    sync = next((l for l in leaves if l.dtype != jnp.int32), leaves[0])
    float(sync.sum())
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
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
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    state0, params, cfg = build(args.n)
    state = jax.jit(lambda s, p: refresh_contacts(s, p, cfg))(
        state0, params)
    print("contacts:", int(state.ss.count), "cap:", state.ss.cap, flush=True)
    only = set(args.only.split(",")) if args.only else None

    def want(k):
        return only is None or k in only

    owners, spheres = state.owners, state.spheres
    wc_names = cfg.force_model.contact_wildcards

    if want("refresh"):
        def rf(st, pp):
            return refresh_contacts(st, pp, cfg)

        timed("full refresh", rf, state, params)

    # shared precomputation mirrors of the refresh internals
    pos = sphere_world_pos(owners, spheres, cfg.voxel_size)
    margin, _, _ = sphere_margins(owners, spheres, params)
    reach = spheres.radius + margin
    bs, nb = binning.build_grid(params.domain, reach.max(),
                                params.bin_factor)
    fam = owners.family[spheres.owner]

    if want("cd"):
        def cd(p, rch):
            idA, idB, n, occ, tab, wovf = find_pairs_ss_pallas3(
                p, rch, spheres.owner, fam, params.family_mask, bs, nb,
                cfg.cap_ss, win=cfg.pallas_win, family_filter=False)
            return p * 1.0000001 + (idA.sum() + idB.sum()).astype(F) * 1e-30

        timed("CD sweep (pallas3)", cd, pos, reach)

    idA0, idB0, n0, occ0, tab0, _ = jax.jit(
        lambda p, rch: find_pairs_ss_pallas3(
            p, rch, spheres.owner, fam, params.family_mask, bs, nb,
            cfg.cap_ss, win=cfg.pallas_win, family_filter=False)
    )(pos, reach)

    if want("carry"):
        def carry(tbl, ia, ib):
            ss, lost = history.carry_history(
                tbl, ia, ib, jnp.minimum(n0, cfg.cap_ss), wc_names, False)
            k = sorted(ss.wildcards)[0]
            new_wc = dict(tbl.wildcards)
            new_wc[k] = tbl.wildcards[k] * 1.0000001 + (
                ss.wildcards[k].sum() * 1e-30)
            return tbl.replace(wildcards=new_wc)

        timed("history carry", carry, state.ss, idA0, idB0)

    if want("finalize"):
        def fin(tbl):
            out = forces.finalize_table(
                "ss", tbl, owners, spheres, state.tris, state.anals,
                params, cfg.force_model, slim=cfg.use_fused_force,
                uniq_cap=cfg.uniq_cap)
            return tbl.replace(
                force=tbl.force + out.fstat_a[1, :1] * 1e-30)

        timed("finalize_table", fin, state.ss)

    if want("layouts"):
        krec = forces.pack_kinematics(owners)

        def lay(tbl):
            perm = tbl.perm_b
            fs_bT = forces.gather_rows_T(tbl.fstat_a.T, perm)
            wcbT = forces.gather_rows_T(tbl.wcb.T, perm)
            return tbl.replace(
                force=tbl.force + (fs_bT[1, :1] + wcbT[0, :1]) * 1e-30)

        timed("B-layout gathers", lay, state.ss)


if __name__ == "__main__":
    main()
