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


def timed_noscan(name, fn, x0, *consts, reps=4):
    """Host-loop chained variant: no lax.scan around fn, so scan-carry
    pass-through copies can't inflate the measurement. Per-dispatch floor
    (~15-22 ms) + a scalar readback per rep ride on top — use only for
    programs costing >= hundreds of ms."""
    g = jax.jit(fn)
    t0 = time.perf_counter()
    y = g(x0, *consts)
    leaves = jax.tree_util.tree_leaves(y)
    sync = next((l for l in leaves if l.dtype != jnp.int32), leaves[0])
    float(sync.sum())
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(reps):
        y = g(y, *consts)
        leaves = jax.tree_util.tree_leaves(y)
        sync = next((l for l in leaves if l.dtype != jnp.int32), leaves[0])
        s = float(sync.sum())
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

    if want("refresh_noscan"):
        def rf2(st, pp):
            return refresh_contacts(st, pp, cfg)

        timed_noscan("full refresh (noscan)", rf2, state, params)

    # --- chained-prefix composition probes (noscan: host-loop chained, so
    # nothing can be hoisted out and no scan-carry copy pollutes the
    # number). Mirrors the single-grid pallas-sweep branch of
    # refresh_contacts (the bench case: no tris/anals/two-class).
    def _cd_part(st, pp):
        p = sphere_world_pos(st.owners, st.spheres, cfg.voxel_size)
        mg, _, _ = sphere_margins(st.owners, st.spheres, pp)
        rch = st.spheres.radius + mg
        b, n = binning.build_grid(pp.domain, rch.max(), pp.bin_factor)
        f = st.owners.family[st.spheres.owner]
        return find_pairs_ss_pallas3(
            p, rch, st.spheres.owner, f, pp.family_mask, b, n,
            cfg.cap_ss, win=cfg.pallas_win,
            family_filter=cfg.ss_family_filter)

    if want("p1"):
        def p1(st, pp):
            ia, ib, nn, _, _, _ = _cd_part(st, pp)
            # chain a live dependence through the sphere positions so the
            # host loop can't cache across reps
            sp2 = st.spheres.replace(
                relpos=st.spheres.relpos
                + (ia.sum() + ib.sum() + nn).astype(jnp.float32) * 1e-30)
            return st.replace(spheres=sp2)

        timed_noscan("p1 CD only (noscan)", p1, state, params)

    if want("p2"):
        def p2(st, pp):
            ia, ib, nn, _, _, _ = _cd_part(st, pp)
            ss2, _ = history.carry_history(
                st.ss, ia, ib, jnp.minimum(nn, cfg.cap_ss), wc_names,
                cfg.use_persistency)
            return st.replace(ss=ss2)

        timed_noscan("p2 CD+carry (noscan)", p2, state, params)

    if want("p3"):
        def p3(st, pp):
            ia, ib, nn, _, _, _ = _cd_part(st, pp)
            ss2, _ = history.carry_history(
                st.ss, ia, ib, jnp.minimum(nn, cfg.cap_ss), wc_names,
                cfg.use_persistency)
            ss2 = forces.finalize_table(
                "ss", ss2, st.owners, st.spheres, st.tris, st.anals,
                pp, cfg.force_model, slim=cfg.use_fused_force,
                uniq_cap=cfg.uniq_cap)
            ss2 = ss2.replace(count=jnp.minimum(ss2.count, cfg.cap_ss))
            return st.replace(ss=ss2)

        timed_noscan("p3 CD+carry+finalize (noscan)", p3, state, params)

    # --- CD-internals probes (diff chain c0 -> c1 -> p1) --------------------
    if want("c0"):
        def c0(st, pp):
            p = sphere_world_pos(st.owners, st.spheres, cfg.voxel_size)
            mg, _, _ = sphere_margins(st.owners, st.spheres, pp)
            rch = st.spheres.radius + mg
            b, n = binning.build_grid(pp.domain, rch.max(), pp.bin_factor)
            f = st.owners.family[st.spheres.owner]
            tab = binning.build_sphere_table(
                p, rch, st.spheres.owner, f, b, n,
                max(st.spheres.n, 1))
            sp2 = st.spheres.replace(
                relpos=st.spheres.relpos
                + (tab.rec.sum()).astype(jnp.float32)[None] * 1e-30)
            return st.replace(spheres=sp2)

        timed_noscan("c0 discretize (noscan)", c0, state, params)

    if want("c1"):
        from dem_engine_tpu.ops import pallas_sweep3 as ps3

        def c1(st, pp):
            p = sphere_world_pos(st.owners, st.spheres, cfg.voxel_size)
            mg, _, _ = sphere_margins(st.owners, st.spheres, pp)
            rch = st.spheres.radius + mg
            b, n = binning.build_grid(pp.domain, rch.max(), pp.bin_factor)
            f = st.owners.family[st.spheres.owner]
            tile, win = ps3.TILE, cfg.pallas_win or ps3.WIN
            S = p.shape[0]
            spad = max(-(-S // tile), win // tile) * tile
            tab = binning.build_sphere_table(
                p, rch, st.spheres.owner, f, b, n, spad)
            first = binning.flat_bin(tab.idx3[::tile], n)
            last = binning.flat_bin(tab.idx3[tile - 1::tile], n)
            sz = n[0] * n[1]
            q_s = jnp.stack([first, first + sz - n[0] - 1],
                            axis=1).reshape(-1)
            q_e = jnp.stack([last + n[0] + 1, last + sz + n[0] + 1],
                            axis=1).reshape(-1)
            starts = jnp.searchsorted(tab.sorted_bin, q_s,
                                      method="sort").astype(jnp.int32)
            ends = jnp.searchsorted(tab.sorted_bin, q_e, side="right",
                                    method="sort").astype(jnp.int32)
            bases = jnp.stack(
                [starts.reshape(-1, 2), ends.reshape(-1, 2)], axis=2
            ).reshape(-1)
            idx3f = jnp.where((tab.order < S)[:, None],
                              tab.idx3.astype(jnp.float32), 2e9)
            recT = jnp.concatenate([tab.rec[:, 0:5].T, idx3f.T], axis=0)
            out = ps3.sweep_v3(recT, bases, spad, interpret=False,
                               tile=tile, win=win)
            dep = sum(o.sum() for o in jax.tree_util.tree_leaves(out))
            sp2 = st.spheres.replace(
                relpos=st.spheres.relpos
                + dep.astype(jnp.float32)[None] * 1e-30)
            return st.replace(spheres=sp2)

        timed_noscan("c1 discretize+sweepraw (noscan)", c1, state, params)

    # --- carry-internals probes (diff against p1) --------------------------
    if want("g1"):
        def g1(st, pp):
            ia, ib, nn, _, _, _ = _cd_part(st, pp)
            a = jnp.concatenate([st.ss.idA, ia])
            b = jnp.concatenate([st.ss.idB, ib])
            po = jnp.arange(a.shape[0], dtype=jnp.int32)
            sa, sb, spos = jax.lax.sort((a, b, po), num_keys=2)
            sp2 = st.spheres.replace(
                relpos=st.spheres.relpos
                + (sa.sum() + spos.sum() + nn).astype(jnp.float32)[None]
                * 1e-30)
            return st.replace(spheres=sp2)

        timed_noscan("g1 CD+mergesort (noscan)", g1, state, params)

    if want("g2"):
        def g2(st, pp):
            ia, ib, nn, _, _, _ = _cd_part(st, pp)
            mapping, old_matched = history._merge_match(
                st.ss.idA, st.ss.idB, ia, ib)
            sp2 = st.spheres.replace(
                relpos=st.spheres.relpos
                + (mapping.sum() + old_matched.sum() + nn
                   ).astype(jnp.float32)[None] * 1e-30)
            return st.replace(spheres=sp2)

        timed_noscan("g2 CD+mergematch (noscan)", g2, state, params)

    # --- finalize-internals probes (diff against p2) ------------------------
    def _p2_table(st, pp):
        ia, ib, nn, _, _, _ = _cd_part(st, pp)
        ss2, _ = history.carry_history(
            st.ss, ia, ib, jnp.minimum(nn, cfg.cap_ss), wc_names,
            cfg.use_persistency)
        return ss2

    if want("h1"):
        def h1(st, pp):
            ss2 = _p2_table(st, pp)
            live0 = ss2.idA >= 0
            jA = jnp.where(live0, ss2.idA, 0)
            jB = jnp.where(live0, ss2.idB, 0)
            own_a0 = jnp.where(live0, st.spheres.owner[jA], -1)
            own_b0 = jnp.where(live0, st.spheres.owner[jB], -1)
            I32MAX = jnp.iinfo(jnp.int32).max
            key = jnp.where(live0, own_a0, I32MAX)
            key2 = jnp.where(live0, own_b0, I32MAX)
            ops = (key, key2, ss2.idA, ss2.idB, ss2.persist, own_a0,
                   own_b0) + tuple(ss2.wildcards[k] for k in wc_names)
            so = jax.lax.sort(ops, num_keys=2)
            dep = so[2].sum() + so[5].sum()
            sp2 = st.spheres.replace(
                relpos=st.spheres.relpos
                + dep.astype(jnp.float32)[None] * 1e-30)
            return st.replace(spheres=sp2, ss=ss2)

        timed_noscan("h1 p2+mainsort (noscan)", h1, state, params)

    if want("h2"):
        def h2(st, pp):
            ss2 = _p2_table(st, pp)
            ss3 = forces.finalize_table(
                "ss", ss2, st.owners, st.spheres, st.tris, st.anals,
                pp, cfg.force_model, slim=cfg.use_fused_force,
                uniq_cap=0)  # no uniq layouts
            return st.replace(ss=ss3)

        timed_noscan("h2 p2+finalize-nouniq (noscan)", h2, state, params)

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
