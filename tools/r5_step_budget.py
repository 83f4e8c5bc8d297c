"""Round-5 dT step budget at the bench shape: chained-prefix programs
over the FUSED step's stages so the 'glue' between the component sum and
the measured step time has a name (VERDICT r4 weak #8 / next #5).

Prefixes (each timed with scalar-readback sync, reps chained so the
relay can't cache): pack_kinematics -> other-side gather (uniq or
merged) -> pass A -> pass B -> wildcard merge + new table -> integrate.
Also times run_steps(k) to catch scan-carry overheads the single-step
program hides.

Usage: python tools/r5_step_budget.py [--n 262144] [--k 5] [--uniq ...]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from dem_engine_tpu.utils import compile_cache

compile_cache.enable()

import jax
import jax.numpy as jnp

from dem_engine_tpu.defines import F


def timed(fn, state, params, reps=3):
    g = jax.jit(fn)
    y = g(state, params)
    leaves = jax.tree_util.tree_leaves(y)
    sync = next((l for l in leaves if l.dtype == jnp.float32), leaves[0])
    float(sync.sum())  # warmup completion barrier
    t0 = time.perf_counter()
    for _ in range(reps):
        y = g(y, params)
        leaves = jax.tree_util.tree_leaves(y)
        sync = next((l for l in leaves if l.dtype == jnp.float32),
                    leaves[0])
        float(sync.sum())
    return (time.perf_counter() - t0) / reps * 1e3


def chain(state, dep):
    sp = state.spheres
    return state.replace(
        spheres=sp.replace(relpos=sp.relpos + dep.astype(F) * 1e-30))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--warm", type=int, default=500)
    ap.add_argument("--uniq", type=int, default=None)
    ap.add_argument("--cap", type=int, default=0)
    ap.add_argument("--ch", type=int, default=0,
                    help="override pallas_force.CH (contact chunk width) "
                         "for an A/B sweep of the per-chunk overhead")
    ap.add_argument("--ob", type=int, default=0,
                    help="override pallas_force.OB (owners per block)")
    ap.add_argument("--sweep", action="store_true",
                    help="sweep (CH, OB) over the warmed state and print "
                         "per-point fused-pass times, then exit")
    args = ap.parse_args()

    if args.ch or args.ob:
        from dem_engine_tpu.ops import pallas_force as _pf

        if args.ch:
            _pf.CH = args.ch
        if args.ob:
            _pf.OB = args.ob
        print(f"pallas_force CH={_pf.CH} OB={_pf.OB}", flush=True)

    import json
    import os

    sc = {}
    try:
        with open("/root/repo/.bench_state.json") as f:
            sc = json.load(f).get(
                f"n{args.n}_poly0_uniq"
                f"{-1 if args.uniq is None else args.uniq}", {})
    except Exception:
        pass
    cap = args.cap or sc.get("cap_ss")

    from __graft_entry__ import _build_case
    from dem_engine_tpu.solver import Engine
    from dem_engine_tpu.ops import forces
    from dem_engine_tpu.ops.pallas_force import fused_step_ss
    from dem_engine_tpu.solver import dynamics_step, run_steps
    from functools import partial

    cfg, state, params = _build_case(
        n_clumps=args.n, update_freq=25,
        **({"cap_ss": cap} if cap else {}),
        **({"uniq_cap": args.uniq} if args.uniq is not None else {}),
    )
    eng = Engine(cfg)
    freq = int(sc.get("freq", 25))
    eng.active_freq = freq
    state = eng.advance(state, params, args.warm, freq)
    float(state.owners.vel.sum())
    cfg = eng.cfg
    print(f"settled: cap_ss={cfg.cap_ss} contacts={int(state.ss.count)} "
          f"uniq={cfg.uniq_cap} freq={freq}", flush=True)
    model = cfg.force_model

    def p_pack(st, pp):
        krec = forces.pack_kinematics(st.owners)
        return chain(st, krec.sum())

    def p_gather(st, pp):
        krec = forces.pack_kinematics(st.owners)
        t = st.ss
        if t.uniq_a.shape[0]:
            merged = jnp.minimum(
                jnp.concatenate([t.uniq_a, t.uniq_b]), st.owners.n - 1)
            slabs = forces.gather_rows(krec, merged)
            dep = slabs.sum()
        else:
            live = t.idA >= 0
            own_b = jnp.where(live, t.own_b, 0)
            both = forces.gather_rows(
                krec, jnp.concatenate([own_b, t.own_a_b]))
            dep = both.sum()
        return chain(st, dep)

    def p_fused(st, pp):
        krec = forces.pack_kinematics(st.owners)
        f_a, t_a, newt = fused_step_ss(
            st.ss, st.owners, pp, cfg.voxel_size, model, krec)
        return chain(st, f_a.sum() + t_a.sum())

    def p_fused_tbl(st, pp):
        krec = forces.pack_kinematics(st.owners)
        f_a, t_a, newt = fused_step_ss(
            st.ss, st.owners, pp, cfg.voxel_size, model, krec)
        return st.replace(ss=newt), chain(st, f_a.sum() + t_a.sum())

    def p_table(st, pp):
        newst, dep = p_fused_tbl(st, pp)
        # force the wildcard merge + wcb rebuild to materialize
        d2 = sum(w.sum() for w in newst.ss.wildcards.values())
        return chain(newst, d2)

    def p_step(st, pp):
        return dynamics_step(st, pp, cfg)

    def p_steps_k(st, pp):
        return run_steps(st, pp, cfg, args.k)

    if args.sweep:
        # one warm state, then re-jit the fused step per (CH, OB) point —
        # timed() makes a fresh jax.jit so the new module globals are
        # retraced; the engine state itself is CH/OB-independent
        from dem_engine_tpu.ops import pallas_force as _pf

        # OB can only be swept with uniq OFF (--uniq 0): the uniq layout's
        # per-block ranks are built for the refresh-time OB and a different
        # block width would mis-index the unique slabs
        obs = (128,) if state.ss.uniq_a.shape[0] else (128, 256)
        for ch in (512, 1024, 2048):
            for ob in obs:
                _pf.CH, _pf.OB = ch, ob
                ms = timed(p_fused, state, params)
                print(f"  sweep CH={ch:5d} OB={ob:4d}: {ms:8.2f} ms",
                      flush=True)
        _pf.CH, _pf.OB = args.ch or 512, args.ob or 128
        return

    r = {}
    r["pack_kinematics"] = timed(p_pack, state, params)
    r["pack+other_gather"] = timed(p_gather, state, params)
    r["pack+fused_passes"] = timed(p_fused, state, params)
    r["pack+fused+wc_merge"] = timed(p_table, state, params)
    r["full dynamics_step"] = timed(p_step, state, params)
    r[f"run_steps(k={args.k})/k"] = timed(p_steps_k, state, params) / args.k
    base = 0.0
    for k, v in r.items():
        print(f"{k:>24}: {v:8.2f} ms  (delta {v - base:+7.2f})", flush=True)
        base = v

    # split-program refresh for the amortization picture
    from dem_engine_tpu.solver import refresh_contacts

    def p_refresh(st, pp):
        return refresh_contacts(st, pp, cfg)

    r["refresh"] = timed(p_refresh, state, params, reps=2)
    print(f"{'refresh':>24}: {r['refresh']:8.2f} ms  "
          f"(/{freq} = {r['refresh']/freq:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
