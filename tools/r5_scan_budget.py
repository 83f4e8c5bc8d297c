"""In-scan step budget: each stage-prefix runs inside a lax.scan(10) so
the ~15-22 ms dispatch floor and the warmup-sync ghost cancel, giving
honest per-step stage costs (r5_step_budget's single-dispatch numbers
carry the floor).

Usage: python tools/r5_scan_budget.py [--n 262144] [--reps 10]
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


def timed_scan(step, state, params, reps):
    def body(s, _):
        return step(s, params), None

    def fn(s, p):
        out, _ = jax.lax.scan(lambda c, x: (step(c, p), None), s,
                              length=reps)
        return out

    g = jax.jit(fn)
    y = g(state, params)
    float(y.owners.vel.sum())  # warmup completion barrier
    t0 = time.perf_counter()
    y = g(y, params)
    float(y.owners.vel.sum())
    dt1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    y = g(y, params)
    float(y.owners.vel.sum())
    dt2 = time.perf_counter() - t0
    return min(dt1, dt2) / reps * 1e3


def chain(state, dep):
    ow = state.owners
    return state.replace(owners=ow.replace(vel=ow.vel + dep * 1e-30))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--warm", type=int, default=500)
    args = ap.parse_args()

    import json

    sc = {}
    try:
        with open("/root/repo/.bench_state.json") as f:
            sc = json.load(f).get(f"n{args.n}_poly0_uniq-1", {})
    except Exception:
        pass

    from __graft_entry__ import _build_case
    from dem_engine_tpu.solver import Engine, dynamics_step
    from dem_engine_tpu.ops import forces
    from dem_engine_tpu.ops.pallas_force import fused_step_ss

    cap = sc.get("cap_ss")
    cfg, state, params = _build_case(
        n_clumps=args.n, update_freq=25,
        **({"cap_ss": int(cap)} if cap else {}),
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

    def p_noop(st, pp):
        return chain(st, st.spheres.relpos.sum())

    def p_pack(st, pp):
        krec = forces.pack_kinematics(st.owners)
        return chain(st, krec.sum())

    def p_gather(st, pp):
        krec = forces.pack_kinematics(st.owners)
        t = st.ss
        if t.uniq_a.shape[0]:
            merged = jnp.minimum(
                jnp.concatenate([t.uniq_a, t.uniq_b]), st.owners.n - 1)
            dep = forces.gather_rows(krec, merged).sum()
        else:
            live = t.idA >= 0
            own_b = jnp.where(live, t.own_b, 0)
            dep = forces.gather_rows(
                krec, jnp.concatenate([own_b, t.own_a_b])).sum()
        return chain(st, dep)

    def p_fused(st, pp):
        krec = forces.pack_kinematics(st.owners)
        f_a, t_a, newt = fused_step_ss(
            st.ss, st.owners, pp, cfg.voxel_size, model, krec)
        return chain(st.replace(ss=newt), f_a.sum() + t_a.sum())

    def p_step(st, pp):
        return dynamics_step(st, pp, cfg)

    r = {}
    for name, fn in (("noop", p_noop), ("pack", p_pack),
                     ("pack+gather", p_gather), ("pack+fused", p_fused),
                     ("full step", p_step)):
        r[name] = timed_scan(fn, state, params, args.reps)
        print(f"{name:>14}: {r[name]:7.2f} ms/step (in-scan)", flush=True)
    base = r["noop"]
    print("floor-free:", {k: round(v - base, 2) for k, v in r.items()},
          flush=True)


if __name__ == "__main__":
    main()
