"""Ablation profile of the full dynamics_step at 262k: isolate where the
step-level cost beyond fused_step_ss (measured 66 ms) comes from.

Round-4 finding to explain: profile_fused measured `whole dynamics_step`
at 10,202 ms while the SAME computation inside the bench's run_chunks
runs at ~103 ms/step. Suspect: XLA assigning a transposed (column-major)
output layout to the merged kinematic row-gather in some surrounding
contexts — CLAUDE.md records 1.2-50 s for exactly that gather when the
layout flips.

Ablations, each a scan of reps with chained state / scalar readback:
  1. pack_kinematics alone
  2. fused_step_ss with krec built INSIDE (concat -> gather chain)
  3. dynamics_step (the repro)
  4. run_steps(K) exactly as the bench compiles it
  5. integrator alone
"""

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
from dem_engine_tpu.ops import forces, integrator
from dem_engine_tpu.ops.pallas_force import fused_step_ss
from dem_engine_tpu.models.prescriptions import PrescriptionTables
from dem_engine_tpu.solver import dynamics_step, refresh_contacts, run_steps
from tools.check_fused_tpu import build


def timed(name, fn, x0, *consts, reps=10):
    def loop(x, *cs):
        y, _ = jax.lax.scan(
            lambda c, _: (fn(c, *cs), None), x, length=reps)
        return y

    g = jax.jit(loop)
    t0 = time.perf_counter()
    y = g(x0, *consts)  # compile + run
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
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    state, params, cfg = build(args.n)
    state = jax.jit(lambda s, p: refresh_contacts(s, p, cfg))(state, params)
    print("contacts:", int(state.ss.count), "cap:", state.ss.cap,
          "owners:", state.owners.n, flush=True)
    reps = args.reps
    only = set(args.only.split(",")) if args.only else None

    def want(k):
        return only is None or k in only

    if want("pack"):
        def pack(o):
            krec = forces.pack_kinematics(o)
            return o.replace(vel=o.vel + krec[:, 10:13] * 1e-30)

        timed("pack_kinematics", pack, state.owners, reps=reps)

    if want("fused_inside"):
        # krec built inside (concat feeds the gather) — the dynamics_step
        # context; profile_fused's isolated fused_step_ss instead passed a
        # jit-argument krec
        def fused_in(o, tbl):
            krec = forces.pack_kinematics(o)
            f_acc, t_acc, _ = fused_step_ss(
                tbl, o, params, cfg.voxel_size, cfg.force_model, krec)
            return o.replace(vel=o.vel + f_acc * 1e-30)

        timed("fused_step_ss (krec inside)", fused_in, state.owners,
              state.ss, reps=reps)

    if want("integ"):
        def integ(o):
            tables_p = PrescriptionTables(cfg.prescriptions, state.time)
            o2 = integrator.integrate_owners(
                o, o.vel * 1e-30, o.omg * 1e-30, params, tables_p,
                cfg.voxel_size, cfg.integrator, state.time)
            return o2

        timed("integrate_owners", integ, state.owners, reps=reps)

    if want("step"):
        def step(st, pp):
            return dynamics_step(st, pp, cfg)

        timed("dynamics_step", step, state, params, reps=reps)

    if want("runsteps"):
        fn = jax.jit(lambda s, p: run_steps(s, p, cfg, reps))
        t0 = time.perf_counter()
        s1 = fn(state, params)
        float(s1.owners.vel.sum())
        print(f"run_steps({reps}): compile+first "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        s2 = fn(s1, params)
        float(s2.owners.vel.sum())
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"run_steps({reps}): {dt:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
