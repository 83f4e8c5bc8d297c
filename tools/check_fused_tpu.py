"""Hardware check for the fused force pass: correctness vs the XLA path
ON the TPU (compiled Mosaic, not interpret), then in-scan step timing.

Usage: python tools/check_fused_tpu.py [--n 20000] [--steps 50]
"""

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dem_engine_tpu.defines import TimeIntegrator
from dem_engine_tpu.initializer import (
    make_owners, make_params, make_spheres, make_state,
)
from dem_engine_tpu.models import HertzianForceModel
from dem_engine_tpu.solver import dynamics_step, refresh_contacts, run_steps
from dem_engine_tpu.state import SolverConfig
from dem_engine_tpu.utils import compile_cache

compile_cache.enable()


def build(n_clumps, seed=0):
    rng = np.random.default_rng(seed)
    R = 0.005
    side = int(np.ceil(n_clumps ** (1 / 3)))
    g = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"),
                 axis=-1).reshape(-1, 3)[:n_clumps]
    pos = 0.2 + g * (1.9 * R) + rng.uniform(-0.2 * R, 0.2 * R,
                                            (n_clumps, 3))
    quat = rng.normal(size=(n_clumps, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    owners = make_owners(
        pos=pos, voxel_size=1.0 / 2**16, quat=quat,
        vel=rng.uniform(-0.2, 0.2, (n_clumps, 3)),
        omg=rng.uniform(-2.0, 2.0, (n_clumps, 3)),
        family=np.zeros(n_clumps, np.int64),
        mass=np.full(n_clumps, 1e-2), moi=np.full((n_clumps, 3), 1e-6),
    )
    owner_ids = np.repeat(np.arange(n_clumps), 3)
    rel = np.tile(np.asarray(
        [[0.5 * R, 0, 0], [-0.5 * R, 0, 0], [0, 0.5 * R, 0]]),
        (n_clumps, 1))
    spheres = make_spheres(
        owner=owner_ids, relpos=rel,
        radius=np.full(3 * n_clumps, R),
        mat=np.zeros(3 * n_clumps),
    )
    cap = -(-5 * 3 * n_clumps // 512) * 512
    cfg = SolverConfig(
        voxel_size=1.0 / 2**16,
        integrator=TimeIntegrator.CENTERED_DIFFERENCE,
        force_model=HertzianForceModel(),
        cap_ss=cap, cap_st=8, cap_sa=8,
        reduce_mode="segment",
        use_pallas_sweep=True,
        # fused layouts are only built on use_fused_force refreshes; the
        # probe/sweep tools read table.fstat_a/fstat_b directly
        use_fused_force=True,
    )
    params = make_params(
        h=2e-6, gravity=[0, 0, -9.81], domain=[3.0, 3.0, 3.0],
        materials={"E": np.asarray([1e7], np.float32),
                   "nu": np.asarray([0.3], np.float32)},
        pair_materials={"CoR": np.asarray([[0.5]], np.float32),
                        "mu": np.asarray([[0.4]], np.float32),
                        "Crr": np.asarray([[0.02]], np.float32)},
        update_freq=25,
    )
    return make_state(owners, spheres, cfg), params, cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--skip-compare", action="store_true")
    args = ap.parse_args()

    print("platform:", jax.devices()[0].platform)
    state0, params, cfg_fused = build(args.n)
    cfg = dataclasses.replace(cfg_fused, use_fused_force=False)

    t0 = time.perf_counter()
    refresh = jax.jit(lambda s, p: refresh_contacts(s, p, cfg_fused))
    state = refresh(state0, params)
    n_contacts = int(state.ss.count)
    print(f"refresh: {time.perf_counter()-t0:.1f}s, contacts={n_contacts}")
    assert n_contacts > 0
    # the XLA leg needs a non-slim (statics-bearing) table
    state_x = jax.jit(
        lambda s, p: refresh_contacts(s, p, cfg))(state0, params)

    if not args.skip_compare:
        step_x = jax.jit(lambda s, p: dynamics_step(s, p, cfg))
        step_f = jax.jit(lambda s, p: dynamics_step(s, p, cfg_fused))
        t0 = time.perf_counter()
        sx = step_x(state_x, params)
        sx.owners.vel.block_until_ready()
        print(f"xla step compile+run: {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        sf = step_f(state, params)
        sf.owners.vel.block_until_ready()
        print(f"fused step compile+run: {time.perf_counter()-t0:.1f}s")
        for name in ("vel", "omg"):
            a = np.asarray(getattr(sx.owners, name), np.float64)
            b = np.asarray(getattr(sf.owners, name), np.float64)
            scale = max(np.abs(a).max(), 1e-12)
            err = np.abs(a - b).max() / scale
            print(f"max rel err {name}: {err:.3e} (scale {scale:.3e})")
            assert err < 1e-3, (name, err)
        for k in sx.ss.wildcards:
            a = np.asarray(sx.ss.wildcards[k], np.float64)
            b = np.asarray(sf.ss.wildcards[k], np.float64)
            scale = max(np.abs(a).max(), 1e-12)
            err = np.abs(a - b).max() / scale
            print(f"max rel err wc {k}: {err:.3e}")
            assert err < 5e-3, (k, err)
        print("CORRECTNESS OK")

    # in-scan timing, chained state, scalar readback
    for label, c, st0 in (("xla", cfg, state_x), ("fused", cfg_fused,
                                                  state)):
        fn = jax.jit(lambda s, p, c=c: run_steps(s, p, c, args.steps))
        t0 = time.perf_counter()
        s1 = fn(st0, params)
        v = float(s1.owners.vel.sum())
        print(f"{label}: compile+first {time.perf_counter()-t0:.1f}s "
              f"(chk {v:.4f})")
        t0 = time.perf_counter()
        s2 = fn(s1, params)
        v = float(s2.owners.vel.sum())
        dt = time.perf_counter() - t0
        print(f"{label}: {args.steps} steps in {dt*1e3:.1f} ms -> "
              f"{dt/args.steps*1e3:.2f} ms/step (chk {v:.4f})")


if __name__ == "__main__":
    main()
