"""Compare sweep v2 vs v3 on the real TPU at bench-like density."""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=786432)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--win", type=int, default=1024)
    ap.add_argument("--which", default="v3,v3k")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dem_engine_tpu.utils import compile_cache

    compile_cache.enable()
    from dem_engine_tpu.defines import F, I
    from dem_engine_tpu.ops import binning

    # bench-like bed: ~2 spheres per bin, reach ~ 1.21 R
    S = args.s
    rng = np.random.default_rng(0)
    R = 0.005
    reach_np = np.full(S, R * 1.21, np.float32)
    nside = int(np.ceil((S / 2.0) ** (1 / 3)))  # ~2 per bin
    box = nside * 2 * R * 1.21 * 2.02
    pos_np = rng.uniform(0.03 * box, 0.97 * box, (S, 3)).astype(np.float32)
    owner_np = np.repeat(np.arange((S + 2) // 3), 3)[:S].astype(np.int32)
    fam_np = np.zeros(S, np.int32)

    pos = jnp.asarray(pos_np)
    reach = jnp.asarray(reach_np)
    owner = jnp.asarray(owner_np)
    family = jnp.asarray(fam_np)
    fam_mask = jnp.ones((256, 256), bool)
    domain = jnp.asarray([box, box, box], F)
    bs, nb = binning.build_grid(domain, reach.max())
    print(f"S={S} box={box:.3f} nb={np.asarray(nb)}")
    cap = int(S * 4)

    def timed(name, fn, reps=args.reps):
        c = fn(jnp.zeros(()))
        v = float(c)
        t0 = time.perf_counter()
        for _ in range(reps):
            c = fn(c + 1.0)
        v = float(c)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:40s} {dt*1e3:10.2f} ms  (chk {v:.6g})")

    which = args.which.split(",")

    if "v3" in which:
        from dem_engine_tpu.ops.pallas_sweep3 import find_pairs_ss_pallas3

        @jax.jit
        def f_v3(c):
            p = pos + c * 1e-30
            a, b, n, occ, tab, wovf = find_pairs_ss_pallas3(
                p, reach, owner, family, fam_mask, bs, nb, cap,
                win=args.win, family_filter=False)
            return (n + a[0] + b[0]).astype(F) * 1e-30 + c

        timed(f"v3 full CD (win={args.win})", f_v3)

        @jax.jit
        def f_v3f(c):
            p = pos + c * 1e-30
            a, b, n, occ, tab, wovf = find_pairs_ss_pallas3(
                p, reach, owner, family, fam_mask, bs, nb, cap,
                win=args.win, family_filter=True)
            return (n + a[0] + b[0]).astype(F) * 1e-30 + c

        timed("v3 full CD + family filter", f_v3f)

    if "v3k" in which:
        from dem_engine_tpu.ops import pallas_sweep3 as p3

        # kernel alone (prebuilt table)
        tile = p3.TILE
        spad = max(-(-S // tile), args.win // tile) * tile
        tab = binning.build_sphere_table(
            pos, reach, owner, family, bs, nb, spad)
        first = binning.flat_bin(tab.idx3[::tile], nb)
        last = binning.flat_bin(tab.idx3[tile - 1::tile], nb)
        sz = nb[0] * nb[1]
        q_s = jnp.stack([first, first + sz - nb[0] - 1], axis=1).reshape(-1)
        q_e = jnp.stack([last + nb[0] + 1, last + sz + nb[0] + 1],
                        axis=1).reshape(-1)
        starts = jnp.searchsorted(tab.sorted_bin, q_s,
                                  method="sort").astype(I)
        ends = jnp.searchsorted(tab.sorted_bin, q_e, side="right",
                                method="sort").astype(I)
        bases = jnp.stack(
            [starts.reshape(-1, 2), ends.reshape(-1, 2)], axis=2
        ).reshape(-1)
        idx3f = jnp.where((tab.order < S)[:, None], tab.idx3.astype(F), 2e9)
        recT = jnp.concatenate([tab.rec[:, 0:5].T, idx3f.T], axis=0)

        @jax.jit
        def f_kern(recT, c):
            out = p3.sweep_v3(recT + c * 1e-30, bases, spad, win=args.win)
            return out[0, 0].astype(F) * 1e-30 + c

        timed("v3 kernel alone", lambda c: f_kern(recT, c))

        @jax.jit
        def f_tab(c):
            t2 = binning.build_sphere_table(
                pos + c * 1e-30, reach, owner, family, bs, nb, spad)
            return t2.rec.sum() * 1e-30 + c

        timed("build_sphere_table alone", f_tab)

        @jax.jit
        def f_dec(out_arr, c):
            sa, sb, a, b, tot, oo = p3.decode_hits(
                out_arr + c.astype(I) * 0, tab.order, cap, spad)
            return (a[0] + b[0] + tot).astype(F) * 1e-30 + c

        out_arr = p3.sweep_v3(recT, bases, spad, win=args.win)
        out_arr = jax.block_until_ready(out_arr)
        timed("v3 decode alone", lambda c: f_dec(out_arr, c))

    if "v2" in which:
        from dem_engine_tpu.ops.pallas_sweep2 import find_pairs_ss_pallas2

        @jax.jit
        def f_v2(c):
            p = pos + c * 1e-30
            a, b, n, occ, tab, wovf = find_pairs_ss_pallas2(
                p, reach, owner, family, fam_mask, bs, nb, cap)
            return (n + a[0] + b[0]).astype(F) * 1e-30 + c

        timed("v2 full CD", f_v2)


if __name__ == "__main__":
    main()
