"""Primitive-cost measurements on the axon TPU (chained, scalar readback)."""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, c0, reps=5):
    c = fn(c0)
    v = float(c)
    t0 = time.perf_counter()
    for _ in range(reps):
        c = fn(c + 1.0)
    v = float(c)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:52s} {dt*1e3:10.2f} ms  (chk {v:.3g})")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dem_engine_tpu.utils import compile_cache

    compile_cache.enable()
    F, I = jnp.float32, jnp.int32
    key = jax.random.PRNGKey(0)

    # dispatch floor
    @jax.jit
    def f_noop(c):
        return c + 1.0

    timed("noop dispatch floor", f_noop, jnp.zeros(()), args.reps * 4)

    # gather ns/row at 3M rows from a 1M-row table, width 16
    N = 1_000_000
    CAP = 3_000_000
    tab16 = jax.random.normal(key, (N, 16), F)
    idx = jax.random.randint(key, (CAP,), 0, N, I)
    idx_sorted = jnp.sort(idx)

    @jax.jit
    def f_g16(tab, idx, c):
        g = (tab + c * 1e-30)[idx]
        return g.sum() * 1e-30 + c

    dt = timed("gather 3M rows x16w (random idx)",
               lambda c: f_g16(tab16, idx, c), jnp.zeros(()), args.reps)
    print(f"{'':52s} {dt/CAP*1e9:10.2f} ns/row")
    dt = timed("gather 3M rows x16w (sorted idx)",
               lambda c: f_g16(tab16, idx_sorted, c), jnp.zeros(()),
               args.reps)
    print(f"{'':52s} {dt/CAP*1e9:10.2f} ns/row")

    tab4 = tab16[:, :4]

    @jax.jit
    def f_g4(tab, idx, c):
        g = (tab + c * 1e-30)[idx]
        return g.sum() * 1e-30 + c

    dt = timed("gather 3M rows x4w (random idx)",
               lambda c: f_g4(tab4, idx, c), jnp.zeros(()), args.reps)
    print(f"{'':52s} {dt/CAP*1e9:10.2f} ns/row")

    # scatter-add 3M rows x8w into 262k owners (sorted + random)
    NO = 262_144
    oid = jax.random.randint(key, (CAP,), 0, NO, I)
    oid_s = jnp.sort(oid)
    rec8 = jax.random.normal(key, (CAP, 8), F)

    @jax.jit
    def f_scat(ids, rec, c):
        acc = jnp.zeros((NO, 8), F)
        acc = acc.at[ids].add(rec + c * 1e-30)
        return acc.sum() * 1e-30 + c

    dt = timed("scatter-add 3M x8w -> 262k (random)",
               lambda c: f_scat(oid, rec8, c), jnp.zeros(()), args.reps)
    print(f"{'':52s} {dt/CAP*1e9:10.2f} ns/row")
    dt = timed("scatter-add 3M x8w -> 262k (sorted)",
               lambda c: f_scat(oid_s, rec8, c), jnp.zeros(()), args.reps)
    print(f"{'':52s} {dt/CAP*1e9:10.2f} ns/row")

    @jax.jit
    def f_segsum(ids, rec, c):
        acc = jax.ops.segment_sum(rec + c * 1e-30, ids, NO,
                                  indices_are_sorted=True)
        return acc.sum() * 1e-30 + c

    dt = timed("segment_sum 3M x8w -> 262k (sorted flag)",
               lambda c: f_segsum(oid_s, rec8, c), jnp.zeros(()), args.reps)

    # sort costs
    k32 = jax.random.randint(key, (CAP,), 0, 1 << 30, I)
    p1 = jnp.arange(CAP, dtype=I)

    @jax.jit
    def f_sort2(k, c):
        sk, sv = jax.lax.sort((k + c.astype(I) * 0, p1), num_keys=1)
        return sv[:100].sum().astype(F) * 1e-30 + c

    timed("lax.sort 3M (1 key + 1 payload)",
          lambda c: f_sort2(k32, c), jnp.zeros(()), args.reps)

    pays = tuple(jax.random.normal(jax.random.PRNGKey(i), (CAP,), F)
                 for i in range(8))

    @jax.jit
    def f_sort10(k, c):
        ops = (k + c.astype(I) * 0, p1) + pays
        out = jax.lax.sort(ops, num_keys=1)
        return out[1][:100].sum().astype(F) * 1e-30 + c

    timed("lax.sort 3M (1 key + 9 payloads)",
          lambda c: f_sort10(k32, c), jnp.zeros(()), args.reps)

    @jax.jit
    def f_sort2key(k, c):
        ops = (k + c.astype(I) * 0, k32, p1, pays[0])
        out = jax.lax.sort(ops, num_keys=2)
        return out[2][:100].sum().astype(F) * 1e-30 + c

    timed("lax.sort 3M (2 keys + 2 payloads)",
          lambda c: f_sort2key(k32, c), jnp.zeros(()), args.reps)

    # compaction at 44M candidates: scatter vs sort vs gather-decode merge
    M = 44_000_000
    DENS = 16  # ~1/16 hit density

    def mk(c):
        k = jnp.arange(M, dtype=jnp.uint32)
        h = (k * jnp.uint32(2654435761)) >> jnp.uint32(28)
        hit = (h == 0) | (c.astype(jnp.uint32) * 0 > 0)
        return hit, k.astype(I)

    @jax.jit
    def f_comp_scatter(c):
        hit, k = mk(c)
        csum = jnp.cumsum(hit.astype(I))
        dest = jnp.where(hit, csum - 1, CAP)
        dest = jnp.where(dest < CAP, dest, CAP)
        out = jnp.full((CAP,), -1, I).at[dest].set(
            k, mode="drop", unique_indices=True)
        return out[:100].sum().astype(F) * 1e-30 + c

    timed("compact 44M: cumsum+scatter", f_comp_scatter, jnp.zeros(()),
          max(1, args.reps // 2))

    @jax.jit
    def f_comp_sort(c):
        hit, k = mk(c)
        kk = jnp.where(hit, k, jnp.iinfo(np.int32).max)
        sk, sv = jax.lax.sort((kk, k), num_keys=1)
        return sv[:100].sum().astype(F) * 1e-30 + c

    timed("compact 44M: full sort", f_comp_sort, jnp.zeros(()),
          max(1, args.reps // 2))

    # population_count availability + cost on 3M x14 i32
    masks = jax.random.randint(key, (CAP, 14), 0, 1 << 16, I)

    @jax.jit
    def f_pop(m, c):
        p = jax.lax.population_count(m + c.astype(I) * 0)
        rows = p.sum(axis=1)
        base = jnp.cumsum(rows)
        return base[-1].astype(F) * 1e-30 + c

    timed("popcount 3Mx14 + rowsum + cumsum", lambda c: f_pop(masks, c),
          jnp.zeros(()), args.reps)

    # merged searchsorted (sorted queries into sorted array) via sort trick
    SQ = 3_000_000
    SA = 786_432
    a = jnp.sort(jax.random.randint(key, (SA,), 0, 1 << 24, I))
    q = jnp.sort(jax.random.randint(jax.random.PRNGKey(3), (SQ,), 0,
                                    1 << 24, I))

    @jax.jit
    def f_ss(a, q, c):
        r = jnp.searchsorted(a, q + c.astype(I) * 0, side="right",
                             method="sort")
        return r[:100].sum().astype(F) * 1e-30 + c

    timed("searchsorted 3M sorted-q into 786k (sort)",
          lambda c: f_ss(a, q, c), jnp.zeros(()), args.reps)

    # k-th set bit extraction loop over cap
    w = jax.random.randint(key, (CAP,), 0, 1 << 16, I)
    kk = jax.random.randint(key, (CAP,), 0, 4, I)

    @jax.jit
    def f_kbit(w, kk, c):
        ww = w + c.astype(I) * 0
        for _ in range(4):  # clear lowest set bit kk times (bounded demo)
            clear = kk > 0
            ww = jnp.where(clear, ww & (ww - 1), ww)
            kk2 = jnp.maximum(kk - 1, 0)
            kk = kk2
        pos = jnp.int32(31) - jax.lax.clz(ww & (-ww))
        return pos[:100].sum().astype(F) * 1e-30 + c

    timed("kth-bit 3M (4-iter demo)", lambda c: f_kbit(w, kk, c),
          jnp.zeros(()), args.reps)

    # streaming compaction: scan chunks + dynamic_update_slice append
    CH = 1 << 21  # 2M lanes/chunk
    NCH = M // CH
    CCAP = 1 << 18

    @jax.jit
    def f_comp_stream(c):
        out0 = jnp.full((CAP + CCAP,), -1, I)

        def body(carry, ci):
            out, total = carry
            k0 = ci * CH
            k = k0 + jnp.arange(CH, dtype=I)
            h = (k.astype(jnp.uint32) * jnp.uint32(2654435761)) >> jnp.uint32(28)
            hit = (h == 0) | (c.astype(jnp.uint32) * 0 > 0)
            kk = jnp.where(hit, k, jnp.iinfo(np.int32).max)
            sk, = jax.lax.sort((kk,), num_keys=1)
            cnt = jnp.sum(hit.astype(I))
            chunkv = jnp.where(jnp.arange(CCAP, dtype=I) < cnt,
                               sk[:CCAP], -1)
            out = jax.lax.dynamic_update_slice(
                out, chunkv, (jnp.minimum(total, CAP),))
            return (out, total + cnt), None

        (out, total), _ = jax.lax.scan(
            body, (out0, jnp.zeros((), I)), jnp.arange(NCH, dtype=I))
        return out[:100].sum().astype(F) * 1e-30 + c

    timed("compact 44M: chunked sort+dus stream", f_comp_stream,
          jnp.zeros(()), max(1, args.reps // 2))


if __name__ == "__main__":
    main()
