"""Gather-variant shootout at 262k (scan-based, in-jit)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from dem_engine_tpu.utils import compile_cache

    compile_cache.enable()
    from __graft_entry__ import _build_case
    from dem_engine_tpu.defines import F, I
    from dem_engine_tpu.ops import forces
    from dem_engine_tpu.solver import Engine

    cfg, state, params = _build_case(n_clumps=262144, update_freq=25)
    eng = Engine(cfg)
    state = eng.refresh(state, params)
    state = eng._steps_fn(25, state, params)(state, params)
    state = eng.maybe_shrink(state)
    state = eng.refresh(state, params)
    cfg = eng.cfg
    cap = cfg.cap_ss
    N = state.owners.n
    print(f"cap={cap} N={N}", flush=True)
    R = 10

    live = state.ss.idA >= 0
    ia = np.asarray(jnp.where(live, state.ss.own_a, 0))
    ib = np.asarray(jnp.where(live, state.ss.own_b, 0))
    ia = jnp.asarray(ia)
    ib = jnp.asarray(ib)

    def timed(name, body):
        @jax.jit
        def run(x, c):
            def f(carry, _):
                g = body(carry)
                return carry + jnp.sum(g) * 1e-30, None
            y, _ = jax.lax.scan(f, x + c * 1e-30, None, length=R)
            return y.reshape(-1)[:1].sum() * 1e-30 + c

        x0 = jnp.zeros((N, 16), F)
        c = run(x0, jnp.zeros(()))
        float(c)
        t0 = time.perf_counter()
        c = run(x0, c + 1.0)
        float(c)
        dt = (time.perf_counter() - t0) / R
        print(f"{name:52s} {dt*1e3:9.2f} ms", flush=True)

    # a) both sides, (N,16) row gather
    timed("A+B gather (N,16)", lambda k: k[ia] + k[ib])

    # a2) A only
    timed("A gather (N,16)", lambda k: k[ia])

    # b) split into 2x (N,8)
    def split8(k):
        g = jnp.concatenate(
            [k[:, :8][ia], k[:, 8:][ia], k[:, :8][ib], k[:, 8:][ib]],
            axis=1)
        return g[:, :16]

    timed("A+B as 4x (N,8) gathers", split8)

    # c) width scaling: A-side only at w=4 / 8 / 12
    timed("A gather (N,4)", lambda k: k[:, :4][ia])
    timed("A gather (N,8)", lambda k: k[:, :8][ia])
    timed("A gather (N,12)", lambda k: k[:, :12][ia])

    # d) take with indices_are_sorted (A side is sorted by construction)
    def take_sorted(k):
        return jnp.take(k, ia, axis=0, indices_are_sorted=True)

    timed("A take sorted-hint (N,16)", take_sorted)

    # e) bf16 table
    def bf(k):
        kb = k.astype(jnp.bfloat16)
        return (kb[ia] + kb[ib]).astype(F)

    timed("A+B gather bf16 (N,16)", bf)

    # f) one (N,32) gather (width doubling check)
    def w32(k):
        k2 = jnp.concatenate([k, k], axis=1)
        return k2[ia][:, :16]

    timed("A gather (N,32)", w32)


if __name__ == "__main__":
    import sys as _s
    if "--extra" not in _s.argv:
        main()


def extra():
    import jax
    import jax.numpy as jnp

    from dem_engine_tpu.utils import compile_cache

    compile_cache.enable()
    from dem_engine_tpu.defines import F, I
    import numpy as np, time

    N = 262145
    CAP = 3145728
    rng = np.random.default_rng(0)
    idx_rand = jnp.asarray(rng.integers(0, N, CAP).astype(np.int32))
    idx_rep = jnp.asarray(np.sort(rng.integers(0, N, CAP).astype(np.int32)))
    # heavy repeats: one hot row gets 1% of all indexes
    hot = rng.integers(0, N, CAP).astype(np.int32)
    hot[rng.random(CAP) < 0.01] = 7
    idx_hot = jnp.asarray(hot)
    perm = jnp.asarray(rng.permutation(CAP).astype(np.int32))
    R = 10

    def timed(name, body, x0):
        @jax.jit
        def run(x, c):
            def f(carry, _):
                return carry + jnp.sum(body(carry)) * 1e-30, None
            y, _ = jax.lax.scan(f, x + c * 1e-30, None, length=R)
            return y.reshape(-1)[:1].sum() * 1e-30 + c
        c = run(x0, jnp.zeros(())); float(c)
        t0 = time.perf_counter(); c = run(x0, c + 1.0); float(c)
        print(f"{name:52s} {(time.perf_counter()-t0)/R*1e3:9.2f} ms",
              flush=True)

    k16 = jnp.zeros((N, 16), F)
    big16 = jnp.zeros((CAP, 16), F)
    timed("gather 3.1M from 262k (random idx)", lambda k: k[idx_rand], k16)
    timed("gather 3.1M from 262k (sorted/repeat idx)",
          lambda k: k[idx_rep], k16)
    timed("gather 3.1M from 262k (1% hot row)", lambda k: k[idx_hot], k16)
    timed("permute 3.1M x16w (cap table)", lambda k: k[perm], big16)


if __name__ == "__main__":
    import sys
    if "--extra" in sys.argv:
        extra()
