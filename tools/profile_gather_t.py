"""Gather output-layout costs at the 262k shape (krec 16MB, 3.93M rows)."""
import time
import jax
import jax.numpy as jnp
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dem_engine_tpu.utils import compile_cache
compile_cache.enable()
from dem_engine_tpu.defines import F, I
from dem_engine_tpu.ops import forces
import numpy as np

N = 262144
CAP = 3932160
rng = np.random.default_rng(0)
krec0 = jnp.asarray(rng.normal(size=(N, 16)), F)
idx0 = jnp.asarray(rng.integers(0, N, CAP), I)
idx_sorted = jnp.sort(idx0)

def timed(name, fn, x0, *consts, reps=10):
    def loop(x, *cs):
        y, _ = jax.lax.scan(lambda c, _: (fn(c, *cs), None), x, length=reps)
        return y
    g = jax.jit(loop)
    y = g(x0, *consts)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), y)
    t0 = time.perf_counter()
    y = g(x0, *consts)
    s = sum(float(l.sum()) for l in jax.tree_util.tree_leaves(y)
            if l.dtype != jnp.int32)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {dt:.2f} ms  (chk {s:.3e})", flush=True)

def chain(k, val):
    return k * 1.000001 + val * 1e-30

timed("plain f32 gather cm", lambda k, i: chain(k, k[i].sum()), krec0, idx0)
timed("i16 gather + T (fm out)", lambda k, i: chain(k, forces.gather_rows(k, i).T.sum()), krec0, idx0)
timed("plain f32 gather + T", lambda k, i: chain(k, (k[i].T).sum()), krec0, idx0)
timed("i16 gather+T, sorted idx", lambda k, i: chain(k, forces.gather_rows(k, i).T.sum()), krec0, idx_sorted)

timed("i16 gather NO T (cap,16)", lambda k, i: chain(k, forces.gather_rows(k, i).sum()), krec0, idx0)
big = jnp.asarray(np.random.default_rng(1).normal(size=(CAP, 16)), F)
timed("transpose alone (cap,16)->(16,cap)", lambda k, b: chain(k, b.T.sum()), krec0, big)
timed("krecT build (concat+T)", lambda k, i: chain(k, jnp.concatenate([k, jnp.zeros((2048, 16), F)], axis=0).T.sum()), krec0, idx0)
timed("merged 2x gather+T", lambda k, i: chain(k, forces.gather_rows(k, jnp.concatenate([i, i])).T.sum()), krec0, idx0)
