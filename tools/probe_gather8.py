"""i8/i16/i32 bitcast row-gather shootout at the 262k shape."""
import time
import jax
import jax.numpy as jnp
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dem_engine_tpu.utils import compile_cache
compile_cache.enable()
from dem_engine_tpu.defines import F, I
import numpy as np

N = 262144
CAP = 3932160
rng = np.random.default_rng(0)
krec0 = jnp.asarray(rng.normal(size=(N, 16)), F)
idx0 = jnp.asarray(rng.integers(0, N, CAP), I)

def timed(name, fn, x0, *consts, reps=10):
    def loop(x, *cs):
        y, _ = jax.lax.scan(lambda c, _: (fn(c, *cs), None), x, length=reps)
        return y
    g = jax.jit(loop)
    y = g(x0, *consts)
    float(jax.tree_util.tree_leaves(y)[0].sum())
    t0 = time.perf_counter()
    y = g(x0, *consts)
    s = sum(float(l.sum()) for l in jax.tree_util.tree_leaves(y)
            if l.dtype != jnp.int32)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {dt:.2f} ms  (chk {s:.3e})", flush=True)

def chain(k, val):
    return k * 1.000001 + val * 1e-30

def g8(k, i):
    kb = jax.lax.bitcast_convert_type(k, jnp.int8).reshape(N, 64)
    g = kb[i]
    return jax.lax.bitcast_convert_type(
        g.reshape(CAP, 16, 4), jnp.float32).T.sum()

def g16(k, i):
    kb = jax.lax.bitcast_convert_type(k, jnp.int16).reshape(N, 32)
    g = kb[i]
    return jax.lax.bitcast_convert_type(
        g.reshape(CAP, 16, 2), jnp.float32).T.sum()

def g32(k, i):
    g = jax.lax.bitcast_convert_type(k, jnp.int32)[i]
    return jax.lax.bitcast_convert_type(g, jnp.float32).T.sum()

def g16w(k, i):
    # two half-width gathers (rows split) - does row WIDTH matter at i16?
    kb = jax.lax.bitcast_convert_type(k, jnp.int16).reshape(N, 32)
    a = kb[:, :16][i]
    b = kb[:, 16:][i]
    return (jax.lax.bitcast_convert_type(
        jnp.concatenate([a, b], axis=1).reshape(CAP, 16, 2),
        jnp.float32).T.sum())

timed("i8 gather+T", lambda k, i: chain(k, g8(k, i)), krec0, idx0)
timed("i16 gather+T", lambda k, i: chain(k, g16(k, i)), krec0, idx0)
timed("i32 gather+T", lambda k, i: chain(k, g32(k, i)), krec0, idx0)
timed("2x half-row i16", lambda k, i: chain(k, g16w(k, i)), krec0, idx0)
