"""One-hot MXU segment-reduce vs XLA segment_sum (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from dem_engine_tpu.defines import F, I
from dem_engine_tpu.ops.pallas_segred import seg_sum_sorted


def _case(cap, n_owners, density, seed=0):
    rng = np.random.default_rng(seed)
    n_live = int(cap * density)
    ids = np.sort(rng.integers(0, n_owners, n_live))
    ids = np.concatenate([ids, np.full(cap - n_live, n_owners)])
    rec = rng.normal(size=(cap, 6)).astype(np.float32)
    rec[n_live:] = 0.0
    return jnp.asarray(rec), jnp.asarray(ids.astype(np.int32))


def test_matches_segment_sum_dense():
    cap, n = 4096, 700
    rec, ids = _case(cap, n, 0.8)
    out, spill = seg_sum_sorted(rec, ids, n, interpret=True, tile=256,
                                owin=512)
    assert not bool(spill)
    ref = jax.ops.segment_sum(rec, ids, num_segments=n + 1,
                              indices_are_sorted=True)[:n]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_dead_tail_does_not_spill():
    cap, n = 2048, 300
    rec, ids = _case(cap, n, 0.3)
    out, spill = seg_sum_sorted(rec, ids, n, interpret=True, tile=256,
                                owin=512)
    assert not bool(spill)
    ref = jax.ops.segment_sum(rec, ids, num_segments=n + 1,
                              indices_are_sorted=True)[:n]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_sparse_table_spills():
    # a tile spanning far more owners than the window must flag
    cap, n = 1024, 100_000
    rng = np.random.default_rng(1)
    ids = np.sort(rng.integers(0, n, cap)).astype(np.int32)
    rec = jnp.ones((cap, 6), F)
    out, spill = seg_sum_sorted(rec, jnp.asarray(ids), n, interpret=True,
                                tile=256, owin=512)
    assert bool(spill)
