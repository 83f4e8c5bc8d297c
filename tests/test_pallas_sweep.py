"""Pallas candidate-sweep kernel: correctness vs the XLA gather sweep
(interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from dem_engine_tpu.defines import F, I
from dem_engine_tpu.ops import binning
from dem_engine_tpu.ops.pallas_sweep import find_pairs_ss_pallas


def _random_spheres(n, seed=0, box=0.25, r=0.012):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0.03, box - 0.03, size=(n, 3)).astype(np.float32)
    reach = np.full(n, r, np.float32) * rng.uniform(0.8, 1.2, n).astype(
        np.float32
    )
    owner = np.arange(n, dtype=np.int32)
    family = rng.integers(0, 3, n).astype(np.int32)
    return (
        jnp.asarray(pos), jnp.asarray(reach), jnp.asarray(owner),
        jnp.asarray(family),
    )


def _pairs_set(idA, idB, n):
    a = np.asarray(idA)
    b = np.asarray(idB)
    live = a >= 0
    return set(zip(a[live][:n].tolist(), b[live][:n].tolist()))


def test_pallas_sweep_matches_xla():
    pos, reach, owner, family = _random_spheres(700, seed=3)
    fam_mask = jnp.ones((256, 256), bool)
    # disable family pair (1,2) to exercise decode-side masking
    fam_mask = fam_mask.at[1, 2].set(False).at[2, 1].set(False)
    domain = jnp.asarray([0.25, 0.25, 0.25], F)
    bs, nb = binning.build_grid(domain, reach.max())
    cap = 8192

    a1, b1, n1, occ1, _ = binning.find_pairs_ss(
        pos, reach, owner, family, fam_mask, bs, nb, cap, 16
    )
    a2, b2, n2, occ2, _, win_ovf = find_pairs_ss_pallas(
        pos, reach, owner, family, fam_mask, bs, nb, cap, interpret=True,
        tile=64, win=256,
    )
    assert not bool(win_ovf)
    s1 = _pairs_set(a1, b1, int(n1))
    s2 = _pairs_set(a2, b2, int(n2))
    assert int(n1) == len(s1) and int(n2) == len(s2)
    assert s1 == s2, (
        f"xla={len(s1)} pallas={len(s2)} "
        f"missing={list(s1 - s2)[:5]} extra={list(s2 - s1)[:5]}"
    )
    assert len(s1) > 100  # the test actually exercised contacts


def test_pallas_sweep_dense_cluster():
    """Dense cluster: windows near-full, same-bin dedup exercised hard."""
    rng = np.random.default_rng(7)
    n = 320
    pos = (0.5 + rng.uniform(-0.03, 0.03, size=(n, 3))).astype(np.float32)
    reach = np.full(n, 0.01, np.float32)
    owner = np.arange(n, dtype=np.int32)
    family = np.zeros(n, np.int32)
    fam_mask = jnp.ones((256, 256), bool)
    domain = jnp.asarray([1.0, 1.0, 1.0], F)
    bs, nb = binning.build_grid(domain, jnp.asarray(reach).max())
    cap = 1 << 16
    a1, b1, n1, occ1, _ = binning.find_pairs_ss(
        jnp.asarray(pos), jnp.asarray(reach), jnp.asarray(owner),
        jnp.asarray(family), fam_mask, bs, nb, cap, 64,
    )
    a2, b2, n2, occ2, _, win_ovf = find_pairs_ss_pallas(
        jnp.asarray(pos), jnp.asarray(reach), jnp.asarray(owner),
        jnp.asarray(family), fam_mask, bs, nb, cap, interpret=True,
        tile=64, win=320,
    )
    # occupancy here exceeds the kernel's MPB=16: the kernel must FLAG it
    # via bin occupancy so the engine can fall back / grow
    if int(occ1) <= 16:
        assert _pairs_set(a1, b1, int(n1)) == _pairs_set(a2, b2, int(n2))


def test_pallas_sweep_v2_matches_xla():
    from dem_engine_tpu.ops.pallas_sweep2 import find_pairs_ss_pallas2

    pos, reach, owner, family = _random_spheres(700, seed=5)
    fam_mask = jnp.ones((256, 256), bool)
    domain = jnp.asarray([0.25, 0.25, 0.25], F)
    bs, nb = binning.build_grid(domain, reach.max())
    cap = 8192
    a1, b1, n1, occ1, _ = binning.find_pairs_ss(
        pos, reach, owner, family, fam_mask, bs, nb, cap, 16
    )
    a2, b2, n2, occ2, _, win_ovf = find_pairs_ss_pallas2(
        pos, reach, owner, family, fam_mask, bs, nb, cap, interpret=True,
        tile=64, win=256,
    )
    assert not bool(win_ovf)
    s1 = _pairs_set(a1, b1, int(n1))
    s2 = _pairs_set(a2, b2, int(n2))
    assert s1 == s2, (len(s1), len(s2))
    assert len(s1) > 100
