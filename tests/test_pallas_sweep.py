"""Pallas candidate-sweep kernel: correctness vs the XLA gather sweep
(interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from dem_engine_tpu.defines import F, I
from dem_engine_tpu.ops import binning


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
        tile=64, win=512,
    )
    assert not bool(win_ovf)
    s1 = _pairs_set(a1, b1, int(n1))
    s2 = _pairs_set(a2, b2, int(n2))
    assert s1 == s2, (len(s1), len(s2))
    assert len(s1) > 100
