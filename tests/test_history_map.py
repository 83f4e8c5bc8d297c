"""Unit coverage for ops/history.py's sort-merge contact mapping — the
TPU replacement for the reference's buildPersistentMap
(DEMHistoryMappingKernels.cu:17): randomized parity against a brute-force
dict match, including padding and persistency re-injection."""

import numpy as np
import jax.numpy as jnp
import pytest

from dem_engine_tpu.defines import F, I
from dem_engine_tpu.ops.history import _merge_match, carry_history
from dem_engine_tpu.state import ContactTable


def _rand_table(rng, cap, n_live, n_geo=40):
    """Unique random (idA, idB) pairs, live entries compacted to front."""
    pairs = set()
    while len(pairs) < n_live:
        pairs.add((int(rng.integers(0, n_geo)),
                   int(rng.integers(0, n_geo))))
    pairs = sorted(pairs)
    idA = np.full(cap, -1, np.int32)
    idB = np.full(cap, -1, np.int32)
    for i, (a, b) in enumerate(pairs):
        idA[i], idB[i] = a, b
    return idA, idB


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_merge_match_brute_parity(seed):
    rng = np.random.default_rng(seed)
    cap_old, cap_new = 96, 128
    oA, oB = _rand_table(rng, cap_old, 60)
    nA, nB = _rand_table(rng, cap_new, 70)
    mapping, old_matched = _merge_match(
        jnp.asarray(oA), jnp.asarray(oB), jnp.asarray(nA), jnp.asarray(nB))
    mapping = np.asarray(mapping)
    old_matched = np.asarray(old_matched)

    lut = {(a, b): i for i, (a, b) in enumerate(zip(oA, oB)) if a >= 0}
    hit = np.zeros(cap_old, bool)
    for j in range(cap_new):
        if nA[j] < 0:
            continue
        want = lut.get((nA[j], nB[j]), -1)
        assert mapping[j] == want, (j, nA[j], nB[j], mapping[j], want)
        if want >= 0:
            hit[want] = True
    # live old rows: matched iff some live new row has the same key
    live_old = oA >= 0
    assert (old_matched[live_old] == hit[live_old]).all()


def test_carry_history_persistency_reinject():
    """Old persistent contacts not re-detected are appended after the new
    live entries, history intact (reference persistency path,
    dT.cpp:601-802)."""
    cap = 16
    oA = np.full(cap, -1, np.int32)
    oB = np.full(cap, -1, np.int32)
    # old: (0,1) persistent w/ history, (2,3) plain w/ history, (4,5) plain
    oA[:3] = [0, 2, 4]
    oB[:3] = [1, 3, 5]
    persist = np.zeros(cap, np.int32)
    persist[0] = 1
    wc = np.zeros(cap, np.float32)
    wc[:2] = [7.5, 3.25]
    old = ContactTable.empty(cap, wildcard_names=("w",))
    old = old.replace(
        idA=jnp.asarray(oA), idB=jnp.asarray(oB),
        persist=jnp.asarray(persist), count=jnp.asarray(3, I),
        wildcards={"w": jnp.asarray(wc)})

    # new detection: only (2,3) and a fresh (6,7)
    nA = np.full(cap, -1, np.int32)
    nB = np.full(cap, -1, np.int32)
    nA[:2] = [2, 6]
    nB[:2] = [3, 7]
    tab, n_lost = carry_history(
        old, jnp.asarray(nA), jnp.asarray(nB), jnp.asarray(2, I),
        ("w",), use_persistency=True)

    idA = np.asarray(tab.idA)
    idB = np.asarray(tab.idB)
    w = np.asarray(tab.wildcards["w"])
    # matched (2,3) carries its history
    assert w[0] == np.float32(3.25)
    # fresh (6,7) starts clean
    assert w[1] == 0.0
    # persistent (0,1) re-injected at slot new_count=2 with history
    assert int(tab.count) == 3
    assert (idA[2], idB[2]) == (0, 1)
    assert w[2] == np.float32(7.5)
    assert int(np.asarray(tab.persist)[2]) == 1
    # (4,5) had no history -> not counted lost; nothing else lost
    assert int(n_lost) == 0


def test_carry_history_lost_sentry_counts_dropped_history():
    """A non-persistent old contact with nonzero wildcards that is not
    re-detected increments the lost counter (dT.cpp:2040-2144 sentry)."""
    cap = 8
    old = ContactTable.empty(cap, wildcard_names=("w",))
    oA = np.full(cap, -1, np.int32)
    oB = np.full(cap, -1, np.int32)
    oA[0], oB[0] = 1, 2
    wc = np.zeros(cap, np.float32)
    wc[0] = 0.5
    old = old.replace(idA=jnp.asarray(oA), idB=jnp.asarray(oB),
                      count=jnp.asarray(1, I),
                      wildcards={"w": jnp.asarray(wc)})
    nA = np.full(cap, -1, np.int32)
    nB = np.full(cap, -1, np.int32)
    _, n_lost = carry_history(
        old, jnp.asarray(nA), jnp.asarray(nB), jnp.asarray(0, I),
        ("w",), use_persistency=False)
    assert int(n_lost) == 1
