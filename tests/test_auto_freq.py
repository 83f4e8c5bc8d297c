"""Adaptive CD-cadence tuner (reference AccumStepUpdater, dT.h:721-753 /
dT.cpp:2276-2299): the engine measures wall seconds/step per CD frequency K
between fused superchunks and walks a quantized K ladder toward the
cheapest rung, bounded by the user's SetCDMaxUpdateFreq."""

import numpy as np
import pytest

from __graft_entry__ import _build_case
from dem_engine_tpu.solver import Engine


@pytest.fixture(scope="module")
def tiny_engine():
    cfg, state, params = _build_case(n_clumps=32, update_freq=5)
    return Engine(cfg), state, params


def test_propose_k_explores_unmeasured_neighbors(tiny_engine):
    eng, _, _ = tiny_engine
    eng._k_perf = {8: 1.0}
    # from 8, both neighbors (5 and 12) are unmeasured -> explore one
    k = eng._propose_k(8, remaining=10**6)
    assert k in (5, 12)


def test_propose_k_walks_toward_cheapest_rung(tiny_engine):
    eng, _, _ = tiny_engine
    # 25 measured cheapest: from 8 (all neighbors measured) step UP one rung
    eng._k_perf = {5: 3.0, 8: 2.0, 12: 1.5, 25: 1.0}
    assert eng._propose_k(8, remaining=10**6) == 12
    # already at the best rung with measured neighbors: stay
    eng._k_perf = {12: 2.0, 18: 1.0, 25: 1.5}
    assert eng._propose_k(18, remaining=10**6) == 18
    # cheapest below: step DOWN one rung
    eng._k_perf = {5: 0.5, 8: 1.0, 12: 2.0}
    assert eng._propose_k(8, remaining=10**6) == 5


def test_propose_k_respects_user_max_freq(tiny_engine):
    eng, _, _ = tiny_engine
    eng.max_freq = 12  # SetCDMaxUpdateFreq bound
    eng._k_perf = {5: 3.0, 8: 2.0, 12: 1.5, 25: 1.0}
    for start in (5, 8, 12):
        for _ in range(6):
            start = eng._propose_k(start, remaining=10**6)
            assert start <= 12
    eng.max_freq = None


def test_propose_k_respects_remaining_steps(tiny_engine):
    eng, _, _ = tiny_engine
    eng._k_perf = {5: 2.0, 8: 1.0}
    # remaining budget only fits K=5 superchunks (2*fuse*K <= remaining)
    k = eng._propose_k(5, remaining=2 * eng.fuse * 5)
    assert k == 5


def test_advance_with_auto_freq_tunes_within_ladder():
    """End-to-end: auto cadence on, a real (tiny, CPU) settling run; the
    active frequency must land on the ladder and respect the user bound."""
    cfg, state, params = _build_case(n_clumps=32, update_freq=5)
    eng = Engine(cfg, fuse=2)
    eng.auto_freq = True
    eng.max_freq = 18
    state = eng.advance(state, params, 200, update_freq=5)
    assert int(state.step) == 200
    assert eng.active_freq is None or (
        eng.active_freq in eng.K_LADDER and eng.active_freq <= 18
    )
    # the tuner recorded wall-time measurements for at least one rung
    assert all(v > 0 for v in eng._k_perf.values())
    # physics sanity: nothing exploded
    zs = np.asarray(eng_positions_z(eng, state))
    assert np.isfinite(zs).all()


def eng_positions_z(eng, state):
    from dem_engine_tpu.ops.voxel import decode_f32

    return decode_f32(
        state.owners.vox, state.owners.loc, eng.cfg.voxel_size
    )[:, 2]


def test_settle_retune_drops_stale_rungs(tiny_engine):
    """When the same K gets >20% cheaper (bed settling), stale rungs are
    dropped so the ladder re-explores — mirrored from Engine.advance's
    inline logic; this pins the _propose_k half of the contract."""
    eng, _, _ = tiny_engine
    eng._k_perf = {25: 1.0}  # everything else dropped after a settle
    k = eng._propose_k(25, remaining=10**6)
    assert k in (18, 36)  # re-explores a neighbor rather than sitting still
