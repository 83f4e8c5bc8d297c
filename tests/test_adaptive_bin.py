"""Adaptive bin-size factor (VERDICT r3 #6): the traced multiplier above
the 2*max(reach) cell floor, the SetBinSize/SetInitBinSize wiring, the
engine's OVF_BIN_OCC walk-back, and the hill-climb tuner."""

import jax.numpy as jnp
import numpy as np
import pytest

from dem_engine_tpu.defines import F
from dem_engine_tpu.ops import binning
from dem_engine_tpu.state import OVF_BIN_OCC


def test_build_grid_factor_scales_and_clamps():
    domain = jnp.asarray([1.0, 1.0, 1.0], F)
    bs1, nb1 = binning.build_grid(domain, jnp.asarray(0.01, F))
    bs2, nb2 = binning.build_grid(domain, jnp.asarray(0.01, F),
                                  jnp.asarray(2.0, F))
    assert float(bs2) == pytest.approx(2.0 * float(bs1), rel=1e-6)
    assert int(nb2[0]) <= -(-int(nb1[0]) // 2) + 1
    # below-floor factors clamp to 1 (a smaller cell would miss pairs)
    bs3, _ = binning.build_grid(domain, jnp.asarray(0.01, F),
                                jnp.asarray(0.25, F))
    assert float(bs3) == pytest.approx(float(bs1), rel=1e-6)


def test_pairs_identical_across_factors():
    """The candidate pair set must be factor-invariant (bigger cells only
    change occupancy, never coverage)."""
    rng = np.random.default_rng(7)
    n = 400
    pos = jnp.asarray(rng.uniform(0.05, 0.95, (n, 3)), F)
    reach = jnp.asarray(np.full(n, 0.02), F)
    owner = jnp.arange(n, dtype=jnp.int32)
    family = jnp.zeros(n, jnp.int32)
    mask = jnp.ones((256, 256), bool)
    domain = jnp.asarray([1.0, 1.0, 1.0], F)

    def pairs(factor):
        bs, nb = binning.build_grid(domain, reach.max(),
                                    jnp.asarray(factor, F))
        idA, idB, cnt, occ, _ = binning.find_pairs_ss(
            pos, reach, owner, family, mask, bs, nb, 65536, 128)
        a, b = np.asarray(idA), np.asarray(idB)
        live = a >= 0
        return set(zip(a[live].tolist(), b[live].tolist()))

    p1 = pairs(1.0)
    assert p1 == pairs(1.7)
    assert p1 == pairs(3.0)


def _make_sim(n=60):
    from dem_engine_tpu.api import DEMSolver

    rng = np.random.default_rng(3)
    sim = DEMSolver()
    sim.InstructBoxDomainDimension(0.4, 0.4, 0.3)
    mat = sim.LoadMaterial({"E": 1e7, "nu": 0.3, "CoR": 0.4,
                            "mu": 0.4, "Crr": 0.0})
    tmpl = sim.LoadSphereType(0.008**3 * 2.6e3, 0.008, mat)
    sim.AddClumps(tmpl, rng.uniform(0.05, 0.35, (n, 3)) * [1, 1, 0.5])
    sim.AddBCPlane([0.2, 0.2, 0.02], [0, 0, 1], mat)
    sim.SetInitTimeStep(5e-6)
    sim.SetGravitationalAcceleration([0, 0, -9.81])
    sim.SetCDUpdateFreq(10)
    return sim


def test_setbinsize_sets_factor_and_warns_below_floor():
    sim = _make_sim()
    sim.SetInitBinSize(0.08)  # pre-init: stored, applied at Initialize
    sim.Initialize()
    floor = sim._bin_floor()
    assert sim.engine.bin_factor == pytest.approx(0.08 / floor, rel=1e-6)
    got = sim.GetBinSize()
    assert got == pytest.approx(0.08, rel=0.05)

    with pytest.warns(UserWarning, match="below the one-bin-per-sphere"):
        sim.SetBinSize(1e-5)
    assert sim.engine.bin_factor == 1.0
    assert not sim.engine.auto_bin


def test_adaptive_flag_reaches_engine():
    sim = _make_sim()
    sim.UseAdaptiveBinSize(True)
    sim.Initialize()
    assert sim.engine.auto_bin
    sim.UseAdaptiveBinSize(False)
    assert not sim.engine.auto_bin


def test_occupancy_overflow_walks_factor_back():
    """A forced-bad (oversized) bin recovers the Pallas sweep by walking
    the factor toward 1.0 instead of disabling the sweep (VERDICT r3 #6
    done-criterion)."""
    from __graft_entry__ import _build_case
    from dem_engine_tpu.solver import Engine

    cfg, state, params = _build_case(16, use_pallas_sweep=True)
    eng = Engine(cfg)
    eng.bin_factor = 4.0
    state = eng.grow_for(state, OVF_BIN_OCC)
    assert eng.cfg.use_pallas_sweep  # sweep survives
    assert eng.bin_factor == pytest.approx(2.5)
    state = eng.grow_for(state, OVF_BIN_OCC)
    state = eng.grow_for(state, OVF_BIN_OCC)
    assert eng.bin_factor == 1.0
    # at the floor the old ladder takes over
    state = eng.grow_for(state, OVF_BIN_OCC)
    assert not eng.cfg.use_pallas_sweep


def test_oversized_bin_simulation_matches_floor():
    """End-to-end: a user-fixed oversized bin must not change physics."""
    sim_a = _make_sim()
    sim_a.Initialize()
    sim_b = _make_sim()
    sim_b.SetBinSize(0.1)
    sim_b.Initialize()
    sim_a.DoDynamics(2e-3)
    sim_b.DoDynamics(2e-3)
    pa = np.asarray(sim_a.GetOwnerPosition())
    pb = np.asarray(sim_b.GetOwnerPosition())
    np.testing.assert_allclose(pa, pb, rtol=0, atol=1e-6)


def test_propose_bin_walks_toward_best():
    from __graft_entry__ import _build_case
    from dem_engine_tpu.solver import Engine

    cfg, state, params = _build_case(16)
    eng = Engine(cfg)
    eng.auto_bin = True
    # unmeasured neighbors are explored first
    eng.bin_factor = 1.3
    eng._bin_perf = {1.3: 1.0}
    nxt = eng._propose_bin()
    assert nxt in (1.0, 1.7)
    # with all neighbors measured, walk toward the cheapest
    eng._bin_perf = {1.0: 0.5, 1.3: 1.0, 1.7: 2.0}
    assert eng._propose_bin() == 1.0
    eng.bin_factor = 1.0
    eng._bin_perf = {1.0: 0.5, 1.3: 1.0, 1.7: 2.0}
    assert eng._propose_bin() == 1.0
