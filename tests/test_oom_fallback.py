"""Device-OOM degradation: the engine drops uniq-fetch, then the fused
force pass, and retries losslessly when a compiled program raises
RESOURCE_EXHAUSTED (observed on the 16 GB chip at the 1M-clump refresh —
the HBM model is calibrated, not exact). Reference analogue: DEME grows
arrays with explicit OOM checks (DataMigrationHelper.hpp) but has no
runtime degrade; on TPU the fixed-capacity design makes retry cheap."""

import dataclasses

import numpy as np

from dem_engine_tpu.defines import TimeIntegrator
from dem_engine_tpu.models import HertzianForceModel
from dem_engine_tpu.solver import Engine, _is_device_oom
from dem_engine_tpu.state import SolverConfig
from dem_engine_tpu.initializer import (
    make_owners, make_params, make_spheres, make_state)

R = 0.01


def _case(**cfg_kw):
    cfg_kw.setdefault("cap_ss", 64)
    cfg = SolverConfig(
        voxel_size=1.0 / 2**16,
        integrator=TimeIntegrator.CENTERED_DIFFERENCE,
        force_model=HertzianForceModel(),
        cap_sa=8, cap_st=8,
        **cfg_kw,
    )
    mass = 2500 * 4 / 3 * np.pi * R**3
    n = 4
    pos = np.asarray([[0.4 + 0.019 * i, 0.5, 0.5] for i in range(n)])
    owners = make_owners(
        pos=pos, voxel_size=cfg.voxel_size,
        mass=np.full(n, mass), moi=np.full((n, 3), 0.4 * mass * R * R),
    )
    spheres = make_spheres(owner=list(range(n)),
                           relpos=np.zeros((n, 3)), radius=np.full(n, R))
    state = make_state(owners, spheres, cfg)
    mats = ({"E": np.asarray([1e8], np.float32),
             "nu": np.asarray([0.3], np.float32)},
            {"CoR": np.asarray([[0.5]], np.float32),
             "mu": np.asarray([[0.4]], np.float32),
             "Crr": np.asarray([[0.0]], np.float32)})
    params = make_params(h=1e-6, gravity=[0, 0, 0], domain=[1, 1, 1],
                         materials=mats[0], pair_materials=mats[1],
                         update_freq=10)
    return cfg, state, params


class _FakeOOM(RuntimeError):
    def __repr__(self):
        return "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted)."


def test_is_device_oom_matcher():
    assert _is_device_oom(_FakeOOM())
    assert not _is_device_oom(ValueError("shape mismatch"))


def test_refresh_oom_degrades_and_completes():
    """First refresh attempt OOMs -> engine flips use_fused_force off and
    the run completes with identical physics to a clean engine."""
    cfg, state, params = _case(use_fused_force=True)
    eng = Engine(cfg)

    real_get = eng._get_refresh
    fails = {"n": 1}

    def failing_get(st, pp):
        fn = real_get(st, pp)
        if fails["n"]:
            fails["n"] -= 1

            def boom(*a):
                raise _FakeOOM()
            return boom
        return fn

    eng._get_refresh = failing_get
    out = eng.advance(state, params, 30, update_freq=10)
    assert not eng.cfg.use_fused_force  # degraded
    assert fails["n"] == 0

    cfg2, state2, params2 = _case(use_fused_force=False)
    ref = Engine(cfg2).advance(state2, params2, 30, update_freq=10)
    np.testing.assert_allclose(np.asarray(out.owners.vel),
                               np.asarray(ref.owners.vel), atol=1e-7)


def test_chunk_loop_oom_rewinds_and_degrades():
    """A device OOM inside the fused run_chunks dispatch rewinds to the
    retained pre-chunk state (no donation on that jit) and retries with
    the degraded config — physics identical to a clean non-fused run."""
    cfg, state, params = _case(use_fused_force=True)
    eng = Engine(cfg)
    eng.fuse = 1  # keep the program count low on CPU

    real_fn = eng._chunks_fn
    fails = {"n": 1}

    def failing(n_chunks, k, st, pp):
        fn = real_fn(n_chunks, k, st, pp)
        if fails["n"]:
            fails["n"] -= 1

            def boom(*a):
                raise _FakeOOM()
            return boom
        return fn

    eng._chunks_fn = failing
    out = eng.advance(state, params, 30, update_freq=10)
    assert fails["n"] == 0
    assert not eng.cfg.use_fused_force

    cfg2, state2, params2 = _case(use_fused_force=False)
    ref = Engine(cfg2).advance(state2, params2, 30, update_freq=10)
    np.testing.assert_allclose(np.asarray(out.owners.vel),
                               np.asarray(ref.owners.vel), atol=1e-7)


def test_uniq_fetch_dropped_before_fused_pass():
    """With uniq-fetch on, the first OOM only disables uniq_cap; the
    second disables the fused pass; a third finds nothing left to drop."""
    cfg, state, params = _case(use_fused_force=True, uniq_cap=64)
    eng = Engine(cfg)
    assert eng._oom_degrade()
    assert eng.cfg.uniq_cap == 0 and eng.cfg.use_fused_force
    assert eng._oom_degrade()
    assert not eng.cfg.use_fused_force
    assert not eng._oom_degrade()


def test_hbm_gate_degrades_before_dispatch(monkeypatch):
    """The pre-dispatch HBM model gate (VERDICT r4 #4/#8) walks the same
    lossless ladder BEFORE any program is dispatched: a projected peak
    above the gate drops uniq first, then the fused layouts, without an
    OOM round-trip."""
    import dem_engine_tpu.solver as solver_mod

    cfg, state, params = _case(use_fused_force=True, uniq_cap=64)
    eng = Engine(cfg)

    real = solver_mod.estimate_hbm_peak

    def inflated(st, c):
        m = real(st, c)
        # fabricate a peak that only fits once BOTH uniq and the fused
        # layouts are gone (uniq term + a fused-layout surcharge)
        over = 0.0
        if c.uniq_cap:
            over += 0.5 * m["hbm"]
        if c.use_fused_force:
            over += 0.5 * m["hbm"]
        m = dict(m)
        m["peak"] = 0.5 * m["hbm"] + over
        return m

    monkeypatch.setattr(solver_mod, "estimate_hbm_peak", inflated)
    out = eng.advance(state, params, 30, update_freq=10)
    assert eng.cfg.uniq_cap == 0
    assert not eng.cfg.use_fused_force
    assert eng.timers["oom_degrades"] == 2

    cfg2, state2, params2 = _case(use_fused_force=False)
    ref = Engine(cfg2).advance(state2, params2, 30, update_freq=10)
    np.testing.assert_allclose(np.asarray(out.owners.vel),
                               np.asarray(ref.owners.vel), atol=1e-7)


def test_hbm_gate_dies_politely_when_nothing_left(monkeypatch):
    """When even the fully-degraded config cannot fit, the engine raises
    a diagnostic RuntimeError instead of dispatching a program that
    would crash the TPU worker (the reference errors out in-kernel:
    DEMContactKernels_SphereSphere.cu:121-126)."""
    import pytest

    import dem_engine_tpu.solver as solver_mod

    cfg, state, params = _case(use_fused_force=False)
    eng = Engine(cfg)

    real = solver_mod.estimate_hbm_peak

    def hopeless(st, c):
        m = dict(real(st, c))
        m["peak"] = 2.0 * m["hbm"]
        return m

    monkeypatch.setattr(solver_mod, "estimate_hbm_peak", hopeless)
    with pytest.raises(RuntimeError, match="exceeds device HBM"):
        eng.advance(state, params, 30, update_freq=10)


def test_uniq_gate_priced_by_model():
    """The uniq-fetch gate decision comes from the priced uniq transient
    (estimate_hbm_peak), not a capacity constant: the model's peak with
    uniq on strictly exceeds the peak with it off at the same shape."""
    from dem_engine_tpu.solver import estimate_hbm_peak

    cfg, state, params = _case(use_fused_force=True, uniq_cap=64)
    with_u = estimate_hbm_peak(state, cfg)
    without = estimate_hbm_peak(
        state, dataclasses.replace(cfg, uniq_cap=0))
    assert with_u["uniq_transient"] > 0
    assert with_u["peak"] > without["peak"]
    # XLA fallback sweep slab is priced too (worker-crash guard)
    nosweep = estimate_hbm_peak(
        state, dataclasses.replace(cfg, use_pallas_sweep=False,
                                   cd_chunk=0))
    assert nosweep["sweep_transient"] > 0


def test_relayout_oom_walks_to_next_rung():
    """Round-4 1M-bench failure mode: the refresh OOMs, and the RECOVERY
    relayout's own allocations OOM too (the device is at the edge). The
    ladder must walk to the next rung (fused off -> tiny layout) instead
    of propagating the second RESOURCE_EXHAUSTED."""
    cfg, state, params = _case(use_fused_force=True, uniq_cap=64)
    eng = Engine(cfg)

    real_get = eng._get_refresh
    fails = {"refresh": 1, "relayout": 1}

    def failing_get(st, pp):
        fn = real_get(st, pp)
        if fails["refresh"]:
            fails["refresh"] -= 1

            def boom(*a):
                raise _FakeOOM()
            return boom
        return fn

    real_relayout = eng._relayout_ss

    def failing_relayout(st):
        if fails["relayout"]:
            fails["relayout"] -= 1
            raise _FakeOOM()
        return real_relayout(st)

    eng._get_refresh = failing_get
    eng._relayout_ss = failing_relayout
    out = eng.advance(state, params, 30, update_freq=10)
    assert fails == {"refresh": 0, "relayout": 0}
    # rung 1 (uniq off) was consumed by the refresh OOM, rung 2 (fused
    # off) by the failed relayout
    assert eng.cfg.uniq_cap == 0
    assert not eng.cfg.use_fused_force

    cfg2, state2, params2 = _case(use_fused_force=False)
    ref = Engine(cfg2).advance(state2, params2, 30, update_freq=10)
    np.testing.assert_allclose(np.asarray(out.owners.vel),
                               np.asarray(ref.owners.vel), atol=1e-7)


def test_hbm_gate_shrinks_cap_to_admit_uniq(monkeypatch):
    """When the gate trips with uniq-fetch on, the engine first tries
    trimming SS capacity slack (to 1.18x the live contact count) — every
    cap row costs ~1.2 kB across the doubled state + refresh transient,
    so a slack-heavy table prices uniq out of HBM where a tight one
    keeps it (the 1M-clump shape: uniq replaces 259 ms/step of direct
    other-side gathers). Only when trimming cannot fit does it fall to
    the uniq-off rung."""
    import dem_engine_tpu.solver as solver_mod

    cfg, state, params = _case(use_fused_force=True, uniq_cap=64,
                               cap_ss=2048)
    eng = Engine(cfg)
    # establish live contacts (3 overlapping pairs) so count > 0
    state = eng.advance(state, params, 10, update_freq=10)
    assert int(state.ss.count) > 0
    if eng.cfg.cap_ss <= 512:  # maybe_shrink already trimmed: re-pad
        eng.cfg = dataclasses.replace(eng.cfg, cap_ss=2048)
        eng._build()
        state = eng._replace_tables(state, ss=state.ss.grown(2048))

    real = solver_mod.estimate_hbm_peak
    fake_hbm = {}

    def tight(st, c):
        m = dict(real(st, c))
        if "v" not in fake_hbm:
            # first call: trip the 0.96 gate by ~2% at the CURRENT cap
            fake_hbm["v"] = m["peak"] / (0.96 * 1.02)
        m["hbm"] = fake_hbm["v"]
        return m

    monkeypatch.setattr(solver_mod, "estimate_hbm_peak", tight)
    out = eng._enforce_hbm(state)
    assert eng.cfg.uniq_cap == 64, "uniq-fetch must survive"
    assert eng.cfg.cap_ss == 512, "cap trimmed to the 1.18x-count floor"
    assert eng.timers["oom_degrades"] == 0
    assert out.ss.cap == 512
    # the trimmed state still steps (dead rows trail the live ones)
    monkeypatch.setattr(solver_mod, "estimate_hbm_peak", real)
    out = eng.advance(out, params, 10, update_freq=10)
    assert int(out.ss.count) > 0


def test_hbm_gate_uniq_admit_churn_guard(monkeypatch):
    """A capacity growth within 2 CD epochs of an admit-shrink means the
    contact count is rising: the rung disables itself (each grow/shrink
    cycle is a fresh multi-minute refresh compile at scale) and the
    gate falls back to dropping uniq."""
    import dem_engine_tpu.solver as solver_mod
    from dem_engine_tpu.state import OVF_SS_CAP

    cfg, state, params = _case(use_fused_force=True, uniq_cap=64,
                               cap_ss=2048)
    eng = Engine(cfg)
    state = eng.advance(state, params, 10, update_freq=10)
    if eng.cfg.cap_ss <= 512:
        eng.cfg = dataclasses.replace(eng.cfg, cap_ss=2048)
        eng._build()
        state = eng._replace_tables(state, ss=state.ss.grown(2048))

    real = solver_mod.estimate_hbm_peak
    fake_hbm = {}

    def tight(st, c):
        m = dict(real(st, c))
        if "v" not in fake_hbm:
            fake_hbm["v"] = m["peak"] / (0.96 * 1.02)
        m["hbm"] = fake_hbm["v"]
        return m

    monkeypatch.setattr(solver_mod, "estimate_hbm_peak", tight)
    state = eng._enforce_hbm(state)
    assert eng.cfg.uniq_cap == 64 and eng.cfg.cap_ss == 512
    # an immediate growth marks a rising-count regime
    state = eng.grow_for(state, OVF_SS_CAP)
    assert eng._uniq_admit_off
    # next gate trip must NOT re-shrink: uniq is dropped instead
    fake_hbm.clear()
    state = eng._enforce_hbm(state)
    assert eng.cfg.uniq_cap == 0


def test_hbm_gate_uniq_drop_is_readmitted(monkeypatch):
    """A uniq drop by the pre-dispatch MODEL gate (e.g. at init, count
    unknown) is reversible: once live contacts exist and the model fits
    uniq at a trimmed capacity, the entry gate re-admits it. A drop by
    a REAL device OOM stays off."""
    import dem_engine_tpu.solver as solver_mod

    cfg, state, params = _case(use_fused_force=True, uniq_cap=64,
                               cap_ss=2048)
    eng = Engine(cfg)
    # gate-drop at count == 0 (the init-time situation)
    assert int(state.ss.count) == 0
    real = solver_mod.estimate_hbm_peak
    trip = {"on": True}

    def tight(st, c):
        m = dict(real(st, c))
        if trip["on"] and c.uniq_cap:
            m["peak"] = 2.0 * m["hbm"]  # uniq-on config cannot fit
        return m

    monkeypatch.setattr(solver_mod, "estimate_hbm_peak", tight)
    state = eng._enforce_hbm(state)
    assert eng.cfg.uniq_cap == 0 and eng._uniq_gate_dropped
    # establish contacts, then lift the pressure: re-admitted + trimmed
    trip["on"] = False
    state = eng.advance(state, params, 10, update_freq=10)
    assert int(state.ss.count) > 0
    state = eng._enforce_hbm(state)
    assert eng.cfg.uniq_cap == 64, "gate-dropped uniq must be re-admitted"
    assert eng.cfg.cap_ss == 512
    assert state.ss.uidx.shape[0] == 512  # uniq arrays re-allocated
    # ...and the engine still steps with the re-admitted layout
    state = eng.advance(state, params, 10, update_freq=10)
    assert int(state.ss.count) > 0

    # a REAL OOM drop is permanent
    eng2 = Engine(dataclasses.replace(cfg, uniq_cap=64))
    assert eng2._oom_degrade()  # default reason: device RESOURCE_EXHAUSTED
    assert eng2._uniq_admit_off and not eng2._uniq_gate_dropped
