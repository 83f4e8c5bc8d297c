"""Unique-other-owner fetch mode of the fused force pass.

With cfg.uniq_cap > 0 the refresh builds per-owner-block unique
other-owner lists (ContactTable.uniq_a/uniq_b) and per-row local indices
(uidx/uidx_b); the step gathers only unique kinematic records and the
kernel expands them with a one-hot matmul. The expansion is an exact row
select, so the step must match the direct-gather fused path bit-for-bit
(up to f32 summation identity — same operations, same order).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from dem_engine_tpu.ops.pallas_force import OB
from dem_engine_tpu.solver import Engine, dynamics_step, refresh_contacts
from dem_engine_tpu.state import OVF_UNIQ
from dem_engine_tpu.models import HertzianForceModel

from test_pallas_force import _build, _close


def _refresh(state, params, cfg):
    return refresh_contacts(state, params, cfg)


def test_uniq_layout_structures():
    """uidx/uniq lists reconstruct own_b exactly for every live row."""
    model = HertzianForceModel()
    state, params, cfg = _build(60, model, seed=2)
    cfg_u = dataclasses.replace(cfg, use_fused_force=True, uniq_cap=64)
    state = _refresh_with_uniq(state, params, cfg_u)
    tbl = state.ss
    n_owners = state.owners.n
    live = np.asarray(tbl.idA) >= 0
    own_a = np.asarray(tbl.own_a)
    own_b = np.asarray(tbl.own_b)
    uidx = np.asarray(tbl.uidx).astype(np.int64)
    uniq_a = np.asarray(tbl.uniq_a)
    assert int(tbl.uniq_max) <= 64
    # every live row's (block, uidx) slot holds its own_b
    blk = own_a[live] // OB
    got = uniq_a[blk * 64 + uidx[live]]
    np.testing.assert_array_equal(got, own_b[live])
    # B layout symmetric
    obs = np.asarray(tbl.own_b_sorted)
    oab = np.asarray(tbl.own_a_b)
    live_b = obs < n_owners
    uidx_b = np.asarray(tbl.uidx_b).astype(np.int64)
    uniq_b = np.asarray(tbl.uniq_b)
    got_b = uniq_b[(obs[live_b] // OB) * 64 + uidx_b[live_b]]
    np.testing.assert_array_equal(got_b, oab[live_b])


def _refresh_with_uniq(state, params, cfg_u):
    # state built without uniq arrays must be re-made with the right
    # pytree sizes: rebuild through make_state-equivalent empty tables
    from dem_engine_tpu.state import ContactTable
    from dem_engine_tpu.ops.forces import premix_names

    uniq_rows = -(-state.owners.n // OB) * cfg_u.uniq_cap
    ss = ContactTable.empty(
        cfg_u.cap_ss, cfg_u.force_model.contact_wildcards,
        premix_names(cfg_u.force_model), fused=True,
        slim=cfg_u.use_fused_force, uniq_rows=uniq_rows,
    )
    state = state.replace(ss=ss)
    return _refresh(state, params, cfg_u)


def test_uniq_step_matches_direct_fused():
    model = HertzianForceModel()
    state, params, cfg = _build(60, model, seed=1)
    cfg_f = dataclasses.replace(cfg, use_fused_force=True)
    cfg_u = dataclasses.replace(cfg_f, uniq_cap=64)
    s_d = _refresh(state, params, cfg_f)
    s_u = _refresh_with_uniq(state, params, cfg_u)
    assert int(s_u.ss.count) > 10
    assert not int(s_u.overflow) & OVF_UNIQ
    for _ in range(3):
        s_d = dynamics_step(s_d, params, cfg_f)
        s_u = dynamics_step(s_u, params, cfg_u)
    _close(s_d.owners.vel, s_u.owners.vel, tol=1e-6)
    _close(s_d.owners.omg, s_u.owners.omg, tol=1e-6)
    np.testing.assert_array_equal(np.asarray(s_d.owners.vox),
                                  np.asarray(s_u.owners.vox))
    for k in s_d.ss.wildcards:
        _close(s_d.ss.wildcards[k], s_u.ss.wildcards[k], tol=1e-6)


def test_uniq_extras_pass_matches_direct():
    """The per-contact extras stream (query support: forces/cpoints) must
    agree between unique-fetch and direct-gather modes."""
    import jax

    from dem_engine_tpu.ops import forces as _forces
    from dem_engine_tpu.ops.pallas_force import fused_step_ss

    model = HertzianForceModel()
    state, params, cfg = _build(60, model, seed=5)
    cfg_f = dataclasses.replace(cfg, use_fused_force=True)
    cfg_u = dataclasses.replace(cfg_f, uniq_cap=64)
    s_d = _refresh(state, params, cfg_f)
    s_u = _refresh_with_uniq(state, params, cfg_u)

    def extras(s):
        krec = _forces.pack_kinematics(s.owners, world_omg=True)
        _, _, tbl = fused_step_ss(
            s.ss, s.owners, params, cfg.voxel_size, model, krec,
            extras=True)
        return tbl

    t_d = jax.jit(extras)(s_d)
    t_u = jax.jit(extras)(s_u)
    n = int(t_d.count)  # rows past count are never written by any block
    _close(t_d.force[:n], t_u.force[:n], tol=1e-6)
    _close(t_d.cpoint[:n], t_u.cpoint[:n], tol=1e-6)


def test_uniq_overflow_flag_and_engine_growth():
    model = HertzianForceModel()
    state, params, cfg = _build(60, model, seed=4)
    cfg_u = dataclasses.replace(cfg, use_fused_force=True, uniq_cap=2)
    s = _refresh_with_uniq(state, params, cfg_u)
    assert int(s.overflow) & OVF_UNIQ  # 2 unique others/block is too few

    # the engine's refresh loop grows uniq_cap until it fits
    eng = Engine(cfg_u)
    state2, params2, _ = _build(60, model, seed=4)
    state2 = _refresh_with_uniq_state_only(state2, cfg_u)
    state2 = eng.refresh(state2, params2)
    assert eng.cfg.uniq_cap > 2
    assert not (int(state2.overflow) & OVF_UNIQ)
    # and the grown state steps fine
    state2 = dynamics_step(state2, params2, eng.cfg)
    assert np.isfinite(np.asarray(state2.owners.vel)).all()


def test_uniq_survives_capacity_shrink():
    """maybe_shrink runs between refresh and steps; the sliced uidx rows
    must stay aligned with the surviving (live-first) table rows."""
    model = HertzianForceModel()
    state, params, cfg = _build(60, model, seed=1)
    cfg_f = dataclasses.replace(cfg, use_fused_force=True)
    cfg_u = dataclasses.replace(cfg_f, uniq_cap=64)
    s_d = _refresh(state, params, cfg_f)
    s_u = _refresh_with_uniq(state, params, cfg_u)
    new_cap = 1024  # < the build cap of 2048, > live count
    assert int(s_u.ss.count) < new_cap
    s_d = s_d.replace(ss=s_d.ss.shrunk(new_cap))
    s_u = s_u.replace(ss=s_u.ss.shrunk(new_cap))
    cfg_f2 = dataclasses.replace(cfg_f, cap_ss=new_cap)
    cfg_u2 = dataclasses.replace(cfg_u, cap_ss=new_cap)
    for _ in range(2):
        s_d = dynamics_step(s_d, params, cfg_f2)
        s_u = dynamics_step(s_u, params, cfg_u2)
    _close(s_d.owners.vel, s_u.owners.vel, tol=1e-6)
    for k in s_d.ss.wildcards:
        _close(s_d.ss.wildcards[k], s_u.ss.wildcards[k], tol=1e-6)


def _refresh_with_uniq_state_only(state, cfg_u):
    from dem_engine_tpu.state import ContactTable
    from dem_engine_tpu.ops.forces import premix_names

    uniq_rows = -(-state.owners.n // OB) * cfg_u.uniq_cap
    ss = ContactTable.empty(
        cfg_u.cap_ss, cfg_u.force_model.contact_wildcards,
        premix_names(cfg_u.force_model), fused=True,
        slim=cfg_u.use_fused_force, uniq_rows=uniq_rows,
    )
    return state.replace(ss=ss)
