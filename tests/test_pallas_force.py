"""Fused Pallas force pass vs the XLA contact_pass path (interpret mode).

A random dense pile of 2-sphere clumps with real overlaps, velocities and
spins; one refresh, then a dynamics step through both paths must produce
the same owner wrenches, integrated state and contact wildcards.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dem_engine_tpu.defines import TimeIntegrator
from dem_engine_tpu.initializer import (
    make_owners,
    make_params,
    make_spheres,
    make_state,
)
from dem_engine_tpu.models import (
    HertzianForceModel,
    HertzianFrictionlessForceModel,
)
from dem_engine_tpu.solver import dynamics_step, refresh_contacts
from dem_engine_tpu.state import SolverConfig

R = 0.01


def _build(n_clumps, model, seed=0, cap_ss=2048):
    rng = np.random.default_rng(seed)
    # dense-ish packing in a small box so there are real overlaps
    side = max(2, int(np.ceil(n_clumps ** (1 / 3))))
    g = np.stack(
        np.meshgrid(*[np.arange(side)] * 3, indexing="ij"), axis=-1
    ).reshape(-1, 3)[:n_clumps]
    pos = 0.1 + g * (1.9 * R) + rng.uniform(-0.2 * R, 0.2 * R, (n_clumps, 3))
    quat = rng.normal(size=(n_clumps, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    owners = make_owners(
        pos=pos,
        voxel_size=1.0 / 2**16,
        quat=quat,
        vel=rng.uniform(-0.5, 0.5, (n_clumps, 3)),
        omg=rng.uniform(-5.0, 5.0, (n_clumps, 3)),
        family=np.zeros(n_clumps, np.int64),
        mass=np.full(n_clumps, 1e-2),
        moi=np.full((n_clumps, 3), 1e-6),
    )
    # 2 spheres per clump, offset along body x
    owner_ids = np.repeat(np.arange(n_clumps), 2)
    rel = np.tile(np.asarray([[0.5 * R, 0, 0], [-0.5 * R, 0, 0]]),
                  (n_clumps, 1))
    spheres = make_spheres(
        owner=owner_ids,
        relpos=rel,
        radius=np.full(2 * n_clumps, R) * rng.uniform(
            0.9, 1.1, 2 * n_clumps),
        mat=np.zeros(2 * n_clumps),
    )
    cfg = SolverConfig(
        voxel_size=1.0 / 2**16,
        integrator=TimeIntegrator.CENTERED_DIFFERENCE,
        force_model=model,
        cap_ss=cap_ss,
        cap_st=8,
        cap_sa=8,
        reduce_mode="segment",
    )
    params = make_params(
        h=5e-6,
        gravity=[0.0, 0.0, -9.81],
        domain=[1.0, 1.0, 1.0],
        materials={"E": np.asarray([1e7], np.float32),
                   "nu": np.asarray([0.3], np.float32)},
        pair_materials={
            "CoR": np.asarray([[0.5]], np.float32),
            "mu": np.asarray([[0.4]], np.float32),
            "Crr": np.asarray([[0.02]], np.float32),
        },
        update_freq=5,
    )
    state = make_state(owners, spheres, cfg)
    return state, params, cfg


def _run_both(model, n_clumps=60, steps=3, seed=1):
    state, params, cfg = _build(n_clumps, model, seed=seed)
    cfg_fused = dataclasses.replace(cfg, use_fused_force=True)
    # each leg refreshes under its own cfg: fused layouts only exist on
    # use_fused_force tables (and those skip the wide XLA statics)
    s_x = refresh_contacts(state, params, cfg)
    s_f = refresh_contacts(state, params, cfg_fused)
    assert int(s_x.ss.count) > 10, "test needs real contacts"
    for _ in range(steps):
        s_x = dynamics_step(s_x, params, cfg)
        s_f = dynamics_step(s_f, params, cfg_fused)
    return s_x, s_f


def _close(a, b, tol=2e-4):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = np.maximum(np.abs(a).max(), 1e-12)
    err = np.abs(a - b).max() / scale
    assert err < tol, (err, scale)


def test_fused_matches_xla_full_hertz():
    s_x, s_f = _run_both(HertzianForceModel())
    _close(s_x.owners.vel, s_f.owners.vel)
    _close(s_x.owners.omg, s_f.owners.omg)
    assert np.array_equal(np.asarray(s_x.owners.vox),
                          np.asarray(s_f.owners.vox))
    _close(s_x.owners.loc, s_f.owners.loc, tol=1e-3)
    for k in s_x.ss.wildcards:
        _close(s_x.ss.wildcards[k], s_f.ss.wildcards[k], tol=1e-3)


def test_fused_matches_xla_frictionless():
    s_x, s_f = _run_both(HertzianFrictionlessForceModel())
    _close(s_x.owners.vel, s_f.owners.vel)
    _close(s_x.owners.omg, s_f.owners.omg)


def test_fused_across_refresh_and_unaligned_cap():
    """History carry across a refresh + a capacity that is not a multiple
    of the kernel chunk (pad path)."""
    model = HertzianForceModel()
    state, params, cfg = _build(40, model, seed=3, cap_ss=1000)
    cfg_fused = dataclasses.replace(cfg, use_fused_force=True)
    s_x = refresh_contacts(state, params, cfg)
    s_f = refresh_contacts(state, params, cfg_fused)
    for r in range(2):
        for _ in range(2):
            s_x = dynamics_step(s_x, params, cfg)
            s_f = dynamics_step(s_f, params, cfg_fused)
        s_x = refresh_contacts(s_x, params, cfg)
        s_f = refresh_contacts(s_f, params, cfg_fused)
    _close(s_x.owners.vel, s_f.owners.vel, tol=1e-3)
    for k in s_x.ss.wildcards:
        _close(s_x.ss.wildcards[k], s_f.ss.wildcards[k], tol=1e-3)


def test_fused_matches_xla_ratio3_radii():
    """Parity at strongly polydisperse radii (the GRC ratio-3 shape):
    20% of spheres 3x larger, deep initial overlaps included."""
    from dem_engine_tpu.defines import F

    model = HertzianForceModel()
    state, params, cfg = _build(60, model, seed=9, cap_ss=8192)
    rng = np.random.default_rng(9)
    scale = np.where(rng.uniform(size=int(state.spheres.n)) < 0.8, 1.0, 3.0)
    state = state.replace(
        spheres=state.spheres.replace(
            radius=state.spheres.radius * jnp.asarray(scale, F)
        )
    )
    cfg_fused = dataclasses.replace(cfg, use_fused_force=True)
    s_x = refresh_contacts(state, params, cfg)
    s_f = refresh_contacts(state, params, cfg_fused)
    assert int(s_x.ss.count) > 30
    for _ in range(2):
        s_x = dynamics_step(s_x, params, cfg)
        s_f = dynamics_step(s_f, params, cfg_fused)
    _close(s_x.owners.vel, s_f.owners.vel, tol=1e-3)
    _close(s_x.owners.omg, s_f.owners.omg, tol=1e-3)
    for k in s_x.ss.wildcards:
        _close(s_x.ss.wildcards[k], s_f.ss.wildcards[k], tol=1e-3)


def test_fused_extras_match_xla_across_block_boundaries():
    """Per-contact extras (force/torque/cpoint) from the extras pass must
    match the XLA contact_pass for EVERY live row — including rows in
    512-chunks shared between adjacent 128-owner blocks, which the kernel
    must merge rather than overwrite (regression: shared-chunk rows of the
    previous block were zeroed)."""
    from dem_engine_tpu.ops import forces as _forces
    from dem_engine_tpu.ops.pallas_force import OB, fused_step_ss

    model = HertzianForceModel()
    # 300 owners -> 3 owner blocks at OB=128; plenty of unaligned
    # block boundaries inside shared chunks
    state, params, cfg = _build(300, model, seed=5, cap_ss=4096)
    assert state.owners.n > 2 * OB
    cfg_fused = dataclasses.replace(cfg, use_fused_force=True)
    s_x = refresh_contacts(state, params, cfg)
    s_f = refresh_contacts(state, params, cfg_fused)
    assert int(s_x.ss.count) > 500

    # XLA reference per-contact fields
    p = _forces.contact_pass(
        "ss", s_x.ss, s_x.owners, s_x.spheres, s_x.tris,
        s_x.anals, params, s_x.time, cfg.voxel_size, model,
        krec=_forces.pack_kinematics(s_x.owners),
    )
    t_x = p["table"]

    krec = _forces.pack_kinematics(s_f.owners, world_omg=True)
    _, _, t_f = fused_step_ss(
        s_f.ss, s_f.owners, params, cfg.voxel_size, model, krec,
        extras=True,
    )
    live = np.asarray(s_x.ss.idA) >= 0
    assert live.sum() > 500
    for name in ("force", "torque", "cpoint"):
        a = np.asarray(getattr(t_x, name))[live]
        b = np.asarray(getattr(t_f, name))[live]
        _close(a, b, tol=2e-4)
    # dead rows must be exactly zero (no uninitialized kernel output)
    for name in ("force", "torque", "cpoint"):
        assert np.all(np.asarray(getattr(t_f, name))[~live] == 0.0)


def test_gather_rows_T_chunked_matches():
    """The column-streamed layout gather (1M-fit path, VERDICT r3 #2)
    is bit-identical to the one-shot gather+transpose, including the
    overlapping final chunk."""
    import numpy as np

    from dem_engine_tpu.defines import F, I
    from dem_engine_tpu.ops import forces

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(300, 16)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 300, size=1000), I)
    ref = forces.gather_rows(tab, idx).T
    for chunk in (128, 256, 999, 1000):
        got = forces.gather_rows_T(tab, idx, chunk=chunk)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_slim_table_has_no_premix():
    """Fused/slim SS tables carry no premix dict (the kernel reads the
    effective moduli from fstat rows); the XLA table keeps it."""
    import dataclasses

    from tools.check_fused_tpu import build
    from dem_engine_tpu.solver import refresh_contacts

    state, params, cfg = build(64)
    st_f = jax.jit(lambda s, p: refresh_contacts(s, p, cfg))(state, params)
    assert st_f.ss.premix == {}
    cfg_x = dataclasses.replace(cfg, use_fused_force=False)
    from dem_engine_tpu.initializer import empty_ss_table

    state_x = state.replace(ss=empty_ss_table(cfg_x, cfg_x.cap_ss))
    st_x = jax.jit(lambda s, p: refresh_contacts(s, p, cfg_x))(
        state_x, params)
    assert "E:a" in st_x.ss.premix
