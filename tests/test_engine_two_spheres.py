"""Engine-level golden tests: two-sphere collisions and a plane bounce.

These validate the end-to-end force path against analytic expectations
(the testing strategy SURVEY.md §4 prescribes for the TPU build: golden
Hertzian values + restitution + momentum conservation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dem_engine_tpu.defines import ANAL_PLANE, TimeIntegrator
from dem_engine_tpu.initializer import (
    make_analyticals,
    make_owners,
    make_params,
    make_spheres,
    make_state,
)
from dem_engine_tpu.models import HertzianForceModel, HertzianFrictionlessForceModel
from dem_engine_tpu.solver import Engine
from dem_engine_tpu.state import SolverConfig

NU = 0.3
RHO = 2500.0
R = 0.01


def _materials(E=1e9, cor=0.9, mu=0.3, crr=0.0):
    return (
        {"E": np.asarray([E], np.float32), "nu": np.asarray([NU], np.float32)},
        {
            "CoR": np.asarray([[cor]], np.float32),
            "mu": np.asarray([[mu]], np.float32),
            "Crr": np.asarray([[crr]], np.float32),
        },
    )


def _two_sphere_setup(v0=1.0, cor=0.9, model=None, h=1e-6, E=1e9):
    model = model or HertzianForceModel()
    cfg = SolverConfig(
        voxel_size=1.0 / 2**16,
        integrator=TimeIntegrator.CENTERED_DIFFERENCE,
        force_model=model,
        cap_ss=16,
        cap_sa=8,
        cap_st=8,
    )
    mass = RHO * 4 / 3 * np.pi * R**3
    moi = 2 / 5 * mass * R**2
    gap = 2.5 * R  # center distance; 0.25 R of free flight each side
    owners = make_owners(
        pos=np.asarray([[0.5 - gap / 2, 0.5, 0.5], [0.5 + gap / 2, 0.5, 0.5]]),
        voxel_size=cfg.voxel_size,
        vel=np.asarray([[v0, 0, 0], [-v0, 0, 0]]),
        mass=np.full(2, mass),
        moi=np.full((2, 3), moi),
    )
    spheres = make_spheres(
        owner=[0, 1], relpos=np.zeros((2, 3)), radius=np.full(2, R)
    )
    state = make_state(owners, spheres, cfg)
    mats, pairs = _materials(E=E, cor=cor)
    params = make_params(
        h=h, gravity=[0, 0, 0], domain=[1, 1, 1], materials=mats,
        pair_materials=pairs, update_freq=50,
    )
    return Engine(cfg), state, params, mass


def test_head_on_restitution():
    """Two equal spheres, head-on: rebound speed ≈ CoR * approach speed."""
    cor = 0.8
    eng, state, params, mass = _two_sphere_setup(v0=1.0, cor=cor)
    state = eng.advance(state, params, 5000, update_freq=50)
    v = np.asarray(state.owners.vel)
    assert v[0, 0] < 0 and v[1, 0] > 0, f"spheres must rebound, got {v}"
    np.testing.assert_allclose(abs(v[0, 0]), cor, rtol=0.05)
    np.testing.assert_allclose(abs(v[1, 0]), cor, rtol=0.05)
    # momentum conservation
    np.testing.assert_allclose(v[0] + v[1], 0.0, atol=1e-5)


def test_head_on_frictionless_model():
    eng, state, params, mass = _two_sphere_setup(
        v0=1.0, cor=1.0, model=HertzianFrictionlessForceModel()
    )
    state = eng.advance(state, params, 5000, update_freq=50)
    v = np.asarray(state.owners.vel)
    # elastic: full speed recovered
    np.testing.assert_allclose(abs(v[0, 0]), 1.0, rtol=0.03)


def test_no_contact_no_motion():
    eng, state, params, _ = _two_sphere_setup(v0=0.0)
    state = eng.advance(state, params, 100, update_freq=20)
    v = np.asarray(state.owners.vel)
    np.testing.assert_allclose(v, 0.0, atol=1e-12)


def test_plane_bounce_restitution():
    """Sphere dropped on a plane: rebound speed ≈ CoR * impact speed,
    checked via post-bounce energy conservation (gravity acts throughout)."""
    cor = 0.7
    h = 2e-6
    model = HertzianForceModel()
    cfg = SolverConfig(
        voxel_size=1.0 / 2**16,
        integrator=TimeIntegrator.CENTERED_DIFFERENCE,
        force_model=model,
        cap_ss=8,
        cap_sa=8,
        cap_st=8,
    )
    mass = RHO * 4 / 3 * np.pi * R**3
    moi = 2 / 5 * mass * R**2
    drop_h = 0.005
    z_plane = 0.1
    owners = make_owners(
        pos=np.asarray([[0.5, 0.5, z_plane + R + drop_h]]),
        voxel_size=cfg.voxel_size,
        mass=[mass],
        moi=np.full((1, 3), moi),
    )
    plane_owner = make_owners(
        pos=np.asarray([[0.5, 0.5, z_plane]]),
        voxel_size=cfg.voxel_size,
        family=[255],
        mass=[1e30],
        moi=np.full((1, 3), 1e30),
    )
    owners = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=0), owners, plane_owner
    )
    spheres = make_spheres(owner=[0], relpos=np.zeros((1, 3)), radius=[R])
    anals = make_analyticals(
        owner=[1], objtype=[ANAL_PLANE], relpos=np.zeros((1, 3)),
        direction=[[0.0, 0.0, 1.0]], size=np.zeros((1, 3)), normal_sign=[1.0],
    )
    state = make_state(owners, spheres, cfg, anals=anals)
    mats, pairs = _materials(E=1e9, cor=cor, mu=0.0)
    params = make_params(
        h=h, gravity=[0, 0, -9.81], domain=[1, 1, 1],
        materials=mats, pair_materials=pairs,
    )
    eng = Engine(cfg)
    v_impact = np.sqrt(2 * 9.81 * drop_h)
    t_fall = np.sqrt(2 * drop_h / 9.81)
    n_steps = int((t_fall * 1.5) / h)
    state = eng.advance(state, params, n_steps, update_freq=40)
    v = np.asarray(state.owners.vel)
    assert v[0, 2] > 0, f"sphere must have bounced, vz={v[0, 2]}"
    from dem_engine_tpu.ops import voxel

    z_end = voxel.decode_host(
        np.asarray(state.owners.vox), np.asarray(state.owners.loc),
        cfg.voxel_size,
    )[0, 2]
    # energy right after leaving the plane: 0.5 v_b^2 = 0.5 v_end^2 + g dz
    v_bounce = np.sqrt(v[0, 2] ** 2 + 2 * 9.81 * (z_end - (z_plane + R)))
    np.testing.assert_allclose(v_bounce, cor * v_impact, rtol=0.1)


def test_head_on_restitution_segment_reduce():
    """Same golden test through the sorted-segment reduction path."""
    cor = 0.8
    from dem_engine_tpu.state import SolverConfig

    model = HertzianForceModel()
    cfg = SolverConfig(
        voxel_size=1.0 / 2**16,
        integrator=TimeIntegrator.CENTERED_DIFFERENCE,
        force_model=model,
        cap_ss=16, cap_sa=8, cap_st=8,
        reduce_mode="segment",
    )
    mass = RHO * 4 / 3 * np.pi * R**3
    moi = 2 / 5 * mass * R**2
    gap = 2.5 * R
    owners = make_owners(
        pos=np.asarray([[0.5 - gap / 2, 0.5, 0.5], [0.5 + gap / 2, 0.5, 0.5]]),
        voxel_size=cfg.voxel_size,
        vel=np.asarray([[1.0, 0, 0], [-1.0, 0, 0]]),
        mass=np.full(2, mass), moi=np.full((2, 3), moi),
    )
    spheres = make_spheres(owner=[0, 1], relpos=np.zeros((2, 3)),
                           radius=np.full(2, R))
    state = make_state(owners, spheres, cfg)
    mats = {"E": np.asarray([1e9], np.float32),
            "nu": np.asarray([NU], np.float32)}
    pairs = {"CoR": np.asarray([[cor]], np.float32),
             "mu": np.asarray([[0.3]], np.float32),
             "Crr": np.asarray([[0.0]], np.float32)}
    params = make_params(h=1e-6, gravity=[0, 0, 0], domain=[1, 1, 1],
                         materials=mats, pair_materials=pairs,
                         update_freq=50)
    eng = Engine(cfg)
    state = eng.advance(state, params, 5000, update_freq=50)
    v = np.asarray(state.owners.vel)
    assert v[0, 0] < 0 and v[1, 0] > 0
    np.testing.assert_allclose(abs(v[0, 0]), cor, rtol=0.05)
    np.testing.assert_allclose(v[0] + v[1], 0.0, atol=1e-5)
