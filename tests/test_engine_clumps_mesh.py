"""Clump (multi-sphere rigid body) and triangle-mesh contact tests."""

import jax
import jax.numpy as jnp
import numpy as np

from dem_engine_tpu.defines import TimeIntegrator
from dem_engine_tpu.initializer import (
    make_owners,
    make_params,
    make_spheres,
    make_state,
    make_triangles,
)
from dem_engine_tpu.models import HertzianForceModel
from dem_engine_tpu.solver import Engine
from dem_engine_tpu.state import SolverConfig
from dem_engine_tpu.ops import voxel

NU = 0.3
RHO = 2500.0
R = 0.01


def _cfg(**kw):
    base = dict(
        voxel_size=1.0 / 2**16,
        integrator=TimeIntegrator.CENTERED_DIFFERENCE,
        force_model=HertzianForceModel(),
        cap_ss=64,
        cap_st=64,
        cap_sa=64,
    )
    base.update(kw)
    return SolverConfig(**base)


def _mats(E=1e9, cor=0.4, mu=0.4, crr=0.0):
    return (
        {"E": np.asarray([E], np.float32), "nu": np.asarray([NU], np.float32)},
        {
            "CoR": np.asarray([[cor]], np.float32),
            "mu": np.asarray([[mu]], np.float32),
            "Crr": np.asarray([[crr]], np.float32),
        },
    )


def _dumbbell_props():
    m_sph = RHO * 4 / 3 * np.pi * R**3
    mass = 2 * m_sph
    sep = R  # sphere centers at ±R/2... use ±R for clarity
    # spheres at (±R, 0, 0): moi about x = 2*(2/5 m r^2); about y,z add m d^2
    i_sph = 2 / 5 * m_sph * R**2
    moi = np.asarray(
        [2 * i_sph, 2 * (i_sph + m_sph * R**2), 2 * (i_sph + m_sph * R**2)]
    )
    rel = np.asarray([[-R, 0, 0], [R, 0, 0]])
    return mass, moi, rel


def test_dumbbell_settles_flat():
    """A 2-sphere clump dropped flat onto a plane settles at CoM z = R."""
    from dem_engine_tpu.defines import ANAL_PLANE
    from dem_engine_tpu.initializer import make_analyticals

    cfg = _cfg()
    mass, moi, rel = _dumbbell_props()
    z_plane = 0.1
    owners = make_owners(
        pos=np.asarray([[0.5, 0.5, z_plane + R + 0.002]]),
        voxel_size=cfg.voxel_size,
        mass=[mass], moi=moi.reshape(1, 3),
    )
    plane_owner = make_owners(
        pos=np.asarray([[0.5, 0.5, z_plane]]), voxel_size=cfg.voxel_size,
        family=[255], mass=[1e30], moi=np.full((1, 3), 1e30),
    )
    owners = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], 0), owners, plane_owner
    )
    spheres = make_spheres(owner=[0, 0], relpos=rel, radius=[R, R])
    anals = make_analyticals(
        owner=[1], objtype=[ANAL_PLANE], relpos=np.zeros((1, 3)),
        direction=[[0, 0, 1.0]], size=np.zeros((1, 3)), normal_sign=[1.0],
    )
    state = make_state(owners, spheres, cfg, anals=anals)
    mats, pairs = _mats(cor=0.3)
    params = make_params(
        h=4e-6, gravity=[0, 0, -9.81], domain=[1, 1, 1],
        materials=mats, pair_materials=pairs, update_freq=20,
    )
    eng = Engine(cfg)
    state = eng.advance(state, params, 15000, update_freq=20)
    pos = voxel.decode_host(
        np.asarray(state.owners.vox), np.asarray(state.owners.loc),
        cfg.voxel_size,
    )
    vel = np.asarray(state.owners.vel)
    assert np.abs(vel[0]).max() < 0.05
    np.testing.assert_allclose(pos[0, 2], z_plane + R, atol=3e-4)
    # quaternion still ~flat (no reason to pitch)
    q = np.asarray(state.owners.quat[0])
    assert abs(abs(q[0]) - 1.0) < 0.05


def test_clump_collision_momentum():
    """Two dumbbells collide; linear momentum conserved, energy bounded."""
    cfg = _cfg()
    mass, moi, rel = _dumbbell_props()
    v0 = 1.0
    # facing sphere surfaces start 0.01 apart; y offset makes it oblique
    owners = make_owners(
        pos=np.asarray([[0.47, 0.5, 0.5], [0.53, 0.5 + 0.005, 0.5]]),
        voxel_size=cfg.voxel_size,
        vel=np.asarray([[v0, 0, 0], [-v0, 0, 0]]),
        mass=[mass, mass], moi=np.tile(moi, (2, 1)),
    )
    spheres = make_spheres(
        owner=[0, 0, 1, 1], relpos=np.concatenate([rel, rel]),
        radius=np.full(4, R),
    )
    state = make_state(owners, spheres, cfg)
    mats, pairs = _mats(cor=0.8, mu=0.2)
    params = make_params(
        h=1e-6, gravity=[0, 0, 0], domain=[1, 1, 1],
        materials=mats, pair_materials=pairs, update_freq=40,
    )
    eng = Engine(cfg)
    e0 = float(
        0.5 * mass * (np.asarray(state.owners.vel) ** 2).sum()
    )
    state = eng.advance(state, params, 12000, update_freq=40)
    vel = np.asarray(state.owners.vel)
    omg = np.asarray(state.owners.omg)
    # rebound happened
    assert vel[0, 0] < 0 and vel[1, 0] > 0
    # linear momentum conserved
    np.testing.assert_allclose(
        (vel[0] + vel[1]) * mass, 0.0, atol=1e-4 * mass * v0 * 10
    )
    # energy must not grow
    e1 = float(
        0.5 * mass * (vel**2).sum()
        + 0.5 * ((moi[None, :] * omg**2).sum())
    )
    assert e1 <= e0 * 1.01


def _mesh_platform(z0, half=0.05, center=(0.5, 0.5)):
    cx, cy = center
    v = np.asarray(
        [
            [cx - half, cy - half, z0],
            [cx + half, cy - half, z0],
            [cx + half, cy + half, z0],
            [cx - half, cy + half, z0],
        ]
    )
    faces = np.asarray([[0, 1, 2], [0, 2, 3]])
    return v, faces


def test_mesh_bounce_restitution():
    """Sphere bouncing off a 2-triangle platform: CoR recovered."""
    cor = 0.6
    cfg = _cfg()
    m_sph = RHO * 4 / 3 * np.pi * R**3
    moi = 2 / 5 * m_sph * R**2
    z_mesh = 0.1
    drop_h = 0.004
    h = 2e-6
    # land inside triangle 0's interior, away from the shared diagonal
    owners = make_owners(
        pos=np.asarray([[0.52, 0.48, z_mesh + R + drop_h]]),
        voxel_size=cfg.voxel_size, mass=[m_sph], moi=np.full((1, 3), moi),
    )
    mesh_owner = make_owners(
        pos=np.asarray([[0.5, 0.5, z_mesh]]), voxel_size=cfg.voxel_size,
        family=[255], mass=[1e30], moi=np.full((1, 3), 1e30),
    )
    owners = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], 0), owners, mesh_owner
    )
    verts, faces = _mesh_platform(0.0)  # mesh-owner body frame: z=0 local
    verts[:, 0] -= 0.5
    verts[:, 1] -= 0.5
    nodes = verts[faces]  # (T,3,3)
    tris = make_triangles(owner=[1, 1], nodes=nodes)
    spheres = make_spheres(owner=[0], relpos=np.zeros((1, 3)), radius=[R])
    state = make_state(owners, spheres, cfg, tris=tris)
    mats, pairs = _mats(cor=cor, mu=0.0)
    params = make_params(
        h=h, gravity=[0, 0, -9.81], domain=[1, 1, 1],
        materials=mats, pair_materials=pairs, update_freq=30,
    )
    eng = Engine(cfg)
    v_imp = np.sqrt(2 * 9.81 * drop_h)
    t_fall = np.sqrt(2 * drop_h / 9.81)
    state = eng.advance(state, params, int(t_fall * 1.5 / h), update_freq=30)
    vz = float(state.owners.vel[0, 2])
    assert vz > 0, f"must bounce, vz={vz}"
    z_end = voxel.decode_host(
        np.asarray(state.owners.vox), np.asarray(state.owners.loc),
        cfg.voxel_size,
    )[0, 2]
    v_bounce = np.sqrt(vz**2 + 2 * 9.81 * (z_end - (z_mesh + R)))
    np.testing.assert_allclose(v_bounce, cor * v_imp, rtol=0.1)
