"""Friction and multi-body settling integration tests.

The rolling-transition test is a classic analytic benchmark: a sphere
sliding on a frictional plane converts slip to rolling; momentum balance
gives v_final = 5/7 v0 regardless of mu. It exercises the tangential
history spring, the Coulomb clamp, the torque reduction path, and history
carry across contact-table refreshes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dem_engine_tpu.defines import ANAL_PLANE, TimeIntegrator
from dem_engine_tpu.initializer import (
    make_analyticals,
    make_owners,
    make_params,
    make_spheres,
    make_state,
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
        cap_st=8,
        cap_sa=64,
    )
    base.update(kw)
    return SolverConfig(**base)


def _mats(E=1e9, cor=0.5, mu=0.5, crr=0.0):
    return (
        {"E": np.asarray([E], np.float32), "nu": np.asarray([NU], np.float32)},
        {
            "CoR": np.asarray([[cor]], np.float32),
            "mu": np.asarray([[mu]], np.float32),
            "Crr": np.asarray([[crr]], np.float32),
        },
    )


def _plane_floor(owners_main, cfg, z_plane=0.1, center=(0.5, 0.5)):
    plane_owner = make_owners(
        pos=np.asarray([[center[0], center[1], z_plane]]),
        voxel_size=cfg.voxel_size,
        family=[255],
        mass=[1e30],
        moi=np.full((1, 3), 1e30),
    )
    owners = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=0), owners_main, plane_owner
    )
    plane_idx = owners.n - 1
    anals = make_analyticals(
        owner=[plane_idx], objtype=[ANAL_PLANE], relpos=np.zeros((1, 3)),
        direction=[[0.0, 0.0, 1.0]], size=np.zeros((1, 3)), normal_sign=[1.0],
    )
    return owners, anals


def test_slide_to_roll():
    """Sliding sphere on frictional plane -> rolls at 5/7 of initial speed."""
    cfg = _cfg()
    mass = RHO * 4 / 3 * np.pi * R**3
    moi = 2 / 5 * mass * R**2
    z_plane = 0.1
    # start at static Hertz equilibrium overlap
    delta_eq = 1.4e-6
    v0 = 0.2
    owners = make_owners(
        pos=np.asarray([[0.3, 0.5, z_plane + R - delta_eq]]),
        voxel_size=cfg.voxel_size,
        vel=np.asarray([[v0, 0, 0]]),
        mass=[mass],
        moi=np.full((1, 3), moi),
    )
    owners, anals = _plane_floor(owners, cfg, z_plane)
    spheres = make_spheres(owner=[0], relpos=np.zeros((1, 3)), radius=[R])
    state = make_state(owners, spheres, cfg, anals=anals)
    mats, pairs = _mats(cor=0.3, mu=0.5)
    h = 2e-6
    params = make_params(
        h=h, gravity=[0, 0, -9.81], domain=[1, 1, 1],
        materials=mats, pair_materials=pairs, update_freq=25,
    )
    eng = Engine(cfg)
    state = eng.advance(state, params, 9000, update_freq=25)
    v = float(state.owners.vel[0, 0])
    w = float(state.owners.omg[0, 1])
    np.testing.assert_allclose(v, 5.0 / 7.0 * v0, rtol=0.05)
    # rolling without slipping: w * R == v
    np.testing.assert_allclose(w * R, v, rtol=0.05)


def test_settling_bed():
    """A 4x4x3 grid of spheres settles in a box without blowup/tunneling."""
    cfg = _cfg(cap_ss=2048, cap_sa=1024)
    mass = RHO * 4 / 3 * np.pi * R**3
    moi = 2 / 5 * mass * R**2
    z_plane = 0.05
    nx, ny, nz = 4, 4, 3
    xs = 0.5 + (np.arange(nx) - (nx - 1) / 2) * 2.2 * R
    ys = 0.5 + (np.arange(ny) - (ny - 1) / 2) * 2.2 * R
    zs = z_plane + R * 1.05 + np.arange(nz) * 2.2 * R
    g = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), -1).reshape(-1, 3)
    rng = np.random.default_rng(3)
    g[:, :2] += rng.uniform(-0.1 * R, 0.1 * R, size=(g.shape[0], 2))
    n = g.shape[0]
    owners = make_owners(
        pos=g, voxel_size=cfg.voxel_size,
        mass=np.full(n, mass), moi=np.full((n, 3), moi),
    )
    owners, anals = _plane_floor(owners, cfg, z_plane)
    spheres = make_spheres(
        owner=np.arange(n), relpos=np.zeros((n, 3)), radius=np.full(n, R)
    )
    state = make_state(owners, spheres, cfg, anals=anals)
    mats, pairs = _mats(cor=0.4, mu=0.4)
    h = 5e-6
    params = make_params(
        h=h, gravity=[0, 0, -9.81], domain=[1, 1, 1],
        materials=mats, pair_materials=pairs, update_freq=20,
    )
    eng = Engine(cfg)
    state = eng.advance(state, params, 12000, update_freq=20)
    pos = voxel.decode_host(
        np.asarray(state.owners.vox), np.asarray(state.owners.loc),
        cfg.voxel_size,
    )[:n]
    vel = np.asarray(state.owners.vel)[:n]
    assert np.isfinite(pos).all() and np.isfinite(vel).all()
    # nothing tunneled through the floor
    assert (pos[:, 2] > z_plane + R - 5e-4).all(), pos[:, 2].min()
    # bed height bounded: at most nz+1 layers
    assert pos[:, 2].max() < z_plane + (nz + 1) * 2 * R
    # settled: low residual speed
    assert np.abs(vel).max() < 0.25, np.abs(vel).max()
    # contacts exist (bed is packed)
    assert int(state.ss.count) > n // 2
