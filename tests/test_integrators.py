"""Velocity pass-on semantics of the three integrators, pinned against
closed-form free fall (reference DEMCustomizablePolicies/
IntegrationVelPassOn{ForwardEuler,CenteredDiff,ExtendedTaylor}.cu):

    FORWARD_EULER       x += v_old * h           (old velocity)
    CENTERED_DIFFERENCE x += (v_old + g h) * h   (new velocity)
    EXTENDED_TAYLOR     x += (v_old + g h/2) * h (midpoint)
"""

import dataclasses

import numpy as np

from dem_engine_tpu.defines import TimeIntegrator
from dem_engine_tpu.initializer import (
    make_owners,
    make_params,
    make_spheres,
    make_state,
)
from dem_engine_tpu.models import HertzianForceModel
from dem_engine_tpu.solver import dynamics_step, refresh_contacts
from dem_engine_tpu.state import SolverConfig

H = 1e-3
G = -9.81
V0 = 0.3


def _one_step(integ):
    owners = make_owners(
        pos=np.asarray([[0.5, 0.5, 0.5]]), voxel_size=1.0 / 2**16,
        vel=np.asarray([[0.0, 0.0, V0]]),
        mass=np.asarray([1.0]), moi=np.ones((1, 3)),
    )
    spheres = make_spheres(owner=[0], relpos=np.zeros((1, 3)),
                           radius=np.asarray([0.01]))
    cfg = SolverConfig(
        voxel_size=1.0 / 2**16, integrator=integ,
        force_model=HertzianForceModel(), cap_ss=8, cap_st=8, cap_sa=8,
    )
    params = make_params(
        h=H, gravity=[0.0, 0.0, G], domain=[1.0, 1.0, 1.0],
        materials={"E": np.asarray([1e7], np.float32),
                   "nu": np.asarray([0.3], np.float32)},
        pair_materials={"CoR": np.asarray([[0.5]], np.float32),
                        "mu": np.asarray([[0.3]], np.float32),
                        "Crr": np.asarray([[0.0]], np.float32)},
        update_freq=5,
    )
    state = make_state(owners, spheres, cfg)
    state = refresh_contacts(state, params, cfg)
    new = dynamics_step(state, params, cfg)
    from dem_engine_tpu.ops import voxel

    z0 = float(voxel.decode_f32(state.owners.vox, state.owners.loc,
                                cfg.voxel_size)[0, 2])
    z1 = float(voxel.decode_f32(new.owners.vox, new.owners.loc,
                                cfg.voxel_size)[0, 2])
    v1 = float(new.owners.vel[0, 2])
    return z1 - z0, v1


def test_forward_euler_uses_old_velocity():
    dz, v1 = _one_step(TimeIntegrator.FORWARD_EULER)
    np.testing.assert_allclose(dz, V0 * H, rtol=1e-4)
    np.testing.assert_allclose(v1, V0 + G * H, rtol=1e-5)


def test_centered_difference_uses_new_velocity():
    dz, v1 = _one_step(TimeIntegrator.CENTERED_DIFFERENCE)
    np.testing.assert_allclose(dz, (V0 + G * H) * H, rtol=1e-4)
    np.testing.assert_allclose(v1, V0 + G * H, rtol=1e-5)


def test_extended_taylor_uses_midpoint_velocity():
    dz, v1 = _one_step(TimeIntegrator.EXTENDED_TAYLOR)
    np.testing.assert_allclose(dz, (V0 + 0.5 * G * H) * H, rtol=1e-4)
    np.testing.assert_allclose(v1, V0 + G * H, rtol=1e-5)
