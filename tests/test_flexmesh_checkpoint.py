"""Deformable mesh updates (DEMdemo_FlexibleMesh), exact checkpointing,
ChangeClumpSizes, and the orbit custom-model demo."""

import sys

import numpy as np
import pytest

import dem_engine_tpu as dem

sys.path.insert(0, "examples")


def test_flexible_mesh_update():
    """Mesh nodes moved mid-sim push a resting sphere (SetTriNodeRelPos /
    UpdateMesh parity)."""
    solver = dem.DEMSolver()
    solver.SetVerbosity("QUIET")
    solver.InstructBoxDomainDimension(1, 1, 1)
    mat = solver.LoadMaterial({"E": 1e8, "nu": 0.3, "CoR": 0.3, "mu": 0.3,
                               "Crr": 0.0})
    r = 0.01
    m = 2500 * 4 / 3 * np.pi * r**3
    tmpl = solver.LoadSphereType(m, r, mat)
    solver.AddClumps(tmpl, np.asarray([[0.02, -0.02, r - 2e-6]]))
    # flat 2-triangle platform at z=0 (mesh local frame)
    verts = np.asarray(
        [[-0.1, -0.1, 0], [0.1, -0.1, 0], [0.1, 0.1, 0], [-0.1, 0.1, 0.0]]
    )
    faces = np.asarray([[0, 1, 2], [0, 2, 3]])
    mesh = dem.DEMMeshConnected(vertices=verts.copy(), faces=faces)
    mesh.SetMaterial(mat)
    mesh.SetFamily(255)
    solver.AddWavefrontMeshObject(mesh)
    solver.SetInitTimeStep(2e-6)
    solver.SetGravitationalAcceleration([0, 0, -9.81])
    solver.Initialize()
    trk = solver.Track(mesh)
    solver.DoDynamics(0.004)  # settle on the platform
    z0 = solver.GetOwnerPosition()[0, 2]
    # raise the platform by 5 mm via node update
    trk.UpdateMesh(verts + np.asarray([0, 0, 0.005]))
    solver.DoDynamics(0.05)
    z1 = solver.GetOwnerPosition()[0, 2]
    assert z1 > z0 + 0.003, (z0, z1)


def test_exact_checkpoint_roundtrip():
    solver = dem.DEMSolver()
    solver.SetVerbosity("QUIET")
    solver.InstructBoxDomainDimension(0.4, 0.4, 0.4)
    solver.InstructBoxDomainBoundingBC("all")
    mat = solver.LoadMaterial({"E": 1e8, "nu": 0.3, "CoR": 0.4, "mu": 0.4,
                               "Crr": 0.0})
    r = 0.01
    m = 2500 * 4 / 3 * np.pi * r**3
    tmpl = solver.LoadSphereType(m, r, mat)
    pts = dem.DEMBoxGridSampler([0, 0, -0.15], [0.04, 0.04, 0.03], 0.022)
    solver.AddClumps(tmpl, pts)
    solver.SetInitTimeStep(5e-6)
    solver.SetGravitationalAcceleration([0, 0, -9.81])
    solver.Initialize()
    solver.DoDynamics(0.03)
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        ck = os.path.join(td, "state.npz")
        solver.SaveCheckpoint(ck)
        p_ref = solver.GetOwnerPosition()
        solver.DoDynamics(0.02)
        p_after = solver.GetOwnerPosition()
        solver.LoadCheckpoint(ck)
        np.testing.assert_array_equal(solver.GetOwnerPosition(), p_ref)
        # deterministic replay from the checkpoint
        solver.DoDynamics(0.02)
        np.testing.assert_allclose(
            solver.GetOwnerPosition(), p_after, atol=1e-7
        )


def test_change_clump_sizes():
    solver = dem.DEMSolver()
    solver.SetVerbosity("QUIET")
    solver.InstructBoxDomainDimension(1, 1, 1)
    mat = solver.LoadMaterial({"E": 1e8, "nu": 0.3, "CoR": 0.4, "mu": 0.0,
                               "Crr": 0.0})
    tmpl = solver.LoadSphereType(0.01, 0.01, mat)
    solver.AddClumps(tmpl, np.asarray([[0.0, 0.0, 0.0], [0.05, 0.0, 0.0]]))
    solver.SetInitTimeStep(1e-5)
    solver.SetGravitationalAcceleration([0, 0, 0])
    solver.Initialize()
    solver.ChangeClumpSizes([1], [2.0])
    rad = np.asarray(solver.state.spheres.radius)
    np.testing.assert_allclose(rad, [0.01, 0.02])


def test_solar_system_orbit():
    from solar_system import build

    solver, r_orbit, v_circ = build()
    period = 2 * np.pi * r_orbit / v_circ
    solver.DoDynamics(period / 4)
    p = solver.GetOwnerPosition()
    rad = np.linalg.norm(p[1] - p[0])
    # circular orbit preserved within a few percent over a quarter period
    np.testing.assert_allclose(rad, r_orbit, rtol=0.05)
    # planet has swept ~90 degrees
    ang = np.arctan2(p[1][1] - p[0][1], p[1][0] - p[0][0])
    assert 0.8 * np.pi / 2 < ang < 1.2 * np.pi / 2, ang
