"""Material pair-property overrides and sampler geometry tests."""

import numpy as np

import dem_engine_tpu as dem


def test_material_pair_override():
    """SetMaterialPropertyPair overrides the default average mixing
    (reference API.h:399-422)."""
    solver = dem.DEMSolver()
    solver.SetVerbosity("QUIET")
    solver.InstructBoxDomainDimension(1, 1, 1)
    m1 = solver.LoadMaterial({"E": 1e9, "nu": 0.3, "CoR": 1.0, "mu": 0.0,
                              "Crr": 0.0})
    m2 = solver.LoadMaterial({"E": 1e9, "nu": 0.3, "CoR": 0.2, "mu": 0.0,
                              "Crr": 0.0})
    # default mix would be 0.6; override the pair to 0.9
    solver.SetMaterialPropertyPair("CoR", m1, m2, 0.9)
    r = 0.01
    rho = 2500.0
    mass = rho * 4 / 3 * np.pi * r**3
    t1 = solver.LoadSphereType(mass, r, m1)
    t2 = solver.LoadSphereType(mass, r, m2)
    b = solver.AddClumps(
        [t1, t2], np.asarray([[-0.0126, 0, 0], [0.0126, 0, 0]])
    )
    b.SetVel(np.asarray([[1.0, 0, 0], [-1.0, 0, 0]]))
    solver.SetInitTimeStep(1e-6)
    solver.SetGravitationalAcceleration([0, 0, 0])
    solver.Initialize()
    solver.DoDynamics(0.004)
    v = solver.GetOwnerVelocity()
    assert v[0, 0] < 0  # rebounded
    np.testing.assert_allclose(abs(v[0, 0]), 0.9, rtol=0.06)


def test_grid_sampler_spacing():
    pts = dem.GridSampler(0.1).SampleBox([0, 0, 0], [0.25, 0.25, 0.25])
    assert len(pts) == 6 * 6 * 6
    d = np.linalg.norm(pts[0] - pts[1])
    np.testing.assert_allclose(d, 0.1, rtol=1e-9)


def test_hcp_sampler_min_distance():
    pts = dem.DEMBoxHCPSampler([0, 0, 0], [0.2, 0.2, 0.2], 0.05)
    assert len(pts) > 300
    sub = pts[:: max(len(pts) // 200, 1)]
    d = np.linalg.norm(sub[:, None] - sub[None, :], axis=-1)
    d[d == 0] = 1.0
    assert d.min() > 0.05 * 0.999


def test_cyl_surf_sampler():
    pts = dem.DEMCylSurfSampler([0, 0, 0], [0, 0, 1], 0.1, 0.2, 0.03)
    rad = np.linalg.norm(pts[:, :2], axis=1)
    np.testing.assert_allclose(rad, 0.1, atol=1e-9)
    assert abs(pts[:, 2]).max() <= 0.2 + 1e-9


def test_sphere_and_cylinder_regions():
    sp = dem.HCPSampler(0.05).SampleSphere([0, 0, 0], 0.2)
    assert (np.linalg.norm(sp, axis=1) <= 0.2 + 1e-9).all()
    cy = dem.GridSampler(0.05).SampleCylinderZ([0, 0, 0], 0.15, 0.1)
    assert (np.linalg.norm(cy[:, :2], axis=1) <= 0.15 + 1e-9).all()
    assert (np.abs(cy[:, 2]) <= 0.1 + 1e-9).all()
