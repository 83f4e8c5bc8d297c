"""Lost-contact sentry + exact sphere-triangle candidate filtering."""

import numpy as np

import dem_engine_tpu as dem
from dem_engine_tpu.structs import DEMMeshConnected


def test_lost_contact_sentry_fires():
    s = dem.DEMSolver()
    s.SetVerbosity("QUIET")
    s.InstructBoxDomainDimension(2, 2, 2)
    mat = s.LoadMaterial({"E": 1e7, "nu": 0.3, "CoR": 0.9, "mu": 0.5,
                          "Crr": 0.0})
    tmpl = s.LoadSphereType(0.001, 0.01, mat)
    # overlapping pair with tangential sliding -> friction history builds
    b = s.AddClumps(tmpl, np.asarray([[-0.0095, 0, 0], [0.0095, 0, 0]]))
    b.SetVel(np.asarray([[0, 0.5, 0], [0, -0.5, 0]]))
    s.SetInitTimeStep(1e-5)
    s.SetGravitationalAcceleration([0, 0, 0])
    s.SetCDUpdateFreq(10)
    s.Initialize(dry_run=True)
    tr = s.Track(b)
    s.DoDynamics(2e-4)  # 20 steps: sliding builds tangential history
    wc = np.abs(np.asarray(s.state.ss.wildcards["delta_tan_y"]))
    assert wc.max() > 0  # live history in the table
    # teleport one body away mid-contact: the next refresh cannot re-find
    # the pair, so its history is silently dropped -> the sentry must fire
    tr.SetPos([0.7, 0.7, 0.7], offset=1)
    s.DoDynamics(2e-4)
    assert int(s.state.lost_contacts) >= 1
    assert any("history" in a for a in s.ShowAnomalies())


def test_exact_st_candidate_filter():
    """A large diagonal facet passing NEAR a sphere row (inside its AABB
    but far from its surface) must generate ~no ST candidates — the role
    of the reference's SAT tri-box test (DEMTriangleBoxIntersect.cu)."""
    s = dem.DEMSolver()
    s.SetVerbosity("QUIET")
    s.InstructBoxDomainDimension(2, 2, 2)
    mat = s.LoadMaterial({"E": 1e7, "nu": 0.3, "CoR": 0.5, "mu": 0.3,
                          "Crr": 0.0})
    tmpl = s.LoadSphereType(0.001, 0.01, mat)
    # a line of spheres along x at y=z=0.25: inside the big diagonal
    # triangle's AABB but ~0.35 away from its plane
    n = 12
    pos = np.stack([np.linspace(-0.4, 0.4, n),
                    np.full(n, 0.25), np.full(n, 0.25)], axis=1)
    s.AddClumps(tmpl, pos)
    # diagonal facet spanning the box: z = -y plane
    mesh = DEMMeshConnected(
        vertices=np.asarray([[-0.9, -0.9, 0.9], [0.9, -0.9, 0.9],
                             [0.0, 0.9, -0.9]]),
        faces=np.asarray([[0, 1, 2]]),
    )
    s.AddWavefrontMeshObject(mesh, mat)
    s.SetInitTimeStep(1e-5)
    s.SetGravitationalAcceleration([0, 0, 0])
    s.Initialize(dry_run=True)
    # exact test: the facet surface passes ~0.35 from every sphere
    assert int(s.state.st.count) == 0

    # control: spheres actually near the facet surface DO get candidates
    s2 = dem.DEMSolver()
    s2.SetVerbosity("QUIET")
    s2.InstructBoxDomainDimension(2, 2, 2)
    mat2 = s2.LoadMaterial({"E": 1e7, "nu": 0.3, "CoR": 0.5, "mu": 0.3,
                            "Crr": 0.0})
    tmpl2 = s2.LoadSphereType(0.001, 0.01, mat2)
    s2.AddClumps(tmpl2, np.asarray([[0.0, 0.0, 0.0095]]))
    mesh2 = DEMMeshConnected(
        vertices=np.asarray([[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0],
                             [0.0, 0.5, 0.0]]),
        faces=np.asarray([[0, 1, 2]]),
    )
    s2.AddWavefrontMeshObject(mesh2, mat2)
    s2.SetInitTimeStep(1e-5)
    s2.SetGravitationalAcceleration([0, 0, 0])
    s2.Initialize(dry_run=True)
    assert int(s2.state.st.count) == 1
