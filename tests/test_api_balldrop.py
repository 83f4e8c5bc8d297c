"""API-level mini BallDrop: the reference's designated smoke test shape
(DEMdemo_SingleSphereCollide / DEMdemo_BallDrop) through the DEMSolver
facade: samplers, materials, clump templates, batches, bounding BCs,
trackers, inspectors, output files, and restart round-trip."""

import os

import numpy as np

import dem_engine_tpu as dem


def _build(tmp_path=None, n_side=4):
    solver = dem.DEMSolver()
    solver.SetVerbosity("QUIET")
    solver.InstructBoxDomainDimension(0.4, 0.4, 0.4)
    solver.InstructBoxDomainBoundingBC("all")
    mat = solver.LoadMaterial(
        {"E": 1e8, "nu": 0.3, "CoR": 0.4, "mu": 0.4, "Crr": 0.01}
    )
    r = 0.01
    rho = 2500.0
    mass = rho * 4 / 3 * np.pi * r**3
    tmpl = solver.LoadSphereType(mass, r, mat)
    pts = dem.DEMBoxGridSampler(
        [0, 0, -0.15], [n_side * 1.1 * r, n_side * 1.1 * r, 2.5 * 1.1 * r],
        2.2 * r,
    )
    batch = solver.AddClumps(tmpl, pts)
    solver.SetInitTimeStep(5e-6)
    solver.SetGravitationalAcceleration([0, 0, -9.81])
    solver.SetCDUpdateFreq(20)
    solver.Initialize()
    return solver, batch, pts


def test_balldrop_settles(tmp_path):
    solver, batch, pts = _build()
    n = pts.shape[0]
    assert solver.GetNumClumps() == n
    solver.DoDynamics(0.12)
    pos = solver.GetOwnerPosition()[:n]
    vel = solver.GetOwnerVelocity()[:n]
    assert np.isfinite(pos).all()
    # nothing through the floor (z = -0.2) or walls
    assert (pos[:, 2] > -0.2 + 0.01 - 1e-3).all()
    assert (np.abs(pos[:, :2]) < 0.2).all()
    # mostly settled
    assert np.abs(vel).max() < 1.0
    # inspector works
    insp = solver.CreateInspector("clump_max_z")
    assert -0.2 < insp.GetValue() < 0.0
    ke = solver.CreateInspector("clump_kinetic_energy").GetValue()
    assert ke >= 0.0
    # tracker works
    trk = solver.Track(batch)
    p0 = trk.Pos(0)
    assert p0.shape == (3,)
    # files written
    sph = os.path.join(tmp_path, "spheres.csv")
    clp = os.path.join(tmp_path, "clumps.csv")
    cnt = os.path.join(tmp_path, "contacts.csv")
    solver.WriteSphereFile(sph)
    solver.WriteClumpFile(clp)
    solver.WriteContactFile(cnt)
    assert os.path.getsize(sph) > 0
    assert os.path.getsize(clp) > 0
    # contact info query
    pairs = solver.GetClumpContacts()
    assert pairs.ndim == 2 and pairs.shape[1] == 2
    assert solver.GetNumContacts() > 0


def test_checkpoint_roundtrip(tmp_path):
    solver, batch, pts = _build()
    n = pts.shape[0]
    solver.DoDynamics(0.04)
    clp = os.path.join(tmp_path, "ckpt.csv")
    solver.WriteClumpFile(clp)
    xyz = dem.DEMSolver.ReadClumpXyzFromCsv(clp)
    quat = dem.DEMSolver.ReadClumpQuatFromCsv(clp)
    vel = dem.DEMSolver.ReadClumpVelFromCsv(clp)
    got = sum(v.shape[0] for v in xyz.values())
    assert got == n
    ref = solver.GetOwnerPosition()[:n]
    all_xyz = np.concatenate(list(xyz.values()))
    np.testing.assert_allclose(
        np.sort(all_xyz[:, 2]), np.sort(ref[:, 2]), atol=1e-5
    )
    # restart into a fresh solver
    s2 = dem.DEMSolver()
    s2.SetVerbosity("QUIET")
    s2.InstructBoxDomainDimension(0.4, 0.4, 0.4)
    s2.InstructBoxDomainBoundingBC("all")
    mat = s2.LoadMaterial(
        {"E": 1e8, "nu": 0.3, "CoR": 0.4, "mu": 0.4, "Crr": 0.01}
    )
    r = 0.01
    mass = 2500.0 * 4 / 3 * np.pi * r**3
    tmpl = s2.LoadSphereType(mass, r, mat)
    b2 = s2.AddClumps(tmpl, all_xyz)
    b2.SetOriQ(np.concatenate(list(quat.values())))
    b2.SetVel(np.concatenate(list(vel.values())))
    s2.SetInitTimeStep(5e-6)
    s2.SetGravitationalAcceleration([0, 0, -9.81])
    s2.Initialize()
    s2.DoDynamics(0.005)
    p2 = s2.GetOwnerPosition()[:n]
    assert np.isfinite(p2).all()
    assert (p2[:, 2] > -0.2).all()


def test_prescribed_motion_family():
    """A family with prescribed velocity moves exactly as told."""
    solver = dem.DEMSolver()
    solver.SetVerbosity("QUIET")
    solver.InstructBoxDomainDimension(1, 1, 1)
    mat = solver.LoadMaterial({"E": 1e8, "nu": 0.3, "CoR": 0.5, "mu": 0.0,
                               "Crr": 0.0})
    tmpl = solver.LoadSphereType(0.01, 0.005, mat)
    b = solver.AddClumps(tmpl, np.asarray([[0.0, 0.0, 0.0]]))
    b.SetFamilies(5)
    solver.SetFamilyPrescribedLinVel(5, 0.1, 0.0, lambda t: 0.2 * t)
    solver.SetInitTimeStep(1e-4)
    solver.SetGravitationalAcceleration([0, 0, -9.81])  # must be overridden
    solver.Initialize()
    solver.DoDynamics(0.1)
    p = solver.GetOwnerPosition()[0]
    v = solver.GetOwnerVelocity()[0]
    np.testing.assert_allclose(v[0], 0.1, atol=1e-6)
    np.testing.assert_allclose(v[2], 0.2 * 0.1, atol=1e-3)
    np.testing.assert_allclose(p[0], 0.01, rtol=1e-3)
    # z follows integral of 0.2 t = 0.1 t^2 -> 0.001
    np.testing.assert_allclose(p[2], 0.001, rtol=2e-2)


def test_family_change_when():
    """ChangeFamilyWhen flips family by a position condition."""
    solver = dem.DEMSolver()
    solver.SetVerbosity("QUIET")
    solver.InstructBoxDomainDimension(1, 1, 1)
    mat = solver.LoadMaterial({"E": 1e8, "nu": 0.3, "CoR": 0.5, "mu": 0.0,
                               "Crr": 0.0})
    tmpl = solver.LoadSphereType(0.01, 0.005, mat)
    solver.AddClumps(tmpl, np.asarray([[0.0, 0.0, 0.2]]))
    lbf_z = -0.5

    def below_mid(view, t):
        return view.pos[:, 2] + lbf_z < 0.15  # user-frame z < 0.15

    solver.ChangeFamilyWhen(0, 9, below_mid)
    solver.SetFamilyFixed(9)
    solver.SetInitTimeStep(1e-4)
    solver.SetGravitationalAcceleration([0, 0, -9.81])
    solver.Initialize()
    solver.DoDynamics(0.3)
    fam = solver.GetOwnerFamily()[0]
    assert fam == 9
    # frozen shortly after crossing z=0.15
    p = solver.GetOwnerPosition()[0]
    assert 0.10 < p[2] < 0.151


def test_update_clumps_midsim():
    """Mid-simulation entity insertion (reference UpdateClumps)."""
    solver, batch, pts = _build(n_side=2)
    n0 = solver.GetNumClumps()
    solver.DoDynamics(0.01)
    tmpl = solver._templates[0]
    b2 = solver.AddClumps(tmpl, np.asarray([[0.0, 0.0, -0.05]]))
    solver.UpdateClumps()
    assert solver.GetNumClumps() == n0 + 1
    solver.DoDynamics(0.02)
    pos = solver.GetOwnerPosition()
    assert np.isfinite(pos).all()
    # the inserted clump is falling
    v_new = solver.GetOwnerVelocity()[b2.owner_offset]
    assert v_new[2] < -0.05
