"""Round-2 API surface: Correct* prescriptions, one-shot accelerations,
family ops, geometry wildcards, one-time persistency, purge, output
filters, device-side inspectors/queries."""

import os

import numpy as np
import pytest

import dem_engine_tpu as dem


def _simple_solver(n=4, r=0.01, gravity=(0, 0, 0), family=None, h=1e-4):
    s = dem.DEMSolver()
    s.SetVerbosity("QUIET")
    s.InstructBoxDomainDimension(2, 2, 2)
    mat = s.LoadMaterial({"E": 1e8, "nu": 0.3, "CoR": 0.5, "mu": 0.3,
                          "Crr": 0.0})
    tmpl = s.LoadSphereType(0.001, r, mat)
    pos = np.stack([np.linspace(-0.5, 0.5, n), np.zeros(n),
                    np.zeros(n)], axis=1)
    b = s.AddClumps(tmpl, pos)
    if family is not None:
        b.SetFamilies(family)
    s.SetInitTimeStep(h)
    s.SetGravitationalAcceleration(list(gravity))
    return s, b


def test_correct_family_lin_vel_additive():
    s, _ = _simple_solver(n=2)
    s.CorrectFamilyLinVel(0, 0.0, 0.0, 0.1)
    s.Initialize()
    p0 = s.GetOwnerPosition().copy()
    s.DoDynamics(0.1)
    p1 = s.GetOwnerPosition()
    # pure additive velocity: dz = 0.1 * 0.1 s
    assert np.allclose(p1[:, 2] - p0[:, 2], 0.01, atol=2e-4)


def test_prescribed_linvel_dictate_false_assigns_then_integrates():
    """dictate=False: velocity is re-assigned each step, then physics
    integrates on top (reference codegen `vZ = expr` + `vZ += (a+g)h`)."""
    s, _ = _simple_solver(n=1, gravity=(0, 0, -10.0), h=1e-4)
    s.SetFamilyPrescribedLinVel(0, vz=0.05, dictate=False)
    s.Initialize()
    s.DoDynamics(0.1)
    v = np.asarray(s.state.owners.vel)[0]
    # velocity ends at assigned + one step of gravity, not free fall
    assert abs(v[2] - (0.05 - 10 * 1e-4)) < 1e-4
    p = s.GetOwnerPosition()[0]
    assert abs(p[2] - 0.05 * 0.1) < 5e-4  # drifted ~0.005 up


def test_correct_family_quaternion_reseats_base():
    s, _ = _simple_solver(n=1)
    import jax.numpy as jnp

    ang = 0.3
    dq = np.asarray([np.cos(ang / 2), 0, 0, np.sin(ang / 2)], np.float32)
    s.CorrectFamilyQuaternion(0, lambda t: jnp.asarray(dq))
    s.Initialize()
    s.DoDynamics(0.01)
    q = np.asarray(s.state.owners.quat)[0]
    yaw = 2 * np.arctan2(q[3], q[0])
    # orientation pinned to the corrected base (omg = 0 adds nothing)
    assert abs(yaw - ang) < 1e-3


def test_add_owner_next_step_acc_one_shot():
    s, _ = _simple_solver(n=1, h=1e-3)
    s.Initialize()
    s.AddOwnerNextStepAcc([0], [0.0, 0.0, 1000.0])
    s.DoStepDynamics()
    v1 = np.asarray(s.state.owners.vel)[0, 2]
    assert abs(v1 - 1.0) < 1e-3  # 1000 * 1e-3
    s.DoStepDynamics()
    v2 = np.asarray(s.state.owners.vel)[0, 2]
    assert abs(v2 - v1) < 1e-6  # acceleration was one-shot


def test_change_clump_family_and_purge():
    s, _ = _simple_solver(n=4)
    s.Initialize()
    s.ChangeClumpFamily(3, owner_ids=[0, 1])
    fams = np.asarray(s.state.owners.family)
    assert list(fams[:4]) == [3, 3, 0, 0]
    s.PurgeFamily(3)
    assert s.GetNumClumps() == 2
    assert s.state.spheres.n == 2
    s.DoDynamics(0.01)  # still steps fine after the purge


def test_family_owner_wildcard_and_geometry_wildcards():
    s, b = _simple_solver(n=3)
    model = dem.HertzianForceModel()
    model.SetPerOwnerWildcards(["heat"])
    model.SetPerGeometryWildcards(["charge"])
    s.DefineContactForceModel(model)
    s.Initialize()
    s.ChangeClumpFamily(5, owner_ids=[1])
    s.SetFamilyOwnerWildcardValue(5, "heat", 7.5)
    hv = s.GetOwnerWildcardValue("heat")
    assert hv[1] == 7.5 and hv[0] == 0.0
    assert list(s.GetFamilyOwnerWildcardValue(5, "heat")) == [7.5]
    s.SetGeometryWildcardValue("charge", 2.0)
    assert np.all(s.GetGeometryWildcardValue("charge") == 2.0)


def test_tri_anal_wildcards():
    s, _ = _simple_solver(n=1)
    model = dem.HertzianForceModel()
    model.SetPerGeometryWildcards(["Q"])
    s.DefineContactForceModel(model)
    mat = s._materials[0]
    from dem_engine_tpu.structs import DEMMeshConnected
    mesh = s.AddWavefrontMeshObject(DEMMeshConnected(
        vertices=np.asarray([[0, 0, -0.4], [0.1, 0, -0.4], [0, 0.1, -0.4]]),
        faces=np.asarray([[0, 1, 2]])), s._materials[0])
    s.AddBCPlane([0, 0, -0.9], [0, 0, 1], mat)
    s.Initialize()
    s.SetTriWildcardValue("Q", 3.0)
    assert np.all(s.GetTriWildcardValue("Q") == 3.0)
    s.SetAnalWildcardValue("Q", -1.0)
    av = s.GetAnalWildcardValue("Q")
    assert np.all(av == -1.0) and len(av) >= 1


def test_one_time_persistency_and_remove():
    s, b = _simple_solver(n=2)
    # touching pair
    s2 = dem.DEMSolver()
    s2.SetVerbosity("QUIET")
    s2.InstructBoxDomainDimension(2, 2, 2)
    mat = s2.LoadMaterial({"E": 1e8, "nu": 0.3, "CoR": 0.5, "mu": 0.3,
                           "Crr": 0.0})
    tmpl = s2.LoadSphereType(0.001, 0.01, mat)
    s2.AddClumps(tmpl, np.asarray([[-0.0099, 0, 0], [0.0099, 0, 0]]))
    s2.SetInitTimeStep(1e-5)
    s2.SetGravitationalAcceleration([0, 0, 0])
    s2.Initialize(dry_run=True)
    assert s2.GetNumContacts() >= 1
    s2.MarkPersistentContact()
    assert int(np.asarray(s2.state.ss.persist).sum()) >= 1
    s2.RemovePersistentContact()
    assert int(np.asarray(s2.state.ss.persist).sum()) == 0
    s2.MarkFamilyPersistentContactBoth(0)
    assert int(np.asarray(s2.state.ss.persist).sum()) >= 1
    s2.RemoveFamilyPersistentContactEither(0)
    assert int(np.asarray(s2.state.ss.persist).sum()) == 0


def test_owner_contact_clumps_and_forces():
    s2 = dem.DEMSolver()
    s2.SetVerbosity("QUIET")
    s2.InstructBoxDomainDimension(2, 2, 2)
    mat = s2.LoadMaterial({"E": 1e8, "nu": 0.3, "CoR": 0.5, "mu": 0.3,
                           "Crr": 0.0})
    tmpl = s2.LoadSphereType(0.001, 0.01, mat)
    s2.AddClumps(tmpl, np.asarray([[-0.005, 0, 0], [0.005, 0, 0],
                                   [0.5, 0.5, 0.5]]))
    s2.SetInitTimeStep(1e-5)
    s2.SetGravitationalAcceleration([0, 0, 0])
    s2.Initialize(dry_run=True)
    s2.DoStepDynamics()
    ids = s2.GetOwnerContactClumps(0)
    assert list(ids) == [1]
    pts, fs = s2._contact_forces_for_owner(0)
    assert len(pts) == 1
    assert fs[0, 0] < 0  # pushed in -x (away from owner 1)


def test_disable_family_output(tmp_path):
    s, b = _simple_solver(n=4)
    b.SetFamilies([1, 1, 2, 2])
    s.Initialize()
    s.DisableFamilyOutput(1)
    p = tmp_path / "clumps.csv"
    s.WriteClumpFile(str(p))
    txt = p.read_text()
    assert txt.count("\n") - 1 == 2  # header + only family-2 rows
    p2 = tmp_path / "spheres.csv"
    s.WriteSphereFile(str(p2))
    assert p2.read_text().count("\n") - 1 == 2


def test_device_inspectors_match_host():
    s, _ = _simple_solver(n=5, gravity=(0, 0, -9.81))
    s.Initialize()
    s.DoDynamics(0.01)
    box = dem.BoxRegion([-0.6, -0.1, -0.1], [0.1, 0.1, 0.1])
    for q in ("clump_max_z", "clump_min_x", "clump_kinetic_energy",
              "clump_mass", "clump_count", "clump_max_absv",
              "clump_volume"):
        dev = s.CreateInspector(q, region=box).GetValue()
        insp = s.CreateInspector(q, region=box)
        insp.region = lambda pos: np.all(
            (pos >= np.asarray([-0.6, -0.1, -0.1]))
            & (pos <= np.asarray([0.1, 0.1, 0.1])), axis=1)
        host = insp._host_value()
        assert np.isclose(dev, host, rtol=1e-5, atol=1e-7), (q, dev, host)


def test_get_bin_size_reflects_margins():
    s, _ = _simple_solver(n=2, r=0.02)
    s.Initialize()
    bs = s.GetBinSize()
    assert bs >= 2 * 0.02  # at least twice the max radius
    assert bs < 0.2


def test_write_contact_file_including_potential_pairs(tmp_path):
    s2 = dem.DEMSolver()
    s2.SetVerbosity("QUIET")
    s2.InstructBoxDomainDimension(2, 2, 2)
    mat = s2.LoadMaterial({"E": 1e8, "nu": 0.3, "CoR": 0.5, "mu": 0.3,
                           "Crr": 0.0})
    tmpl = s2.LoadSphereType(0.001, 0.01, mat)
    # within margin-expanded reach but not overlapping
    s2.AddClumps(tmpl, np.asarray([[-0.0101, 0, 0], [0.0101, 0, 0]]))
    s2.SetFamilyExtraMargin(0, 0.001)  # margin covers the 0.0002 gap
    s2.SetInitTimeStep(1e-5)
    s2.SetGravitationalAcceleration([0, 0, 0])
    s2.Initialize(dry_run=True)
    p = tmp_path / "pairs.csv"
    s2.WriteContactFileIncludingPotentialPairs(str(p))
    assert p.read_text().count("\n") >= 2  # header + the potential pair


def test_round3_api_stragglers():
    """SetOwnerAngVel/OriQ/Family, GetOwnerMass/MOI, UpdateStepSize,
    GetUpdateFreq/GetBinNum, SetFamilyClumpMaterial, template Duplicate
    (reference API.h:430-486, 253-315)."""
    s, _ = _simple_solver(n=3)
    s.Initialize()
    s.SetOwnerAngVel([1], [0.0, 0.0, 2.0])
    assert np.allclose(s.GetOwnerAngVel([1])[0], [0, 0, 2])
    q = np.asarray([[0.0, 1.0, 0.0, 0.0]])
    s.SetOwnerOriQ([2], q)
    assert np.allclose(s.GetOwnerOriQ([2]), q)
    s.SetOwnerFamily([0], 7)
    assert s.GetOwnerFamily([0])[0] == 7
    assert np.allclose(s.GetOwnerMass(), 0.001)
    assert s.GetOwnerMOI().shape == (3, 3)
    s.UpdateStepSize(5e-5)
    assert abs(float(s.params.h) - 5e-5) < 1e-9
    assert s.GetUpdateFreq() > 0
    assert s.GetBinNum() >= 1
    s.SetCDMaxUpdateFreq(50)
    assert s.engine.max_freq == 50


def test_set_expand_factor_fixed_margin():
    """SetExpandFactor(beta, fix=True) pins the CD margin to a constant
    length and stops velocity tracking (reference API.h:199)."""
    s, _ = _simple_solver(n=2, r=0.02)
    s.Initialize()
    s.SetExpandFactor(0.005)
    assert abs(float(s.params.expand_safety_adder) - 0.005) < 1e-8
    assert float(s.params.expand_safety_multi) == 0.0
    s.SetCollectAccRightAfterForceCalc()  # source-compat no-ops
    s.SetAdaptiveTimeStepType("none")


def test_per_axis_prescriptions_accumulate():
    """X/Y/Z component setters accumulate into one prescription
    (reference API.h:712-760)."""
    s, _ = _simple_solver(n=2, family=[3, 0])
    s.SetFamilyPrescribedLinVelX(3, 0.5)
    s.SetFamilyPrescribedLinVelZ(3, lambda t: 0.25)
    s.Initialize()
    s.DoDynamics(10 * 1e-4)
    v = s.GetOwnerVelocity([0])[0]
    assert np.allclose(v, [0.5, 0.0, 0.25], atol=1e-6), v
    # per-axis position prescription on top
    s.SetFamilyPrescribedPositionY(3, 0.125)
    s.DoDynamics(10 * 1e-4)
    p = s.GetOwnerPosition([0])[0]
    assert abs(p[1] - 0.125) < 1e-5, p


def test_round3b_api_stragglers(tmp_path):
    """GetExpandFactor/GetTimeStepSize/GetSimTime/GetContacts/
    GetOwnerContactForces/sphere wildcards/contact wildcard aliases/
    mem-usage getters (reference API.h:90-1014)."""
    s, _ = _simple_solver(n=3, r=0.02)
    s.SetContactWildcards({"w"})
    s.SetGeometryWildcards({"g"})
    s.Initialize()
    assert s.GetInitStatus()
    assert abs(s.GetTimeStepSize() - 1e-4) < 1e-12
    assert s.GetSimTime() == s.GetTime()
    s.SetExpandFactor(0.003)
    assert abs(s.GetExpandFactor() - 0.003) < 1e-12
    assert s.GetWhetherForceCollectInKernel() is True
    s.SyncMemoryTransfer()
    assert s.GetDeviceMemUsageDynamic() > 0
    assert s.GetDeviceMemUsageKinematic() > 0
    s.PrintKinematicScratchSpaceUsage()
    # sphere wildcards by geo id
    s.SetSphereWildcardValue(1, "g", [2.5, 3.5])
    got = s.GetSphereWildcardValue(1, "g", 2)
    assert np.allclose(got, [2.5, 3.5])
    # contact wildcard aliases run (no live contacts needed)
    s.SetContactWildcardValue("w", 1.0)
    s.SetFamilyContactWildcardValueEither(0, "w", 2.0)
    s.SetFamilyContactWildcardValueBoth(0, "w", 3.0)
    assert s.GetContacts().shape[1] == 2
    pts, fs = s.GetOwnerContactForces([0, 1])
    assert pts.shape[1] == 3 and fs.shape[1] == 3
    assert s.GetContactForceModel() is not None
    # generic float3 CSV reader
    p = tmp_path / "c.csv"
    p.write_text("x,y,z\n1,2,3\n4,5,6\n")
    d = s.ReadClumpFloat3FromCsv(str(p), "x", "y", "z")
    assert np.allclose(d[""], [[1, 2, 3], [4, 5, 6]])


def test_obj_vn_normals_honored(tmp_path):
    """UseNormals: OBJ vn entries ride through to mesh output instead of
    winding-derived facet normals (reference BdrsAndObjs.h:348)."""
    p = tmp_path / "tri.obj"
    # one triangle in the xy plane whose vn deliberately points +x
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vn 1 0 0\nvn 1 0 0\nvn 1 0 0\n"
        "f 1//1 2//2 3//3\n")
    s = dem.DEMSolver()
    s.SetVerbosity("QUIET")
    s.InstructBoxDomainDimension(4, 4, 4)
    mat = s.LoadMaterial({"E": 1e8, "nu": 0.3, "CoR": 0.5, "mu": 0.3,
                          "Crr": 0.0})
    tmpl = s.LoadSphereType(0.001, 0.01, mat)
    s.AddClumps(tmpl, np.asarray([[1.0, 1.0, 1.0]]))
    mesh = s.AddWavefrontMeshObject(str(p), mat)
    mesh.SetFamily(255)
    mesh.UseNormals()
    s.SetInitTimeStep(1e-5)
    s.SetGravitationalAcceleration([0, 0, 0])
    s.Initialize()
    s.SetMeshOutputFormat("obj")
    out = tmp_path / "out.obj"
    s.WriteMeshFile(str(out))
    txt = out.read_text()
    vn_lines = [ln for ln in txt.splitlines() if ln.startswith("vn ")]
    assert vn_lines, "no normals written"
    vec = np.asarray([float(x) for x in vn_lines[0].split()[1:4]])
    np.testing.assert_allclose(vec, [1, 0, 0], atol=1e-6)
    # without UseNormals the winding normal (+z) is written
    mesh.UseNormals(False)
    s.WriteMeshFile(str(out))
    vn0 = [ln for ln in out.read_text().splitlines()
           if ln.startswith("vn ")][0]
    vec0 = np.asarray([float(x) for x in vn0.split()[1:4]])
    np.testing.assert_allclose(vec0, [0, 0, 1], atol=1e-6)


def test_mesh_mass_properties_and_wavefront(tmp_path):
    """ComputeMassProperties on a unit cube: vol 1, com center, inertia
    m/6 on the diagonal (reference BdrsAndObjs.h:394)."""
    v = np.array([[x, y, z] for z in (0, 1) for y in (0, 1)
                  for x in (0, 1)], np.float64)
    # 12 outward-wound triangles of the unit cube
    f = np.array([
        [0, 2, 1], [1, 2, 3],      # z=0 (normal -z)
        [4, 5, 6], [5, 7, 6],      # z=1 (+z)
        [0, 1, 4], [1, 5, 4],      # y=0 (-y)
        [2, 6, 3], [3, 6, 7],      # y=1 (+y)
        [0, 4, 2], [2, 4, 6],      # x=0 (-x)
        [1, 3, 5], [3, 7, 5],      # x=1 (+x)
    ])
    mesh = dem.DEMMeshConnected(vertices=v, faces=f)
    m, com, inertia = mesh.ComputeMassProperties(density=2.0)
    assert abs(m - 2.0) < 1e-12
    np.testing.assert_allclose(com, [0.5, 0.5, 0.5], atol=1e-12)
    np.testing.assert_allclose(inertia, np.eye(3) * (2.0 / 6.0),
                               atol=1e-12)
    p = tmp_path / "two.obj"
    dem.DEMMeshConnected.WriteWavefront(str(p), [mesh, mesh])
    txt = p.read_text()
    assert txt.count("\nf ") + txt.startswith("f ") == 24  # 2x12 faces


def test_tracker_plural_and_torque_queries():
    """Tracker Get*/plural surface + contact torque queries (reference
    AuxClasses.h:93-420)."""
    s = dem.DEMSolver()
    s.SetVerbosity("QUIET")
    s.InstructBoxDomainDimension(2, 2, 2)
    mat = s.LoadMaterial({"E": 1e8, "nu": 0.3, "CoR": 0.5, "mu": 0.3,
                          "Crr": 0.0})
    tmpl = s.LoadSphereType(0.001, 0.02, mat)
    b = s.AddClumps(tmpl, np.asarray([[-0.019, 0, 0], [0.019, 0, 0]]))
    trk = s.Track(b)
    s.SetInitTimeStep(1e-5)
    s.SetGravitationalAcceleration([0, 0, 0])
    s.Initialize()
    s.DoDynamics(3e-5)  # overlapping pair -> real contact forces
    assert trk.Positions().shape == (2, 3)
    assert trk.Velocities().shape == (2, 3)
    assert trk.AngularVelocitiesGlobal().shape == (2, 3)
    assert trk.OrientationQuaternions().shape == (2, 4)
    assert len(trk.Masses()) == 2 and len(trk.GetFamilies()) == 2
    assert trk.MOIs().shape == (2, 3)
    assert trk.GetOwnerIDs() == [0, 1]
    np.testing.assert_allclose(trk.GetPos(1), trk.Pos(1))
    np.testing.assert_allclose(trk.GetAngVelGlobal(0),
                               trk.AngVelLocal(0), atol=1e-12)
    pts, fs, tq = trk.GetContactForcesAndGlobalTorque(0)
    assert pts.shape[0] >= 1  # touching pair
    # force on owner 0 points away from owner 1 (-x)
    assert fs.sum(axis=0)[0] < 0
    # central contact: no torque about the CoM
    assert np.linalg.norm(tq) < 1e-10
    _, _, tq_l = trk.GetContactForcesAndLocalTorque(0)
    assert np.linalg.norm(tq_l) < 1e-10
    p_all, f_all, tqs = trk.GetContactForcesAndGlobalTorqueForAll()
    assert tqs.shape == (2, 3)
    # equal and opposite between the two owners
    np.testing.assert_allclose(
        f_all.sum(axis=0), np.zeros(3), atol=1e-6)
    assert trk.GetContactClumps(0).tolist() == [1]
    # wildcard plumbing (geometry wildcards of the tracked spheres;
    # SetGeometryWildcardValue creates the array on demand post-init)
    trk.SetGeometryWildcardValues("g", [1.5, 2.5])
    got = trk.GetGeometryWildcardValues("g")
    assert np.allclose(got, [1.5, 2.5])


def test_clump_template_csv_and_data_file(tmp_path, monkeypatch):
    """LoadClumpType filename overload (reference API.h:322) +
    GetDEMEDataFile resolution through DEME_DATA_DIR."""
    d = tmp_path / "clumps"
    d.mkdir()
    (d / "tri.csv").write_text(
        "x,y,z,r\n0.5,0.3,0,0.8\n0,-0.6,0,0.8\n-0.5,0.3,0,0.8\n"
        "# volume = whatever\n")
    monkeypatch.setenv("DEME_DATA_DIR", str(tmp_path))
    p = dem.GetDEMEDataFile("clumps/tri.csv")
    s = dem.DEMSolver()
    s.SetVerbosity("QUIET")
    mat = s.LoadMaterial({"E": 1e8, "nu": 0.3, "CoR": 0.5, "mu": 0.3,
                          "Crr": 0.0})
    t = s.LoadClumpType(1.0, [0.1, 0.1, 0.1], p, mat)
    assert len(t.radii) == 3 and abs(t.radii[0] - 0.8) < 1e-12
    assert abs(t.relpos[1][1] + 0.6) < 1e-12
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        dem.GetDEMEDataFile("clumps/definitely_missing.csv")


def test_family_material_reassign_and_duplicate():
    s = dem.DEMSolver()
    s.SetVerbosity("QUIET")
    s.InstructBoxDomainDimension(2, 2, 2)
    soft = s.LoadMaterial({"E": 1e7, "nu": 0.3, "CoR": 0.5, "mu": 0.3,
                           "Crr": 0.0})
    hard = s.LoadMaterial({"E": 1e9, "nu": 0.3, "CoR": 0.5, "mu": 0.3,
                           "Crr": 0.0})
    t = s.LoadSphereType(0.001, 0.01, soft)
    t2 = t.Duplicate()
    t2.Scale(2.0)
    assert abs(t2.radii[0] - 0.02) < 1e-12
    assert abs(t.radii[0] - 0.01) < 1e-12  # original untouched
    b = s.AddClumps([t, t, t2], np.asarray(
        [[-0.5, 0, 0], [0.0, 0, 0], [0.5, 0, 0]]))
    b.SetFamilies([1, 2, 2])
    s.SetInitTimeStep(1e-4)
    s.SetGravitationalAcceleration([0, 0, 0])
    s.Initialize()
    s.SetFamilyClumpMaterial(2, hard)
    mats = np.asarray(s.state.spheres.mat)
    fams = np.asarray(s.state.owners.family)[
        np.asarray(s.state.spheres.owner)]
    assert (mats[fams == 2] == hard.id).all()
    assert (mats[fams == 1] == soft.id).all()


def test_output_formats_roundtrip(tmp_path):
    """SetOutputFormat/SetContactOutputFormat binary (npz) round trip +
    mesh VTK facet normals (reference API.h:1317-1354)."""
    s, _ = _simple_solver(n=4, gravity=(0, 0, -9.81))
    s.Initialize()
    s.DoDynamics(0.001)
    s.SetOutputFormat("binary")
    s.SetContactOutputFormat("chpf")
    p1 = str(tmp_path / "clumps.npz")
    p2 = str(tmp_path / "contacts.npz")
    s.WriteClumpFile(p1)
    s.WriteContactFile(p2)
    d = np.load(p1)
    assert {"x", "y", "z", "Qw"} <= set(d.files)
    assert len(d["x"]) == 4
    d2 = np.load(p2)
    assert {"A", "B", "contact_type"} <= set(d2.files)
    # the file lands at EXACTLY the requested path, whatever the suffix
    # (regression: bare np.savez_compressed appends '.npz')
    p2b = str(tmp_path / "frame_0001.bin")
    s.WriteClumpFile(p2b)
    assert os.path.exists(p2b) and not os.path.exists(p2b + ".npz")
    assert len(np.load(p2b)["x"]) == 4
    # csv still works after switching back
    s.SetOutputFormat("csv")
    p3 = str(tmp_path / "clumps.csv")
    s.WriteClumpFile(p3)
    assert open(p3).readline().startswith("x,")


def test_mesh_output_normals_and_obj(tmp_path):
    import dem_engine_tpu as dem_
    s = dem.DEMSolver()
    s.SetVerbosity("QUIET")
    s.InstructBoxDomainDimension(2, 2, 2)
    mat = s.LoadMaterial({"E": 1e8, "nu": 0.3, "CoR": 0.5, "mu": 0.3,
                          "Crr": 0.0})
    import numpy as _np
    verts = _np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], _np.float64)
    faces = _np.asarray([[0, 1, 2]])
    from dem_engine_tpu.structs import DEMMeshConnected
    mesh = DEMMeshConnected(vertices=verts, faces=faces)
    s.AddWavefrontMeshObject(mesh, mat)
    t = s.LoadSphereType(0.001, 0.01, mat)
    s.AddClumps(t, _np.asarray([[0.5, 0.5, 0.5]]))
    s.SetInitTimeStep(1e-4)
    s.SetGravitationalAcceleration([0, 0, 0])
    s.Initialize()
    pv = str(tmp_path / "m.vtk")
    s.WriteMeshFile(pv)
    txt = open(pv).read()
    assert "NORMALS" in txt and "CELL_DATA" in txt
    s.SetMeshOutputFormat("obj")
    po = str(tmp_path / "m.obj")
    s.WriteMeshFile(po)
    t2 = open(po).read()
    assert t2.startswith("v ") and "vn " in t2 and "f " in t2


def test_resize_keeps_unused_layout_placeholders_empty():
    """Growing a non-fused table must NOT inflate its (W, 0) fused-layout
    placeholders to full width (regression: _cols guarded the wrong
    axis, so every ST/SA/custom-model grow carried ~144 B/contact of
    dead fstat/wcb columns)."""
    from dem_engine_tpu.state import ContactTable

    t = ContactTable.empty(128, ("delta_tan_x",), ("E:a",), fused=False)
    g = t.grown(256)
    assert g.fstat_a.shape[1] == 0
    assert g.fstat_b.shape[1] == 0
    assert g.wcb.shape[1] == 0
    # genuine fused layouts still resize both ways
    t2 = ContactTable.empty(128, ("delta_tan_x",), ("E:a",),
                            fused=True, slim=True)
    assert t2.grown(256).fstat_a.shape[1] == 256
    assert t2.shrunk(64).wcb.shape[1] == 64


def test_correct_family_lin_vel_callable_component():
    """Correct* components may be callables of time; the prescription
    must not call bool() on the traced value (regression: `c(t) or 0.0`
    raised TracerBoolConversionError at trace time)."""
    s, _ = _simple_solver(n=2)
    s.CorrectFamilyLinVel(0, 0.0, 0.0, lambda t: 0.0 * t + 0.1)
    s.Initialize()
    p0 = s.GetOwnerPosition().copy()
    s.DoDynamics(0.1)
    dz = s.GetOwnerPosition()[:, 2] - p0[:, 2]
    assert np.allclose(dz, 0.01, atol=2e-4)


def test_prescription_merge_keeps_earlier_axes():
    """Mixing the whole-vector setter with a per-axis setter must keep
    the earlier axes prescribed (regression: merge() replaced the
    channel wholesale and un-prescribed them; reference treats each axis
    as an independent expression, APIPrivate.cpp:841-937)."""
    s, _ = _simple_solver(n=1, gravity=(0, 0, -10.0), h=1e-3)
    s.SetFamilyPrescribedLinVel(0, vx=0.2)       # x dictated
    s.SetFamilyPrescribedLinVelZ(0, 0.05)        # later: z dictated
    s.Initialize()
    s.DoDynamics(0.1)
    v = np.asarray(s.state.owners.vel)[0]
    assert abs(v[0] - 0.2) < 1e-5, v    # x still prescribed
    assert abs(v[2] - 0.05) < 1e-5, v   # z prescribed (not free fall)
    p0 = np.asarray([-0.5, 0, 0])
    p = s.GetOwnerPosition()[0]
    assert abs(p[0] - (p0[0] + 0.2 * 0.1)) < 1e-4
    assert abs(p[2] - 0.05 * 0.1) < 1e-4


def test_slim_fused_tables_drop_query_fields_and_fill_on_demand():
    """Slim fused SS tables carry NO per-contact force/torque/cpoint
    (36 B/contact of query-only state at 1M-clump caps); query paths
    fill them through the extras pass into api._ss_query instead
    (state shapes never change). Forced on CPU via an engine relayout
    (the fused kernel runs in interpret mode there)."""
    import dataclasses

    s, _ = _simple_solver(n=6, r=0.01, gravity=(0, 0, -9.81), h=1e-5)
    s.AddBCPlane([0, 0, -0.00999], [0, 0, 1])  # slight initial overlap
    s.Initialize()
    eng = s.engine
    eng.cfg = dataclasses.replace(eng.cfg, use_fused_force=True)
    eng._build()
    s.state = eng._relayout_ss(s.state)
    assert s.state.ss.force.shape[0] == 0  # slim: no in-state fields
    s.DoDynamics(0.05)  # long enough for the CoR-0.5 bounces to die out
    assert s.state.ss.force.shape[0] == 0  # still slim after stepping
    info = s.GetContactDetailedInfo()
    sa = [b for b in info if b["kind"] == "SA"]
    assert sa, "spheres must rest on the BC plane"
    # floor reaction equals bed weight (the verify-skill invariant)
    fz = float(np.sum(sa[0]["force"][:, 2]))
    weight = 6 * 0.001 * 9.81
    assert abs(fz - weight) / weight < 0.2
    # resize keeps the slim placeholders empty
    g = s.state.ss.grown(2 * s.state.ss.cap)
    assert g.force.shape[0] == 0 and g.cpoint.shape[0] == 0
