"""Blade plowing — DEMdemo_Plow (reference src/demo/DEMdemo_Plow.cpp):
an inclined blade (triangle mesh) is driven through a settled bed at
constant speed; material piles up ahead of the blade and the push force is
read back through the tracker."""

import numpy as np

import dem_engine_tpu as dem

BLADE_FAMILY = 2


def make_blade(w=0.12, hgt=0.06, t=0.004):
    """A flat rectangular blade (two triangles per face), normal along x."""
    v = np.asarray([
        [0, -w / 2, 0], [0, w / 2, 0], [0, w / 2, hgt], [0, -w / 2, hgt],
        [t, -w / 2, 0], [t, w / 2, 0], [t, w / 2, hgt], [t, -w / 2, hgt],
    ])
    f = np.asarray([
        [0, 1, 2], [0, 2, 3], [5, 4, 7], [5, 7, 6],
    ])
    return v, f


def build(n=400, r=0.006, speed=0.25, h=2e-5, verbosity="QUIET"):
    s = dem.DEMSolver()
    s.SetVerbosity(verbosity)
    s.InstructBoxDomainDimension(0.8, 0.4, 0.4)
    mat = s.LoadMaterial({"E": 5e7, "nu": 0.3, "CoR": 0.4, "mu": 0.5,
                          "Crr": 0.02})
    rho = 2600.0
    m_sph = rho * 4 / 3 * np.pi * r**3
    # 2-sphere ellipsoid clump (reference uses ellipsoid_2_1_1 clumps)
    rel = np.asarray([[0.6 * r, 0, 0], [-0.6 * r, 0, 0]])
    i_s = 2 / 5 * m_sph * r**2
    moi = [2 * i_s, 2 * i_s + 2 * m_sph * (0.6 * r) ** 2,
           2 * i_s + 2 * m_sph * (0.6 * r) ** 2]
    tmpl = s.LoadClumpType(2 * m_sph, moi, [r, r], rel, mat)
    pts = dem.HCPSampler(3.0 * r).SampleBox(
        [0.05, 0, -0.14], [0.22, 0.1, 0.05])
    pts = pts[:n]
    s.AddClumps(tmpl, pts)
    s.AddBCPlane([0, 0, -0.2], [0, 0, 1], mat)

    bv, bf = make_blade()
    blade = dem.DEMMeshConnected(vertices=bv, faces=bf)
    blade.SetMaterial(mat)
    blade.SetMass(2.0)
    blade.SetMOI([1e-2, 1e-2, 1e-2])
    blade.SetInitPos([-0.25, 0, -0.2])
    blade.SetFamily(BLADE_FAMILY)
    s.AddWavefrontMeshObject(blade)
    s.SetFamilyPrescribedLinVel(BLADE_FAMILY, speed, 0.0, 0.0)
    s.SetFamilyPrescribedAngVel(BLADE_FAMILY, 0.0, 0.0, 0.0)

    s.SetInitTimeStep(h)
    s.SetGravitationalAcceleration([0, 0, -9.81])
    s.SetCDUpdateFreq(20)
    s.SetExpandSafetyAdder(0.3)
    s.Initialize()
    tracker = s.Track(blade)
    return s, tracker, len(pts)


def main(sim_time=1.2):
    s, tracker, n = build(verbosity="INFO")
    s.DoDynamics(0.3)  # settle
    t = 0.3
    while t < sim_time:
        s.DoDynamics(0.1)
        t += 0.1
        pts, fs = tracker.GetContactForces()
        fx = -fs[:, 0].sum() if len(fs) else 0.0
        print(f"t={t:.1f} blade x={tracker.Pos()[0]:.3f} push={fx:.2f} N "
              f"contacts={len(fs)}")
    return s, tracker


if __name__ == "__main__":
    main()
