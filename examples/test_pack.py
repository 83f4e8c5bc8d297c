"""Packing study — DEMdemo_TestPack (reference
src/demo/DEMdemo_TestPack.cpp): rain ellipsoid-ish clumps and spheres onto
a plane and measure the packing (void ratio) with the volume inspector."""

import numpy as np

import dem_engine_tpu as dem


def build(n=300, r=0.01, kind="ellipsoid", h=2e-5, verbosity="QUIET"):
    s = dem.DEMSolver()
    s.SetVerbosity(verbosity)
    s.InstructBoxDomainDimension(0.6, 0.6, 0.8)
    mat = s.LoadMaterial({"E": 5e7, "nu": 0.3, "CoR": 0.4, "mu": 0.4,
                          "Crr": 0.01})
    rho = 2600.0
    if kind == "sphere":
        m = rho * 4 / 3 * np.pi * r**3
        tmpl = s.LoadSphereType(m, r, mat)
        tmpl.SetVolume(4 / 3 * np.pi * r**3)
    else:
        # 3-sphere "ellipsoid" (2:1:1) like the reference's clump
        m_sph = rho * 4 / 3 * np.pi * r**3
        rel = np.asarray([[-0.7 * r, 0, 0], [0, 0, 0], [0.7 * r, 0, 0]])
        i_s = 2 / 5 * m_sph * r**2
        moi = [3 * i_s, 3 * i_s + 2 * m_sph * (0.7 * r) ** 2,
               3 * i_s + 2 * m_sph * (0.7 * r) ** 2]
        tmpl = s.LoadClumpType(3 * m_sph, moi, [r, r, r], rel, mat)
        tmpl.SetVolume(4 / 3 * np.pi * r**3 * 2.1)  # overlap-corrected
    pts = dem.HCPSampler(3.2 * r).SampleBox([0, 0, 0.05], [0.12, 0.12, 0.15])
    pts = pts[:n]
    s.AddClumps(tmpl, pts)
    s.AddBCPlane([0, 0, -0.25], [0, 0, 1], mat)
    s.SetInitTimeStep(h)
    s.SetGravitationalAcceleration([0, 0, -9.81])
    s.SetCDUpdateFreq(20)
    s.Initialize()
    return s, len(pts)


def void_ratio(s, half=0.12):
    """Void ratio of the settled bed inside the sampling box."""
    vol = s.CreateInspector(
        "clump_volume",
        region=dem.BoxRegion([-half, -half, -0.25],
                             [half, half, 0.3]),
    ).GetValue()
    zmax = s.CreateInspector("clump_max_z").GetValue()
    box = (2 * half) ** 2 * (zmax + 0.25)
    solid = min(vol / box, 0.99)
    return (1 - solid) / solid


def main(sim_time=0.6):
    s, n = build(verbosity="INFO")
    s.DoDynamics(sim_time)
    e = void_ratio(s)
    print(f"{n} clumps settled; void ratio e = {e:.3f}")
    return e


if __name__ == "__main__":
    main()
