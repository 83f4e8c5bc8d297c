"""Angle of repose — DEMdemo_Repose (reference src/demo/DEMdemo_Repose.cpp).

Particles rain onto a small circular platform; the surplus spills over the
edge and a conical heap forms. The repose angle is fit from the heap
surface. Friction and rolling resistance set the angle: literature for
dry sand-like mu ~ 0.4-0.6 with rolling resistance gives ~ 25-35 deg;
frictionless material cannot hold a heap (angle -> ~0).
"""

import numpy as np

import dem_engine_tpu as dem


def build(n=600, r=0.004, mu=0.5, crr=0.08, h=2e-5, verbosity="QUIET"):
    s = dem.DEMSolver()
    s.SetVerbosity(verbosity)
    s.InstructBoxDomainDimension(0.5, 0.5, 0.6)
    mat = s.LoadMaterial({"E": 5e7, "nu": 0.3, "CoR": 0.4, "mu": mu,
                          "Crr": crr})
    # triangle clump: shape interlocking is what holds real heaps (the
    # reference demo likewise uses multi-sphere clumps)
    rho = 2600.0
    m_sph = rho * 4 / 3 * np.pi * r**3
    a = 1.1 * r
    rel = np.asarray([[a, 0, 0], [-0.5 * a, 0.866 * a, 0],
                      [-0.5 * a, -0.866 * a, 0]])
    i_s = 2 / 5 * m_sph * r**2
    moi = [3 * i_s + 2 * m_sph * a**2 * 0.75,
           3 * i_s + 2 * m_sph * a**2 * 0.75,
           3 * i_s + 3 * m_sph * a**2]
    tmpl = s.LoadClumpType(3 * m_sph, moi, [r, r, r], rel, mat)
    # gentle pour: a wide, low column released just above the platform
    pts = dem.HCPSampler(2.0 * (r + a)).SampleCylinderZ(
        [0, 0, 0.02], 0.030, 0.06
    )
    rng = np.random.default_rng(0)
    pts = pts + rng.uniform(-0.05 * r, 0.05 * r, pts.shape)
    pts = pts[:n]
    s.AddClumps(tmpl, pts)
    # platform: a finite-ish plate made of a plane at z=-0.05... the heap
    # forms on the floor; spill is bounded by the domain walls far away
    s.AddBCPlane([0, 0, -0.05], [0, 0, 1], mat)
    s.SetInitTimeStep(h)
    s.SetGravitationalAcceleration([0, 0, -9.81])
    s.SetCDUpdateFreq(20)
    return s, len(pts)


def measure_angle(s, r):
    """Fit the heap slope: max particle height per radial annulus."""
    pos = s.GetOwnerPosition()
    z = pos[:, 2] + 0.05  # height above the floor
    rad = np.hypot(pos[:, 0], pos[:, 1])
    keep = z < 1.0
    z, rad = z[keep], rad[keep]
    edges = np.linspace(0, max(rad.max(), 0.02), 10)
    hs, rs = [], []
    for i in range(len(edges) - 1):
        m = (rad >= edges[i]) & (rad < edges[i + 1])
        if m.sum() >= 3:
            hs.append(np.quantile(z[m], 0.9))
            rs.append(0.5 * (edges[i] + edges[i + 1]))
    hs, rs = np.asarray(hs), np.asarray(rs)
    if len(rs) < 3:
        return 0.0
    slope = -np.polyfit(rs, hs, 1)[0]
    return float(np.degrees(np.arctan(max(slope, 0.0))))


def main(n=2000, sim_time=1.2):
    s, n = build(n=n, verbosity="INFO")
    s.Initialize()
    for i in range(int(sim_time / 0.1)):
        s.DoDynamics(0.1)
        print(f"t={s.GetTime():.2f} maxKE="
              f"{s.CreateInspector('clump_kinetic_energy').GetValue():.2e}")
    ang = measure_angle(s, 0.004)
    print(f"angle of repose: {ang:.1f} deg")
    s.WriteClumpFile("repose_out.csv")
    return ang


if __name__ == "__main__":
    main()
