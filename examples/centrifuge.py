"""Centrifuge — DEMdemo_Centrifuge (reference src/demo/DEMdemo_Centrifuge.cpp).

A drum (analytical cylinder, inward normal) spins fast enough that
centripetal demand exceeds gravity: particles pin against the wall and
co-rotate. Quantitative check: at omega^2 * R >> g the steady state has
every particle's radial distance ~ (R_drum - r) and the particle angular
speed matches the drum's.
"""

import numpy as np

import dem_engine_tpu as dem

DRUM_FAMILY = 100


def build(n=300, drum_rad=0.1, omega=40.0, r=0.005, h=1e-5,
          verbosity="QUIET"):
    s = dem.DEMSolver()
    s.SetVerbosity(verbosity)
    L = 2.5 * drum_rad
    s.InstructBoxDomainDimension(L, L, L)
    mat = s.LoadMaterial({"E": 5e7, "nu": 0.3, "CoR": 0.3, "mu": 0.5,
                          "Crr": 0.01})
    tmpl = s.LoadSphereType(2600 * 4 / 3 * np.pi * r**3, r, mat)
    pts = dem.HCPSampler(2.4 * r).SampleCylinderY(
        [0, 0, 0], drum_rad * 0.5, drum_rad * 0.3
    )
    s.AddClumps(tmpl, pts[:n])

    drum = s.AddExternalObject()
    drum.AddCylinder([0, 0, 0], [0, 1, 0], drum_rad, mat,
                     normal="inward")
    drum.SetFamily(DRUM_FAMILY)
    s.SetFamilyPrescribedAngVel(DRUM_FAMILY, 0.0, omega, 0.0)
    s.SetFamilyPrescribedLinVel(DRUM_FAMILY, 0.0, 0.0, 0.0)
    s.SetInitTimeStep(h)
    s.SetGravitationalAcceleration([0, 0, -9.81])
    s.SetCDUpdateFreq(20)
    return s, drum_rad, omega, r


def main(n=300, sim_time=1.0, verbosity="INFO"):
    s, R, omega, r = build(n=n, verbosity=verbosity)
    s.Initialize()
    for _ in range(int(sim_time / 0.1)):
        s.DoDynamics(0.1)
    pos = s.GetOwnerPosition()
    rad = np.hypot(pos[:, 0], pos[:, 2])
    print(f"mean radial distance {rad.mean():.4f} (wall at {R - r:.4f})")
    return s, rad


if __name__ == "__main__":
    main()
