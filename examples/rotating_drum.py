"""Rotating drum with 3-sphere clumps — the throughput/validation shape of
DEMdemo_RotatingDrum (reference src/demo/DEMdemo_RotatingDrum.cpp).

A cylindrical drum (analytical, inward normal) spins about its axis via a
prescribed angular velocity family; 3-sphere clumps tumble inside.
"""

import numpy as np

import dem_engine_tpu as dem

DRUM_FAMILY = 100


def build(n_clumps=256, drum_rad=0.12, drum_rpm=30.0, r=0.006,
          update_freq=25, h=5e-6, verbosity="QUIET"):
    solver = dem.DEMSolver()
    solver.SetVerbosity(verbosity)
    L = 2.5 * drum_rad
    solver.InstructBoxDomainDimension(L, L, L)
    mat = solver.LoadMaterial(
        {"E": 1e8, "nu": 0.3, "CoR": 0.5, "mu": 0.5, "Crr": 0.01}
    )
    rho = 2600.0
    m_sph = rho * 4 / 3 * np.pi * r**3
    mass = 3 * m_sph
    i_sph = 2 / 5 * m_sph * r**2
    moi = [3 * i_sph + 2 * m_sph * r**2, 3 * i_sph + 2 * m_sph * r**2,
           3 * i_sph]
    rel = np.asarray([[0, 0, -r], [0, 0, 0], [0, 0, r]])
    tmpl = solver.LoadClumpType(mass, moi, [r, r, r], rel, mat)

    # fill the lower half of the drum with a sparse grid
    pts = dem.HCPSampler(4.2 * r).SampleCylinderY(
        [0, 0, 0], drum_rad - 4 * r, drum_rad * 0.5
    )
    pts = pts[pts[:, 2] < 0][:n_clumps]
    batch = solver.AddClumps(tmpl, pts)

    # the drum: infinite cylinder along y, inward normal, spinning about y
    drum = solver.AddExternalObject()
    drum.AddCylinder([0, 0, 0], [0, 1, 0], drum_rad, mat, normal="inward")
    drum.SetFamily(DRUM_FAMILY)
    omega = drum_rpm * 2 * np.pi / 60.0
    solver.SetFamilyPrescribedAngVel(DRUM_FAMILY, 0.0, omega, 0.0)
    solver.SetFamilyPrescribedLinVel(DRUM_FAMILY, 0.0, 0.0, 0.0)
    # also two end caps so clumps stay inside along y
    caps = solver.AddExternalObject()
    caps.AddPlane([0, -drum_rad * 0.6, 0], [0, 1, 0], mat)
    caps.AddPlane([0, drum_rad * 0.6, 0], [0, -1, 0], mat)
    caps.SetFamily(255)

    solver.SetInitTimeStep(h)
    solver.SetGravitationalAcceleration([0, 0, -9.81])
    solver.SetCDUpdateFreq(update_freq)
    solver.SetExpandSafetyAdder(0.5)
    solver.Initialize()
    return solver, batch, pts.shape[0]


def main(sim_time=2.0, n_clumps=2048, out_every=0.05, out_dir="drum_out"):
    import os

    os.makedirs(out_dir, exist_ok=True)
    solver, batch, n = build(n_clumps=n_clumps, verbosity="INFO")
    t, frame = 0.0, 0
    while t < sim_time:
        solver.DoDynamics(out_every)
        t += out_every
        solver.WriteSphereFile(
            os.path.join(out_dir, f"drum_{frame:04d}.csv")
        )
        ke = solver.CreateInspector("clump_kinetic_energy").GetValue()
        print(f"t={t:.2f}s KE={ke:.4g} contacts={solver.GetNumContacts()}")
        frame += 1
    solver.ShowTimingStats()


if __name__ == "__main__":
    main()
