"""Simplified rover-wheel drawbar-pull — DEMdemo_WheelDPSimplified
(reference src/demo/DEMdemo_WheelDP.cpp): a meshed cylinder "wheel" driven
over a granular bed with prescribed angular + linear velocity; the tracker
reads back the reaction (drawbar pull) force.
"""

import numpy as np

import dem_engine_tpu as dem

WHEEL_FAMILY = 100


def make_wheel_mesh(radius=0.05, width=0.04, n_seg=24):
    """Open cylinder shell triangulated (axis along y)."""
    th = np.linspace(0, 2 * np.pi, n_seg, endpoint=False)
    ring = np.stack([radius * np.cos(th), np.zeros_like(th),
                     radius * np.sin(th)], axis=-1)
    v0 = ring + np.asarray([0, -width / 2, 0])
    v1 = ring + np.asarray([0, width / 2, 0])
    verts = np.concatenate([v0, v1])
    faces = []
    for i in range(n_seg):
        j = (i + 1) % n_seg
        faces += [[i, j, n_seg + i], [j, n_seg + j, n_seg + i]]
    return verts, np.asarray(faces)


def build(n_side=8, r=0.008, verbosity="QUIET", h=5e-6, slip=0.2,
          wheel_rad=0.05):
    solver = dem.DEMSolver()
    solver.SetVerbosity(verbosity)
    solver.InstructBoxDomainDimension(0.8, 0.3, 0.4)
    solver.InstructBoxDomainBoundingBC("all")
    mat = solver.LoadMaterial(
        {"E": 1e8, "nu": 0.3, "CoR": 0.4, "mu": 0.6, "Crr": 0.05}
    )
    rho = 2600.0
    m_sph = rho * 4 / 3 * np.pi * r**3
    tmpl = solver.LoadSphereType(m_sph, r, mat)

    # terrain bed
    half = np.asarray([0.35, 0.1, 3.3 * r])
    pts = dem.DEMBoxGridSampler(
        [0, 0, -0.2 + 1.2 * r + half[2]], half, 2.05 * r
    )
    solver.AddClumps(tmpl, pts)

    # the wheel
    verts, faces = make_wheel_mesh(radius=wheel_rad, width=0.04)
    wheel = dem.DEMMeshConnected(vertices=verts, faces=faces)
    wheel.SetMaterial(mat)
    wheel_mass = 5.0
    wheel.SetMass(wheel_mass)
    iw = 0.5 * wheel_mass * wheel_rad**2
    wheel.SetMOI([iw / 2, iw, iw / 2])
    z_bed_top = -0.2 + 1.2 * r + 2 * half[2]
    wheel.SetInitPos([-0.25, 0, z_bed_top + wheel_rad - r])
    wheel.SetFamily(WHEEL_FAMILY)
    solver.AddWavefrontMeshObject(wheel)

    # prescribed: forward vx with slip against rim speed omega*R
    omega = 2.0  # rad/s
    vx = omega * wheel_rad * (1.0 - slip)
    solver.SetFamilyPrescribedAngVel(WHEEL_FAMILY, 0.0, omega, 0.0)
    solver.SetFamilyPrescribedLinVel(WHEEL_FAMILY, vx, 0.0, None)
    # z is left to physics so the wheel sinks under load: add weight only.

    solver.SetInitTimeStep(h)
    solver.SetGravitationalAcceleration([0, 0, -9.81])
    solver.SetCDUpdateFreq(20)
    solver.SetExpandSafetyAdder(0.3)
    solver.Initialize()
    tracker = solver.Track(wheel)
    return solver, tracker, pts.shape[0]


def main(sim_time=1.0):
    solver, tracker, n = build(verbosity="INFO")
    t = 0.0
    while t < sim_time:
        solver.DoDynamics(0.05)
        t += 0.05
        pts, fs = tracker.GetContactForces()
        drawbar = fs[:, 0].sum() if len(fs) else 0.0
        print(
            f"t={t:.2f} wheel x={tracker.Pos()[0]:.3f} "
            f"z={tracker.Pos()[2]:.3f} drawbar={drawbar:.3f} N "
            f"ncontacts={len(fs)}"
        )
    solver.ShowTimingStats()


if __name__ == "__main__":
    main()
