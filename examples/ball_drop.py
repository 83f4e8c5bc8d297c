"""Meshed ball dropped onto a granular bed — DEMdemo_BallDrop
(reference src/demo/DEMdemo_BallDrop.cpp): mesh-sphere contact, trackers,
family fixing, inspectors."""

import numpy as np

import dem_engine_tpu as dem


def make_icosphere(radius=0.05, subdiv=1):
    """Small icosphere mesh (host-side; the reference loads an OBJ)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.asarray(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.asarray(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    for _ in range(subdiv):
        mids = {}
        new_faces = []
        vlist = list(verts)

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in mids:
                m = vlist[a] + vlist[b]
                m = m / np.linalg.norm(m)
                mids[key] = len(vlist)
                vlist.append(m)
            return mids[key]

        for f in faces:
            a, b, c = f
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc],
                          [ab, bc, ca]]
        verts = np.asarray(vlist)
        faces = np.asarray(new_faces)
    return verts * radius, faces


def build(n_side=6, r=0.01, ball_rad=0.04, verbosity="QUIET", h=5e-6):
    solver = dem.DEMSolver()
    solver.SetVerbosity(verbosity)
    solver.InstructBoxDomainDimension(0.6, 0.6, 0.6)
    solver.InstructBoxDomainBoundingBC("all")
    mat = solver.LoadMaterial(
        {"E": 1e8, "nu": 0.3, "CoR": 0.4, "mu": 0.4, "Crr": 0.01}
    )
    mat_ball = solver.LoadMaterial(
        {"E": 2e8, "nu": 0.3, "CoR": 0.5, "mu": 0.3, "Crr": 0.01}
    )
    rho = 2600.0
    m_sph = rho * 4 / 3 * np.pi * r**3
    tmpl = solver.LoadSphereType(m_sph, r, mat)

    half = n_side * 1.05 * r
    pts = dem.DEMBoxGridSampler(
        [0, 0, -0.3 + 3.2 * r + half], [half, half, half], 2.1 * r
    )
    solver.AddClumps(tmpl, pts)

    verts, faces = make_icosphere(ball_rad, subdiv=1)
    mesh = dem.DEMMeshConnected(vertices=verts, faces=faces)
    mesh.SetMaterial(mat_ball)
    ball_mass = 7800.0 * 4 / 3 * np.pi * ball_rad**3
    mesh.SetMass(ball_mass)
    i_ball = 2 / 5 * ball_mass * ball_rad**2
    mesh.SetMOI([i_ball, i_ball, i_ball])
    mesh.SetInitPos([0, 0, -0.3 + 2 * half + 4 * r + ball_rad + 0.01])
    solver.AddWavefrontMeshObject(mesh)

    solver.SetInitTimeStep(h)
    solver.SetGravitationalAcceleration([0, 0, -9.81])
    solver.SetCDUpdateFreq(20)
    solver.Initialize()
    tracker = solver.Track(mesh)
    return solver, tracker, mesh, pts.shape[0]


def main(sim_time=0.5):
    solver, tracker, mesh, n = build(verbosity="INFO")
    t = 0.0
    while t < sim_time:
        solver.DoDynamics(0.05)
        t += 0.05
        print(f"t={t:.2f} ball z={tracker.Pos()[2]:.4f}")
    solver.WriteSphereFile("balldrop_spheres.csv")
    solver.WriteMeshFile("balldrop_mesh.vtk")
    solver.ShowTimingStats()


if __name__ == "__main__":
    main()
