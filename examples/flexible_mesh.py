"""Deformable mesh — DEMdemo_FlexibleMesh (reference
src/demo/DEMdemo_FlexibleMesh.cpp): a meshed plate under a granular load
is flexed mid-simulation by updating its node positions
(SetTriNodeRelPos / UpdateMesh), and the per-facet contact forces are
extracted each frame — the coupling recipe for external FEA solvers."""

import numpy as np

import dem_engine_tpu as dem

PLATE_FAMILY = 3


def make_plate(nx=6, ny=6, size=0.2):
    xs = np.linspace(-size / 2, size / 2, nx)
    ys = np.linspace(-size / 2, size / 2, ny)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    verts = np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], axis=1)
    faces = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a = i * ny + j
            b = (i + 1) * ny + j
            faces += [[a, b, a + 1], [b, b + 1, a + 1]]
    return verts, np.asarray(faces)


def build(n=200, r=0.008, h=2e-5, verbosity="QUIET"):
    s = dem.DEMSolver()
    s.SetVerbosity(verbosity)
    s.InstructBoxDomainDimension(0.5, 0.5, 0.5)
    mat = s.LoadMaterial({"E": 5e7, "nu": 0.3, "CoR": 0.4, "mu": 0.4,
                          "Crr": 0.01})
    rho = 2600.0
    tmpl = s.LoadSphereType(rho * 4 / 3 * np.pi * r**3, r, mat)
    pts = dem.HCPSampler(2.2 * r).SampleBox([0, 0, 0.08], [0.07, 0.07, 0.05])
    pts = pts[:n]
    s.AddClumps(tmpl, pts)

    pv, pf = make_plate()
    plate = dem.DEMMeshConnected(vertices=pv, faces=pf)
    plate.SetMaterial(mat)
    plate.SetMass(1.0)
    plate.SetMOI([1e-2, 1e-2, 1e-2])
    plate.SetInitPos([0, 0, 0.0])
    plate.SetFamily(PLATE_FAMILY)
    s.AddWavefrontMeshObject(plate)
    s.SetFamilyFixed(PLATE_FAMILY)

    s.AddBCPlane([0, 0, -0.2], [0, 0, 1], mat)
    s.SetInitTimeStep(h)
    s.SetGravitationalAcceleration([0, 0, -9.81])
    s.SetCDUpdateFreq(20)
    s.Initialize()
    tracker = s.Track(plate)
    return s, tracker, plate


def deflect(plate_verts, w):
    """Parabolic bowl deflection of amplitude w (the stand-in for an FEA
    displacement field)."""
    v = plate_verts.copy()
    r2 = v[:, 0] ** 2 + v[:, 1] ** 2
    v[:, 2] = -w * (1 - r2 / max(r2.max(), 1e-12))
    return v


def main(sim_time=0.5, frames=5):
    s, tracker, plate = build(verbosity="INFO")
    v0 = np.asarray(plate.vertices, np.float64)
    for k in range(frames):
        s.DoDynamics(sim_time / frames)
        pts, fs = tracker.GetContactForces()
        load = -fs[:, 2].sum() if len(fs) else 0.0
        # "FEA" responds: deflection grows with the carried load
        w = min(0.004, 2e-4 * load)
        tracker.UpdateMesh(deflect(v0, w))
        print(f"frame {k}: plate load {load:.2f} N -> deflection "
              f"{w*1000:.2f} mm, contacts {len(fs)}")
    return s


if __name__ == "__main__":
    main()
