"""Cone penetration — DEMdemo_ConePenetration (reference
src/demo/DEMdemo_ConePenetration.cpp).

A conical tip (triangle mesh) is pushed into a settled granular bed at
constant velocity (prescribed family); the resistance force is read from
the tracker. Penetration resistance must grow with depth (the cone index
curve), the basis of CPT soil characterization.
"""

import numpy as np

import dem_engine_tpu as dem
from dem_engine_tpu.structs import DEMMeshConnected

CONE_FAMILY = 10


def make_cone(radius=0.02, height=0.04, nseg=12):
    """Open cone mesh, apex pointing -z, apex at the origin."""
    ang = np.linspace(0, 2 * np.pi, nseg, endpoint=False)
    rim = np.stack([radius * np.cos(ang), radius * np.sin(ang),
                    np.full(nseg, height)], axis=1)
    verts = np.concatenate([[[0.0, 0.0, 0.0]], rim])
    faces = [[0, 1 + i, 1 + (i + 1) % nseg] for i in range(nseg)]
    return verts, np.asarray(faces)


def build(n=800, r=0.004, speed=0.1, verbosity="QUIET", h=2e-5):
    s = dem.DEMSolver()
    s.SetVerbosity(verbosity)
    s.InstructBoxDomainDimension(0.3, 0.3, 0.4)
    s.InstructBoxDomainBoundingBC("all")
    mat = s.LoadMaterial({"E": 5e7, "nu": 0.3, "CoR": 0.4, "mu": 0.4,
                          "Crr": 0.02})
    rho = 2600.0
    tmpl = s.LoadSphereType(rho * 4 / 3 * np.pi * r**3, r, mat)
    pts = dem.HCPSampler(2.1 * r).SampleBox(
        [0, 0, -0.14], [0.05, 0.05, 0.05]
    )
    rng = np.random.default_rng(1)
    pts = pts + rng.uniform(-0.03 * r, 0.03 * r, pts.shape)
    s.AddClumps(tmpl, pts[:n])

    cv, cf = make_cone()
    mesh = DEMMeshConnected(vertices=cv, faces=cf)
    mesh.SetInitPos([0.0, 0.0, -0.10])  # apex just above the bed top
    cone = s.AddWavefrontMeshObject(mesh, mat)
    cone.SetFamily(CONE_FAMILY)
    cone.SetMass(0.5)
    cone.SetMOI([1e-4, 1e-4, 1e-4])
    s.SetFamilyFixed(CONE_FAMILY)  # held until the push phase
    tracker = s.Track(mesh)

    s.SetInitTimeStep(h)
    s.SetGravitationalAcceleration([0, 0, -9.81])
    s.SetCDUpdateFreq(20)
    return s, tracker, speed


def push(s, tracker, speed, depth_samples=4, dt_sample=0.05):
    """Drive the cone down; sample (depth, resistance force) pairs.

    The cone is first re-seated just above the MEASURED bed surface so the
    sampled depths are penetration into the bed regardless of how far the
    bed settled."""
    top = s.CreateInspector("clump_max_z").GetValue()
    tracker.SetPos([0.0, 0.0, top + 0.002])
    s.SetFamilyPrescribedLinVel(CONE_FAMILY, 0.0, 0.0, -speed)
    out = []
    z0 = tracker.Pos()[2]
    for _ in range(depth_samples):
        # average the (impulsive) resistance over 3 snapshots per interval
        fzs = []
        for _k in range(3):
            s.DoDynamics(dt_sample / 3)
            pts, fs = tracker.GetContactForces()
            fzs.append(float(fs[:, 2].sum()) if len(fs) else 0.0)
        depth = z0 - tracker.Pos()[2]
        out.append((depth, float(np.mean(fzs))))
    return out


def main(n=6000, verbosity="INFO"):
    s, tracker, speed = build(n=n, verbosity=verbosity)
    s.Initialize()
    s.DoDynamics(0.4)  # settle
    curve = push(s, tracker, speed, depth_samples=8)
    for d, f in curve:
        print(f"depth {d*1e3:6.1f} mm   resistance {f:8.4f} N")
    return curve


if __name__ == "__main__":
    main()
