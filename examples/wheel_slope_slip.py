"""Wheel slip vs slope — DEMdemo_WheelSlopeSlip (reference
src/demo/DEMdemo_WheelSlopeSlip.cpp): a driven wheel climbs a slope
(implemented, like the reference, by tilting the gravity vector); the
steady-state slip = 1 - v_actual / (omega R) grows with the slope angle."""

import numpy as np

import dem_engine_tpu as dem
from wheel_dp import make_wheel_mesh, WHEEL_FAMILY


def build(slope_deg=5.0, n_side=8, r=0.008, h=5e-6, omega=2.0,
          wheel_rad=0.05, verbosity="QUIET"):
    s = dem.DEMSolver()
    s.SetVerbosity(verbosity)
    s.InstructBoxDomainDimension(0.8, 0.3, 0.4)
    s.InstructBoxDomainBoundingBC("all")
    mat = s.LoadMaterial({"E": 1e8, "nu": 0.3, "CoR": 0.4, "mu": 0.6,
                          "Crr": 0.05})
    rho = 2600.0
    tmpl = s.LoadSphereType(rho * 4 / 3 * np.pi * r**3, r, mat)
    half = np.asarray([0.35, 0.1, 3.3 * r])
    pts = dem.DEMBoxGridSampler(
        [0, 0, -0.2 + 1.2 * r + half[2]], half, 2.05 * r)
    s.AddClumps(tmpl, pts)

    verts, faces = make_wheel_mesh(radius=wheel_rad, width=0.04)
    wheel = dem.DEMMeshConnected(vertices=verts, faces=faces)
    wheel.SetMaterial(mat)
    wheel.SetMass(5.0)
    iw = 0.5 * 5.0 * wheel_rad**2
    wheel.SetMOI([iw / 2, iw, iw / 2])
    z_top = -0.2 + 1.2 * r + 2 * half[2]
    wheel.SetInitPos([-0.2, 0, z_top + wheel_rad - r])
    wheel.SetFamily(WHEEL_FAMILY)
    s.AddWavefrontMeshObject(wheel)

    # driven wheel, x and z free (it climbs "uphill" against the tilted
    # gravity, the reference's G-vector trick)
    s.SetFamilyPrescribedAngVel(WHEEL_FAMILY, 0.0, omega, 0.0)
    ang = np.radians(slope_deg)
    s.SetGravitationalAcceleration(
        [-9.81 * np.sin(ang), 0.0, -9.81 * np.cos(ang)])
    s.SetInitTimeStep(h)
    s.SetCDUpdateFreq(20)
    s.SetExpandSafetyAdder(0.3)
    s.Initialize()
    tracker = s.Track(wheel)
    return s, tracker, omega * wheel_rad


def measure_slip(s, tracker, rim_speed, t_meas=0.4):
    x0 = tracker.Pos()[0]
    s.DoDynamics(t_meas)
    v = (tracker.Pos()[0] - x0) / t_meas
    return 1.0 - v / rim_speed


def main(slopes=(0.0, 5.0, 10.0)):
    out = []
    for sl in slopes:
        s, tracker, rim = build(slope_deg=sl, verbosity="QUIET")
        s.DoDynamics(0.25)  # spin-up / settle
        slip = measure_slip(s, tracker, rim)
        out.append((sl, slip))
        print(f"slope {sl:5.1f} deg -> slip {slip:.3f}")
    return out


if __name__ == "__main__":
    main()
