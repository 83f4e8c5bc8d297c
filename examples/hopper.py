"""Hopper discharge — DEMdemo_Hopper_Sphere_Cylinder (reference
src/demo/DEMdemo_Hopper_Sphere_Cylinder.cpp): grains settle in a wedge
hopper above a closed gate; the gate slides open at a prescribed speed and
the discharge mass-flow is measured."""

import numpy as np

import dem_engine_tpu as dem

GATE_FAMILY = 4


def build(n=300, r=0.005, gate_speed=0.3, h=2e-5, verbosity="QUIET"):
    s = dem.DEMSolver()
    s.SetVerbosity(verbosity)
    s.InstructBoxDomainDimension(0.5, 0.5, 0.9)
    mat = s.LoadMaterial({"E": 5e7, "nu": 0.3, "CoR": 0.4, "mu": 0.4,
                          "Crr": 0.01})
    rho = 2600.0
    tmpl = s.LoadSphereType(rho * 4 / 3 * np.pi * r**3, r, mat)
    pts = dem.HCPSampler(2.2 * r).SampleBox([0, 0, 0.14], [0.05, 0.04, 0.1])
    pts = pts[:n]
    s.AddClumps(tmpl, pts)

    # wedge hopper: two inclined planes meeting at a slot above the gate
    hop = s.AddExternalObject()
    hop.AddPlane([-0.045, 0, 0.08], [0.707, 0, 0.707], mat)
    hop.AddPlane([0.045, 0, 0.08], [-0.707, 0, 0.707], mat)
    hop.AddPlane([0, -0.05, 0.1], [0, 1, 0], mat)
    hop.AddPlane([0, 0.05, 0.1], [0, -1, 0], mat)

    # sliding gate: a thin meshed plate under the slot
    gv = np.asarray([[-0.06, -0.06, 0], [0.06, -0.06, 0],
                     [0.06, 0.06, 0], [-0.06, 0.06, 0]])
    gf = np.asarray([[0, 1, 2], [0, 2, 3]])
    gate = dem.DEMMeshConnected(vertices=gv, faces=gf)
    gate.SetMaterial(mat)
    gate.SetMass(1.0)
    gate.SetMOI([1e-3, 1e-3, 1e-3])
    gate.SetInitPos([0, 0, 0.02])
    gate.SetFamily(GATE_FAMILY)
    s.AddWavefrontMeshObject(gate)
    # closed initially: zero-velocity prescription
    s.SetFamilyPrescribedLinVel(GATE_FAMILY, 0.0, 0.0, 0.0)
    s.SetFamilyPrescribedAngVel(GATE_FAMILY, 0.0, 0.0, 0.0)

    s.AddBCPlane([0, 0, -0.4], [0, 0, 1], mat)
    s.SetInitTimeStep(h)
    s.SetGravitationalAcceleration([0, 0, -9.81])
    s.SetCDUpdateFreq(20)
    s.SetExpandSafetyAdder(0.3)
    s.Initialize()
    return s, len(pts), gate_speed


def open_gate(s, gate_speed):
    """Slide the gate out along +x (reference: family 4 gains the gate
    velocity)."""
    s.SetFamilyPrescribedLinVel(GATE_FAMILY, gate_speed, 0.0, 0.0)


def discharged_fraction(s, n):
    pos = s.GetOwnerPosition()[:n]
    return float((pos[:, 2] < -0.02).mean())


def main():
    s, n, gate_speed = build(verbosity="INFO")
    s.DoDynamics(0.3)  # settle on the closed gate
    assert discharged_fraction(s, n) < 0.05
    open_gate(s, gate_speed)
    for k in range(6):
        s.DoDynamics(0.1)
        print(f"t={0.3 + 0.1*(k+1):.1f} discharged "
              f"{discharged_fraction(s, n)*100:.0f}%")
    return discharged_fraction(s, n)


if __name__ == "__main__":
    main()
