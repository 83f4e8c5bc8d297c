"""Force-chain stress test — DEMdemo_ContactChain (reference
src/demo/DEMdemo_ContactChain.cpp): columns of spheres carry the weight of
a massively heavy cap (applied as a family added-acceleration); the bottom
contact must transmit the whole column load without the chain collapsing."""

import numpy as np

import dem_engine_tpu as dem

CAP_FAMILY = 3
ACTIVE_FAMILY = 2


def build(n_stack=8, r=0.02, mass_multiplier=5.0, h=1e-6,
          verbosity="QUIET"):
    s = dem.DEMSolver()
    s.SetVerbosity(verbosity)
    s.InstructBoxDomainDimension(1.0, 1.0, 2.0)
    mat = s.LoadMaterial({"E": 1e9, "nu": 0.3, "CoR": 0.3, "mu": 0.5,
                          "Crr": 0.01})
    rho = 1000.0
    m = rho * 4 / 3 * np.pi * r**3
    tmpl = s.LoadSphereType(m, r, mat)
    # a vertical column, slightly compressed spacing so contacts exist
    z = np.arange(n_stack) * (1.999 * r) + r - 0.9
    pts = np.stack([np.zeros(n_stack), np.zeros(n_stack), z], axis=1)
    batch = s.AddClumps([tmpl] * n_stack, pts)
    fams = np.zeros(n_stack, int)
    fams[-1] = CAP_FAMILY  # top sphere becomes the heavy cap
    batch.SetFamilies(fams)
    s.AddBCPlane([0, 0, -0.9], [0, 0, 1], mat)
    # the cap's extra weight: added acceleration = (multiplier) * g down
    s.AddFamilyPrescribedAcc(ACTIVE_FAMILY, 0.0, 0.0,
                             -9.81 * mass_multiplier)
    s.SetInitTimeStep(h)
    s.SetGravitationalAcceleration([0, 0, -9.81])
    s.SetCDUpdateFreq(25)
    s.Initialize()
    return s, m, n_stack


def bottom_force(s):
    """Normal force carried by the floor (sum over sphere-plane
    contacts)."""
    info = [i for i in s.GetContactDetailedInfo() if i["kind"] == "SA"]
    if not info:
        return 0.0
    return float(sum(i["force"][:, 2].sum() for i in info))


def main(mass_multiplier=5.0):
    s, m, n = build(mass_multiplier=mass_multiplier, verbosity="INFO")
    s.DoDynamics(0.03)  # settle the chain
    # engage the heavy cap
    s.ChangeFamily(CAP_FAMILY, ACTIVE_FAMILY)
    s.DoDynamics(0.05)
    f = bottom_force(s)
    expected = m * 9.81 * (n + mass_multiplier)
    print(f"bottom force {f:.3f} N vs column weight {expected:.3f} N")
    return f, expected


if __name__ == "__main__":
    main()
