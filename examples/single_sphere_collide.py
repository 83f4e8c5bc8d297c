"""Installation smoke test — DEMdemo_SingleSphereCollide (reference
src/demo/DEMdemo_SingleSphereCollide.cpp, the designated install check,
README.md:163): one sphere dropped onto a plane; the rebound height follows
the restitution coefficient."""

import numpy as np

import dem_engine_tpu as dem


def build(cor=0.6, r=0.02, drop_h=0.1, h=2e-6, verbosity="QUIET"):
    s = dem.DEMSolver()
    s.SetVerbosity(verbosity)
    s.InstructBoxDomainDimension(1.0, 1.0, 1.0)
    mat = s.LoadMaterial({"E": 1e9, "nu": 0.3, "CoR": cor, "mu": 0.3,
                          "Crr": 0.0})
    m = 2600 * 4 / 3 * np.pi * r**3
    tmpl = s.LoadSphereType(m, r, mat)
    s.AddClumps(tmpl, np.asarray([[0.0, 0.0, r + drop_h]]))
    s.AddBCPlane([0, 0, 0], [0, 0, 1], mat)
    s.SetInitTimeStep(h)
    s.SetGravitationalAcceleration([0, 0, -9.81])
    s.SetCDUpdateFreq(30)
    s.Initialize()
    return s


def main(cor=0.6, drop_h=0.1):
    s = build(cor=cor, drop_h=drop_h, verbosity="INFO")
    t_impact = np.sqrt(2 * drop_h / 9.81)
    s.DoDynamics(1.9 * t_impact)
    zmax = 0.0
    for _ in range(40):
        s.DoDynamics(0.01)
        zmax = max(zmax, float(s.GetOwnerPosition()[0, 2]))
    rebound = zmax - 0.02
    print(f"drop {drop_h:.3f} m, CoR {cor}: rebound {rebound:.4f} m "
          f"(ideal {cor*cor*drop_h:.4f})")
    return rebound


if __name__ == "__main__":
    main()
