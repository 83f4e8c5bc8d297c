"""Vibratory compaction — DEMdemo_Shake (reference
src/demo/DEMdemo_Shake.cpp): a box of clumps is shaken by a prescribed
sinusoidal wall motion; the bed compacts (max height drops) over cycles."""

import numpy as np

import dem_engine_tpu as dem

SHAKER_FAMILY = 1


def build(n=250, r=0.006, amp=0.6, freq=30.0, h=2e-5, verbosity="QUIET"):
    s = dem.DEMSolver()
    s.SetVerbosity(verbosity)
    s.InstructBoxDomainDimension(0.4, 0.4, 0.5)
    mat = s.LoadMaterial({"E": 5e7, "nu": 0.3, "CoR": 0.3, "mu": 0.4,
                          "Crr": 0.02})
    rho = 2600.0
    m_sph = rho * 4 / 3 * np.pi * r**3
    rel = np.asarray([[0.8 * r, 0, 0], [-0.8 * r, 0, 0]])
    i_s = 2 / 5 * m_sph * r**2
    moi = [2 * i_s, 2 * i_s + 2 * m_sph * (0.8 * r) ** 2,
           2 * i_s + 2 * m_sph * (0.8 * r) ** 2]
    tmpl = s.LoadClumpType(2 * m_sph, moi, [r, r], rel, mat)
    pts = dem.HCPSampler(3.4 * r).SampleBox([0, 0, -0.1], [0.05, 0.05, 0.1])
    pts = pts[:n]
    s.AddClumps(tmpl, pts)

    # the shaker: floor + low walls owned by a prescribed family
    tray = s.AddExternalObject()
    tray.AddPlane([0, 0, -0.22], [0, 0, 1], mat)
    tray.AddPlane([-0.08, 0, 0], [1, 0, 0], mat)
    tray.AddPlane([0.08, 0, 0], [-1, 0, 0], mat)
    tray.AddPlane([0, -0.08, 0], [0, 1, 0], mat)
    tray.AddPlane([0, 0.08, 0], [0, -1, 0], mat)
    tray.SetFamily(SHAKER_FAMILY)
    # sinusoidal vertical shake (the reference prescribes a sin-pattern
    # velocity string; here a traced callable of time)
    import jax.numpy as jnp

    om = 2 * np.pi * freq
    v_amp = 0.05 * amp
    s.SetFamilyPrescribedLinVel(
        SHAKER_FAMILY, 0.0, 0.0, lambda t: v_amp * jnp.sin(om * t),
    )
    s.SetInitTimeStep(h)
    s.SetGravitationalAcceleration([0, 0, -9.81])
    s.SetCDUpdateFreq(15)
    s.SetExpandSafetyAdder(0.5)
    s.Initialize()
    return s, len(pts)


def main(cycles_time=0.5):
    s, n = build(verbosity="INFO")
    s.DoDynamics(0.25)  # settle
    z0 = s.CreateInspector("clump_max_z").GetValue()
    s.DoDynamics(cycles_time)  # shake
    s.DoDynamics(0.15)  # relax
    z1 = s.CreateInspector("clump_max_z").GetValue()
    print(f"bed top before shake {z0:.4f}, after {z1:.4f}")
    return z0, z1


if __name__ == "__main__":
    main()
