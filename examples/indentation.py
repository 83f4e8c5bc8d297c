"""Spherical indentation of a granular bed — DEMdemo_Indentation
(reference src/demo/DEMdemo_Indentation.cpp).

A heavy ball sinks into a settled bed under its own weight; owner
wildcards tag the indenter for output. Quantitative check: the final
penetration depth is positive, bounded by the ball radius, and a heavier
ball sinks deeper (bearing-capacity monotonicity).
"""

import numpy as np

import dem_engine_tpu as dem

BALL_FAMILY = 3


def build(n=700, r=0.004, ball_r=0.02, ball_rho=6000.0,
          verbosity="QUIET", h=2e-5):
    s = dem.DEMSolver()
    s.SetVerbosity(verbosity)
    s.InstructBoxDomainDimension(0.3, 0.3, 0.4)
    s.InstructBoxDomainBoundingBC("all")
    mat = s.LoadMaterial({"E": 5e7, "nu": 0.3, "CoR": 0.3, "mu": 0.4,
                          "Crr": 0.02})
    s.SetOwnerWildcards(["is_indenter"])
    tmpl = s.LoadSphereType(2600 * 4 / 3 * np.pi * r**3, r, mat)
    pts = dem.HCPSampler(2.1 * r).SampleBox(
        [0, 0, -0.14], [0.10, 0.10, 0.05]
    )
    rng = np.random.default_rng(3)
    pts = pts + rng.uniform(-0.03 * r, 0.03 * r, pts.shape)
    s.AddClumps(tmpl, pts[:n])

    ball_t = s.LoadSphereType(
        ball_rho * 4 / 3 * np.pi * ball_r**3, ball_r, mat
    )
    bb = s.AddClumps(ball_t, np.asarray([[0.0, 0.0, -0.062]]))
    bb.SetFamilies([BALL_FAMILY])
    s.SetFamilyFixed(BALL_FAMILY)  # held during bed settling
    s.SetInitTimeStep(h)
    s.SetGravitationalAcceleration([0, 0, -9.81])
    s.SetCDUpdateFreq(20)
    return s, len(pts[:n])


RELEASED_FAMILY = 4


def release_ball(s, ball_owner_id):
    """Settle-then-release protocol (the reference demo's recipe)."""
    s.ChangeClumpFamily(RELEASED_FAMILY, owner_ids=[ball_owner_id])


def main(n=4000, sim_time=1.0, verbosity="INFO"):
    s, n_bed = build(n=n, verbosity=verbosity)
    s.Initialize()
    s.SetFamilyOwnerWildcardValue(BALL_FAMILY, "is_indenter", 1.0)
    s.DoDynamics(0.3)  # settle the bed with the ball held fixed
    surf = s.CreateInspector("clump_max_z").GetValue()
    release_ball(s, n_bed)
    ball_z0 = s.GetOwnerPosition()[n_bed, 2]
    s.DoDynamics(sim_time)
    ball_z1 = s.GetOwnerPosition()[n_bed, 2]
    depth = ball_z0 - ball_z1
    print(f"indentation depth {depth * 1e3:.2f} mm (surface {surf:.4f})")
    return depth


if __name__ == "__main__":
    main()
