"""Size classification — DEMdemo_Sieve (reference
src/demo/DEMdemo_Sieve.cpp): a vibrating sieve plate (a grid of fixed
spheres with gaps) separates a bimodal mixture; fines fall through, coarse
grains stay on top."""

import numpy as np

import dem_engine_tpu as dem

SIEVE_FAMILY = 1


def build(n_each=120, r_small=0.004, r_large=0.011, gap=0.013,
          h=2e-5, verbosity="QUIET"):
    """gap is the clear opening between sieve-grid spheres: between
    r_small and r_large diameters."""
    s = dem.DEMSolver()
    s.SetVerbosity(verbosity)
    s.InstructBoxDomainDimension(0.5, 0.5, 0.6)
    mat = s.LoadMaterial({"E": 5e7, "nu": 0.3, "CoR": 0.4, "mu": 0.3,
                          "Crr": 0.005})
    rho = 2600.0

    # sieve plate: a grid of fixed spheres at z=0 with `gap` openings
    # (the reference builds the sieve exactly this way, LoadSphereType of
    # sieve_sp_r + a grid sampler)
    r_mesh = 0.004
    pitch = 2 * r_mesh + gap
    xs = np.arange(-0.10, 0.10 + 1e-9, pitch)
    gx, gy = np.meshgrid(xs, xs)
    grid = np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], axis=1)
    t_mesh = s.LoadSphereType(5.0, r_mesh, mat)
    bmesh = s.AddClumps([t_mesh] * len(grid), grid)
    bmesh.SetFamilies(np.full(len(grid), SIEVE_FAMILY))

    # the mixture above the sieve
    t_small = s.LoadSphereType(rho * 4 / 3 * np.pi * r_small**3, r_small,
                               mat)
    t_large = s.LoadSphereType(rho * 4 / 3 * np.pi * r_large**3, r_large,
                               mat)
    rng = np.random.default_rng(0)
    pts = dem.HCPSampler(2.3 * r_large).SampleBox(
        [0, 0, 0.06], [0.08, 0.08, 0.045])
    rng.shuffle(pts)
    pts = pts[: 2 * n_each]
    kinds = np.asarray([0, 1] * (len(pts) // 2))[: len(pts)]
    tm = [t_small if k == 0 else t_large for k in kinds]
    s.AddClumps(tm, pts)

    # shake the sieve laterally+vertically (reference: sin pattern after 1s)
    import jax.numpy as jnp

    s.SetFamilyPrescribedLinVel(
        SIEVE_FAMILY, lambda t: 0.08 * jnp.sin(120.0 * t), 0.0,
        lambda t: 0.08 * jnp.sin(90.0 * t),
    )
    s.AddBCPlane([0, 0, -0.25], [0, 0, 1], mat)
    s.SetInitTimeStep(h)
    s.SetGravitationalAcceleration([0, 0, -9.81])
    s.SetCDUpdateFreq(15)
    s.SetExpandSafetyAdder(0.3)
    s.Initialize()
    return s, len(grid), kinds


def passed_fraction(s, n_grid, kinds):
    """Fraction of each species that ended below the sieve plane."""
    pos = s.GetOwnerPosition()[n_grid: n_grid + len(kinds)]
    below = pos[:, 2] < -0.02
    small = below[kinds == 0].mean() if (kinds == 0).any() else 0.0
    large = below[kinds == 1].mean() if (kinds == 1).any() else 0.0
    return float(small), float(large)


def main(sim_time=1.2):
    s, n_grid, kinds = build(verbosity="INFO")
    s.DoDynamics(sim_time)
    small, large = passed_fraction(s, n_grid, kinds)
    print(f"passed: {small*100:.0f}% of fines, {large*100:.0f}% of coarse")
    return small, large


if __name__ == "__main__":
    main()
