"""Polydisperse terrain preparation + checkpointed reuse — the
DEMdemo_GRCPrep_Part1/2/3 workflow (reference src/demo/DEMdemo_GRCPrep_*.cpp):
settle a polydisperse clump bed, write a checkpoint, and rebuild a fresh
solver from it (the terrain reuse path WheelDP relies on)."""

import numpy as np

import dem_engine_tpu as dem


def make_templates(solver, mat, r_mean=0.006, rho=2600.0):
    """Three 3-sphere clump types at 0.75x / 1x / 1.4x scale (the reference
    uses seven GRC-1 grain shapes; same mechanism)."""
    tmpls = []
    for scale in (0.75, 1.0, 1.4):
        r = r_mean * scale
        m_sph = rho * 4 / 3 * np.pi * r**3
        mass = 3 * m_sph
        i_sph = 2 / 5 * m_sph * r**2
        moi = [3 * i_sph + 2 * m_sph * (0.8 * r) ** 2] * 2 + [3 * i_sph]
        rel = np.asarray([[-0.8 * r, 0, 0], [0, 0, 0], [0.8 * r, 0, 0]])
        t = solver.LoadClumpType(mass, moi, [r, r, r], rel, mat)
        t.AssignName(f"grc_{scale}")
        tmpls.append(t)
    return tmpls


def build(n_clumps=240, seed=0, verbosity="QUIET", h=1e-5):
    solver = dem.DEMSolver()
    solver.SetVerbosity(verbosity)
    solver.InstructBoxDomainDimension(0.4, 0.4, 0.5)
    solver.InstructBoxDomainBoundingBC("all")
    mat = solver.LoadMaterial(
        {"E": 1e8, "nu": 0.3, "CoR": 0.4, "mu": 0.5, "Crr": 0.02}
    )
    tmpls = make_templates(solver, mat)
    rng = np.random.default_rng(seed)
    pts = dem.HCPSampler(0.026).SampleBox([0, 0, -0.1], [0.17, 0.17, 0.12])
    pts = pts[:n_clumps]
    kinds = rng.integers(0, len(tmpls), size=pts.shape[0])
    batch = solver.AddClumps([tmpls[k] for k in kinds], pts)
    solver.SetInitTimeStep(h)
    solver.SetGravitationalAcceleration([0, 0, -9.81])
    solver.SetCDUpdateFreq(20)
    solver.SetExpandSafetyAdder(0.3)
    solver.Initialize()
    return solver, batch, tmpls


def restore(checkpoint_csv, verbosity="QUIET", h=1e-5, initialize=True):
    """Rebuild a solver from a terrain checkpoint (the WheelDP restart
    recipe: ReadClumpXyzFromCsv + ReadClumpQuatFromCsv -> AddClumps,
    reference DEMdemo_WheelDP.cpp:115-196). With initialize=False the
    caller may add more objects (meshes, compactors) before Initialize."""
    solver = dem.DEMSolver()
    solver.SetVerbosity(verbosity)
    solver.InstructBoxDomainDimension(0.4, 0.4, 0.5)
    solver.InstructBoxDomainBoundingBC("all")
    mat = solver.LoadMaterial(
        {"E": 1e8, "nu": 0.3, "CoR": 0.4, "mu": 0.5, "Crr": 0.02}
    )
    tmpls = {t.name: t for t in make_templates(solver, mat)}
    xyz = dem.DEMSolver.ReadClumpXyzFromCsv(checkpoint_csv)
    quat = dem.DEMSolver.ReadClumpQuatFromCsv(checkpoint_csv)
    for name, pos in xyz.items():
        b = solver.AddClumps([tmpls[name]] * len(pos), pos)
        b.SetOriQ(quat[name])
    solver.SetInitTimeStep(h)
    solver.SetGravitationalAcceleration([0, 0, -9.81])
    solver.SetCDUpdateFreq(20)
    # stash for chained prep stages (grc_prep_part2/3)
    solver._grc_templates = tmpls
    solver._grc_material = mat
    if initialize:
        solver.Initialize()
    return solver


def main():
    solver, batch, tmpls = build(n_clumps=2000, verbosity="INFO")
    solver.DoDynamics(0.5)
    solver.WriteClumpFile("grc_terrain.csv")
    print("terrain checkpoint written; max_z =",
          solver.CreateInspector("clump_max_z").GetValue())


if __name__ == "__main__":
    main()
