"""Terrain prep, stage 2 — DEMdemo_GRCPrep_Part2 (reference
src/demo/DEMdemo_GRCPrep_Part2.cpp): restore the Part-1 checkpoint, rain an
additional fill layer onto the settled bed, re-settle, and write the
thicker-terrain checkpoint for Part 3 / WheelDP."""

import numpy as np

import dem_engine_tpu as dem
from grc_prep import build, restore, make_templates


def run_part1(path, n_clumps=240, sim_time=0.4):
    solver, batch, tmpls = build(n_clumps=n_clumps)
    solver.DoDynamics(sim_time)
    solver.WriteClumpFile(path)
    return solver


def run_part2(path_in, path_out, n_extra=120, sim_time=0.4,
              verbosity="QUIET"):
    solver = restore(path_in, verbosity=verbosity)
    # add the fill layer above the restored bed, using the templates the
    # restore re-registered (matched by name, like the reference's
    # checkpoint flow)
    zmax = solver.CreateInspector("clump_max_z").GetValue()
    tmpls = list(solver._grc_templates.values())
    rng = np.random.default_rng(7)
    pts = dem.HCPSampler(0.028).SampleBox(
        [0, 0, zmax + 0.05], [0.15, 0.15, 0.04])
    pts = pts[:n_extra]
    kinds = rng.integers(0, len(tmpls), size=len(pts))
    solver.AddClumps([tmpls[k] for k in kinds], pts)
    solver.UpdateClumps()
    solver.DoDynamics(sim_time)
    solver.WriteClumpFile(path_out)
    return solver, len(pts)


def main(tmp="/tmp"):
    p1 = f"{tmp}/grc_part1.csv"
    p2 = f"{tmp}/grc_part2.csv"
    run_part1(p1)
    solver, n = run_part2(p1, p2, verbosity="INFO")
    print(f"part2 done: +{n} clumps, checkpoint {p2}; bed top =",
          solver.CreateInspector("clump_max_z").GetValue())


if __name__ == "__main__":
    main()
