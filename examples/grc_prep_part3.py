"""Terrain prep, stage 3 — DEMdemo_GRCPrep_Part3 (reference
src/demo/DEMdemo_GRCPrep_Part3.cpp): restore the Part-2 checkpoint and
compact the bed with a heavy prescribed plate pressed down and withdrawn;
write the final wheel-ready terrain checkpoint."""

import numpy as np

import dem_engine_tpu as dem
from grc_prep import restore

PLATE_FAMILY = 9


def run_part3(path_in, path_out, press_time=0.25, verbosity="QUIET"):
    # meshes must exist at Initialize; restore without initializing, add
    # the compactor, then Initialize (the reference likewise rebuilds the
    # whole scene from the checkpoint)
    solver = restore(path_in, verbosity=verbosity, initialize=False)
    mat = solver._grc_material
    xyz = dem.DEMSolver.ReadClumpXyzFromCsv(path_in)
    zmax = max(float(np.asarray(v)[:, 2].max()) for v in xyz.values())

    # compactor plate: a meshed square slab lowered onto the bed
    v = np.asarray([[-0.16, -0.16, 0], [0.16, -0.16, 0],
                    [0.16, 0.16, 0], [-0.16, 0.16, 0]])
    f = np.asarray([[0, 2, 1], [0, 3, 2]])  # normal facing down
    plate = dem.DEMMeshConnected(vertices=v, faces=f)
    plate.SetMaterial(mat)
    plate.SetMass(10.0)
    plate.SetMOI([0.1, 0.1, 0.1])
    plate.SetInitPos([0, 0, zmax + 0.02])
    plate.SetFamily(PLATE_FAMILY)
    solver.AddWavefrontMeshObject(plate)
    solver.Initialize()

    # press down, then withdraw (prescribed velocity family)
    solver.SetFamilyPrescribedAngVel(PLATE_FAMILY, 0.0, 0.0, 0.0)
    solver.SetFamilyPrescribedLinVel(PLATE_FAMILY, 0.0, 0.0, -0.05)
    solver.DoDynamics(press_time)
    solver.SetFamilyPrescribedLinVel(PLATE_FAMILY, 0.0, 0.0, 0.25)
    solver.DoDynamics(0.12)
    solver.SetFamilyPrescribedLinVel(PLATE_FAMILY, 0.0, 0.0, 0.0)
    solver.DoDynamics(0.1)  # relax

    solver.WriteClumpFile(path_out)
    return solver


def main(tmp="/tmp"):
    from grc_prep_part2 import run_part1, run_part2

    p1, p2, p3 = (f"{tmp}/grc_p1.csv", f"{tmp}/grc_p2.csv",
                  f"{tmp}/grc_p3.csv")
    run_part1(p1)
    run_part2(p1, p2)
    solver = run_part3(p2, p3, verbosity="INFO")
    print("part3 done; compacted bed top =",
          solver.CreateInspector("clump_max_z").GetValue())


if __name__ == "__main__":
    main()
