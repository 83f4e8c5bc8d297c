"""Round-4 /verify driver: observed physics at the public DEMSolver
surface on the real TPU, exercising the changes of this round:
  * sort-based history carry (ops/history.py _merge_match rework) —
    friction history must still settle the bed;
  * two-stage precise triangle binning (ops/binning.py find_pairs_st) —
    an INCLINED mesh plate must catch dropped spheres (ST contacts) and
    shed them onto the bed;
  * uniq-fetch default-on fused pass (api.py) — the production SS path.

Asserts: fused path active, nothing tunnels the floor, energy decreases
across windows, bed settles, floor reaction ~= supported weight, ST
contacts appear on the plate.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from dem_engine_tpu.utils import compile_cache

compile_cache.enable()

import dem_engine_tpu as dem  # noqa: E402

R = 0.01
RHO = 2500.0
G = 9.81


def main():
    s = dem.DEMSolver()
    s.SetVerbosity("QUIET")
    s.InstructBoxDomainDimension(1.0, 1.0, 1.0)
    mat = s.LoadMaterial({"E": 1e8, "nu": 0.3, "CoR": 0.4, "mu": 0.5,
                          "Crr": 0.25})
    m = RHO * 4 / 3 * np.pi * R**3
    t = s.LoadSphereType(m, R, mat)

    # 8x8x3 bed, pitch 2.1R (non-touching laterally)
    xs = np.arange(8) * 2.1 * R
    zs = np.arange(3) * 2.05 * R + R + 0.001
    gx, gy, gz = np.meshgrid(xs, xs, zs, indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1)
    pts[:, :2] -= xs.mean()
    n_bed = len(pts)
    s.AddClumps(t, pts)

    # inclined 2-triangle plate above one corner: droppers land on it
    # (ST contacts through the new two-stage binning) and roll off
    pl = 0.12
    verts = np.asarray([[-pl, -pl, 0], [pl, -pl, 0], [pl, pl, 0],
                        [-pl, pl, 0]], float)
    ang = np.deg2rad(12.0)
    rot = np.asarray([[1, 0, 0],
                      [0, np.cos(ang), -np.sin(ang)],
                      [0, np.sin(ang), np.cos(ang)]])
    verts = verts @ rot.T + np.asarray([0.0, 0.0, 0.18])
    mesh = dem.DEMMeshConnected(
        vertices=verts, faces=np.asarray([[0, 1, 2], [0, 2, 3]]))
    mesh.SetMaterial(mat)
    mesh.SetMass(1.0)
    mesh.SetMOI([0.1, 0.1, 0.1])
    mesh.SetFamily(200)
    s.AddWavefrontMeshObject(mesh)
    s.SetFamilyFixed(200)

    # droppers above the plate
    drop = np.asarray([[0.0, -0.03, 0.26], [0.03, 0.0, 0.27],
                       [-0.03, 0.02, 0.28]])
    s.AddClumps(t, drop)
    n_all = n_bed + len(drop)

    s.AddBCPlane([0, 0, 0], [0, 0, 1], mat)
    s.SetInitTimeStep(2e-5)
    s.SetGravitationalAcceleration([0, 0, -G])
    s.SetCDUpdateFreq(20)
    s.SetExpandSafetyAdder(0.2)
    s.Initialize()

    assert s.engine.cfg.use_fused_force, "fused TPU path not active!"
    assert s.engine.cfg.uniq_cap > 0, "uniq-fetch default-on expected"

    def energy_and_stats():
        p = np.asarray(s.GetOwnerPosition())[:n_all]
        v = np.asarray(s.GetOwnerVelocity())[:n_all]
        ke = 0.5 * m * np.sum(v * v)
        pe = m * G * np.sum(p[:, 2])
        return ke + pe, p, v

    st_seen = 0
    e_hist = []
    t0 = time.time()
    for w in range(6):
        s.DoDynamics(0.08)
        e, p, v = energy_and_stats()
        e_hist.append(e)
        info = s.GetContactDetailedInfo()
        kinds = {b["kind"]: b for b in info}
        n_st = int(np.sum(np.asarray(kinds["ST"]["idA"]) >= 0)) \
            if "ST" in kinds else 0
        st_seen = max(st_seen, n_st)
        zmin = p[:, 2].min()
        print(f"[w{w}] t={0.08*(w+1):.2f}s E={e:.4f} J zmin={zmin:.4f} "
              f"p90|v|={np.percentile(np.linalg.norm(v, axis=1), 90):.4f} "
              f"n_st={n_st}", flush=True)
        assert zmin > 0.5 * R, f"tunneled the floor: zmin={zmin}"
        assert p[:, 2].max() < 0.6, "launched"

    # energy decreasing across windows (tolerate tiny jitter)
    for a, b in zip(e_hist[:-1], e_hist[1:]):
        assert b <= a * 1.02 + 1e-6, e_hist
    assert e_hist[-1] < e_hist[0], e_hist

    # plate caught the droppers at some point
    assert st_seen > 0, "no ST contacts ever formed on the plate"

    # settled: p90 |v| small
    _, p, v = energy_and_stats()
    p90 = np.percentile(np.linalg.norm(v, axis=1), 90)
    assert p90 < 0.08, f"bed not settling: p90|v|={p90}"

    # floor reaction ~= weight of everything resting (droppers may still
    # roll; compare against the bed weight with a generous band)
    info = s.GetContactDetailedInfo()
    sa = next(b for b in info if b["kind"] == "SA")
    live = np.asarray(sa["idA"]) >= 0
    fz = float(np.asarray(sa["force"])[live][:, 2].sum())
    w_bed = n_all * m * G
    print(f"floor reaction {fz:.3f} N vs total weight {w_bed:.3f} N",
          flush=True)
    assert 0.7 * w_bed < fz < 1.15 * w_bed, (fz, w_bed)

    print(f"VERIFY_OK in {time.time()-t0:.0f}s wall", flush=True)


if __name__ == "__main__":
    main()
