"""End-to-end physics verification on the TPU through the public API.

Covers the round-3 changes: slab-vectorized fused Hertz kernel (4-row
wildcards, bf16x3 one-hot matmuls, merged other-side gather) and the
two-class polydisperse CD. Asserts observed physics, not snapshots.
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dem_engine_tpu.utils import compile_cache

compile_cache.enable()


def build(poly=False):
    from dem_engine_tpu.api import DEMSolver

    rng = np.random.default_rng(7)
    s = DEMSolver()
    s.InstructBoxDomainDimension(0.5, 0.5, 0.3)
    mat = s.LoadMaterial(
        {"E": 1e7, "nu": 0.3, "CoR": 0.3, "mu": 0.5, "Crr": 0.3})
    r = 0.01
    rho = 2.6e3
    t_s = s.LoadSphereType(rho * 4 / 3 * np.pi * r**3, r, mat)
    grid = np.stack(np.meshgrid(
        np.arange(10), np.arange(10), np.arange(3), indexing="ij"),
        axis=-1).reshape(-1, 3)
    pos = grid * [0.021, 0.021, 0.021]
    pos[:, 0] += 0.1
    pos[:, 1] += 0.1
    pos[:, 2] += 0.012  # bottom layer 2 mm above the floor
    n = len(pos)
    s.AddClumps(t_s, pos)
    n_large = 0
    if poly:
        rl = 3 * r
        t_l = s.LoadSphereType(rho * 4 / 3 * np.pi * rl**3, rl, mat)
        # just above the small bed (drop ~2 mm: a 27x-mass impactor at
        # speed needs a much smaller dt than the bed itself)
        pos_l = np.asarray(
            [[0.14 + 0.07 * i, 0.14 + 0.07 * j, 0.064 + rl + 0.002]
             for i in range(3) for j in range(3)])
        s.AddClumps(t_l, pos_l)
        n_large = len(pos_l)
    s.AddBCPlane([0.25, 0.25, 0.0], [0, 0, 1], mat)
    s.SetInitTimeStep(5e-6 if poly else 2e-5)
    s.SetGravitationalAcceleration([0, 0, -9.81])
    s.SetCDUpdateFreq(20)
    s.Initialize()
    masses = [rho * 4 / 3 * np.pi * r**3] * n
    if poly:
        masses += [rho * 4 / 3 * np.pi * (3 * r)**3] * n_large
    return s, n + n_large, np.asarray(masses)


def energy(s, n, masses):
    p = np.asarray(s.GetOwnerPosition())[:n]
    v = np.asarray(s.GetOwnerVelocity())[:n]
    ke = 0.5 * np.sum(masses * np.sum(v * v, axis=1))
    pe = 9.81 * np.sum(masses * p[:, 2])
    return ke + pe, p, v


def run_case(name, poly, check_two_class=True):
    s, n, masses = build(poly)
    assert s.engine.cfg.use_fused_force, "fused force pass not active!"
    if poly and check_two_class:
        assert s.engine.cfg.cd_two_class, "two-class CD not auto-enabled!"
        print(f"[{name}] cd_two_class on, cls_thr={s._cls_thr:.4f}")
    elif not poly:
        assert not s.engine.cfg.cd_two_class
    e_prev = None
    for w in range(4):
        s.DoDynamics(0.15)
        e, p, v = energy(s, n, masses)
        zmin, zmax = p[:, 2].min(), p[:, 2].max()
        p90 = np.percentile(np.linalg.norm(v, axis=1), 90)
        print(f"[{name}] t={s.GetTime():.2f}s E={e:.4f}J "
              f"z=[{zmin:.4f},{zmax:.4f}] p90|v|={p90:.4f}", flush=True)
        assert zmin > 0.005, f"sphere through the floor: {zmin}"
        assert zmax < 0.2, f"sphere launched: {zmax}"
        if e_prev is not None:
            # KE + gravity PE only: stored elastic contact energy (not
            # summed here) breathes ~1% between windows as the bed creeps
            assert e < e_prev * 1.02 + 1e-4, f"energy grew: {e_prev} -> {e}"
        if w == 0:
            e_first = e
        e_prev = e
    assert e_prev <= e_first * 1.02, (e_first, e_prev)
    assert p90 < 0.03, f"bed did not settle: p90|v|={p90}"

    # floor reaction must carry the bed weight (drives the extras pass)
    info = s.GetContactDetailedInfo()
    fz = 0.0
    for blk in info:
        if blk["kind"] == "SA":
            fz += float(np.sum(np.asarray(blk["force"])[:, 2]))
    w_bed = 9.81 * masses.sum()
    print(f"[{name}] floor reaction {abs(fz):.4f} N vs weight "
          f"{w_bed:.4f} N", flush=True)
    assert abs(abs(fz) - w_bed) < 0.05 * w_bed, (fz, w_bed)
    print(f"[{name}] OK", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "mono"):
        run_case("mono", poly=False)
    if which in ("all", "poly"):
        run_case("poly3", poly=True)
    print("VERIFY_R3_ALL_OK", flush=True)
