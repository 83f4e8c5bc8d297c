"""Flagship reference-scale workflow (VERDICT r3 #8): GRC-style terrain
prep at >= 500k polydisperse clumps -> checkpoint CSV -> WheelDP restart
with a meshed wheel under prescribed slip -> drawbar-pull curve; every
phase timed end-to-end. This is the reference's marquee demo chain
(DEMdemo_GRCPrep_Part1/2 + DEMdemo_WheelDP.cpp:115-196) and exercises
poly CD, checkpointing, mesh contact and prescriptions at scale at once.

Usage:
  python tools/flagship_wheeldp.py [--n 524288] [--settle 0.05]
      [--drive 0.3] [--out /tmp/flagship]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")

from dem_engine_tpu.utils import compile_cache

compile_cache.enable()

import dem_engine_tpu as dem  # noqa: E402

WHEEL_FAMILY = 100
R_MEAN = 0.006
RHO = 2600.0


def make_templates(solver, mat):
    """3-sphere GRC-style grains at 0.75x / 1x / 1.4x (grc_prep.py)."""
    tmpls = []
    for scale in (0.75, 1.0, 1.4):
        r = R_MEAN * scale
        m_sph = RHO * 4 / 3 * np.pi * r**3
        mass = 3 * m_sph
        i_sph = 2 / 5 * m_sph * r**2
        moi = [3 * i_sph + 2 * m_sph * (0.8 * r) ** 2] * 2 + [3 * i_sph]
        rel = np.asarray([[-0.8 * r, 0, 0], [0, 0, 0], [0.8 * r, 0, 0]])
        t = solver.LoadClumpType(mass, moi, [r, r, r], rel, mat)
        t.AssignName(f"grc_{scale}")
        tmpls.append(t)
    return tmpls


def _domain_for(n):
    """Box sized so n clumps stack ~40 grains deep."""
    pitch = 2.6 * R_MEAN
    depth = 40
    side = int(np.ceil(np.sqrt(n / depth)))
    lx = side * pitch + 0.1
    lz = depth * pitch * 1.8 + 0.3
    return lx, lz, side, depth, pitch


def build_prep(n, verbosity="INFO", h=5e-6):
    """Overlap-FREE initial packing: one template per z-layer, xy pitch
    scaled to that template's clump x-extent (the 3-sphere row spans
    3.6*r along x and the clumps insert x-aligned), z gaps scaled to the
    adjacent layers' radii. The first flagship attempts used one global
    2.6*R_MEAN pitch — the 1.4x clumps started interpenetrated, the
    released elastic energy blew per-bin occupancy past every CD ladder
    and ultimately crashed the TPU worker (round-4 stages I/J)."""
    lx, _, _, _, _ = _domain_for(n)
    s = dem.DEMSolver()
    s.SetVerbosity(verbosity)
    mat = s.LoadMaterial({"E": 1e8, "nu": 0.3, "CoR": 0.4, "mu": 0.5,
                          "Crr": 0.02})
    # domain height comes from the actual stack below
    rng = np.random.default_rng(0)
    scales = (0.75, 1.0, 1.4)
    pos = []
    kind_seq = []
    z = 0.0  # filled bottom-up; shifted into the domain at the end
    r_prev = 0.0
    total = 0
    while total < n:
        k = int(rng.integers(0, len(scales)))
        r = R_MEAN * scales[k]
        pitch = 3.9 * r  # > 3.6*r clump x-extent: no xy contact
        side = max(1, int((lx - 0.08) / pitch))
        xs = (np.arange(side) - (side - 1) / 2) * pitch
        g = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1).reshape(-1, 2)
        m = min(g.shape[0], n - total)
        g = g[:m] + rng.uniform(-0.1 * r, 0.1 * r, (m, 2))
        # TOUCHING but overlap-free (1e-4 relative gap): in uniform free
        # fall relative gaps never close, so a 1.05x-gap stack settled
        # for 0.02 s was still a zero-contact falling cloud (first r5
        # flagship run) — start load-bearing instead, bottom ON the floor
        z += (1.0 + 1e-4) * (r_prev + r if r_prev else r)
        layer = np.concatenate([g, np.full((m, 1), z)], axis=1)
        pos.append(layer)
        kind_seq += [k] * m
        r_prev = r
        total += m
    pos = np.concatenate(pos)
    lz = z + 40 * R_MEAN  # headroom for the settle
    pos[:, 2] -= lz / 2  # layer-0 center sits r above the floor at -lz/2
    s.InstructBoxDomainDimension(lx, lx, lz)
    s.InstructBoxDomainBoundingBC("all")
    tmpls = make_templates(s, mat)
    s.AddClumps([tmpls[k] for k in kind_seq], pos)
    s.SetInitTimeStep(h)
    s.SetGravitationalAcceleration([0, 0, -9.81])
    s.SetCDUpdateFreq(25)
    s.Initialize()
    return s, lx, lz


def restore_and_wheel(ckpt, lx, lz, slip=0.3, verbosity="INFO", h=5e-6,
                      wheel_rad=0.12, wheel_mass=50.0):
    s = dem.DEMSolver()
    s.SetVerbosity(verbosity)
    s.InstructBoxDomainDimension(lx, lx, lz)
    s.InstructBoxDomainBoundingBC("all")
    mat = s.LoadMaterial({"E": 1e8, "nu": 0.3, "CoR": 0.4, "mu": 0.5,
                          "Crr": 0.02})
    tmpls = {t.name: t for t in make_templates(s, mat)}
    xyz = dem.DEMSolver.ReadClumpXyzFromCsv(ckpt)
    quat = dem.DEMSolver.ReadClumpQuatFromCsv(ckpt)
    z_top = -1e30
    for name, p in xyz.items():
        batch = s.AddClumps(tmpls[name], np.asarray(p))
        batch.SetOriQ(np.asarray(quat[name]))
        z_top = max(z_top, float(np.asarray(p)[:, 2].max()))

    from wheel_dp import make_wheel_mesh

    verts, faces = make_wheel_mesh(radius=wheel_rad, width=0.08, n_seg=32)
    wheel = dem.DEMMeshConnected(vertices=verts, faces=faces)
    wheel.SetMaterial(mat)
    wheel.SetMass(wheel_mass)
    iw = 0.5 * wheel_mass * wheel_rad**2
    wheel.SetMOI([iw / 2, iw, iw / 2])
    wheel.SetInitPos([-lx / 4, 0, z_top + wheel_rad])
    wheel.SetFamily(WHEEL_FAMILY)
    s.AddWavefrontMeshObject(wheel)
    omega = 2.0
    vx = omega * wheel_rad * (1.0 - slip)
    s.SetFamilyPrescribedAngVel(WHEEL_FAMILY, 0.0, omega, 0.0)
    s.SetFamilyPrescribedLinVel(WHEEL_FAMILY, vx, 0.0, None)
    s.SetInitTimeStep(h)
    s.SetGravitationalAcceleration([0, 0, -9.81])
    s.SetCDUpdateFreq(25)
    s.SetExpandSafetyAdder(0.1)
    s.Initialize()
    tracker = s.Track(wheel)
    return s, tracker


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=524288)
    ap.add_argument("--settle", type=float, default=0.05,
                    help="terrain settle sim-time (s)")
    ap.add_argument("--drive", type=float, default=0.3,
                    help="wheel drive sim-time (s)")
    ap.add_argument("--slip", type=float, default=0.3)
    ap.add_argument("--out", default="/tmp/flagship")
    ap.add_argument("--h", type=float, default=5e-6)
    ap.add_argument("--verbosity", default="INFO")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    ckpt = os.path.join(args.out, "terrain.csv")
    report = {"n_clumps": args.n}

    t0 = time.perf_counter()
    s, lx, lz = build_prep(args.n, verbosity=args.verbosity, h=args.h)
    report["t_init"] = time.perf_counter() - t0
    print(f"[prep] init {report['t_init']:.1f}s", flush=True)

    t0 = time.perf_counter()
    s.DoDynamics(args.settle)
    report["t_settle"] = time.perf_counter() - t0
    n_steps = int(args.settle / args.h)
    report["settle_steps"] = n_steps
    report["settle_cs_per_s"] = args.n * n_steps / report["t_settle"]
    print(f"[prep] settle {n_steps} steps in {report['t_settle']:.1f}s "
          f"-> {report['settle_cs_per_s']:.3g} c-s/s, "
          f"{int(s.GetNumContacts())} contacts", flush=True)

    t0 = time.perf_counter()
    s.WriteClumpFile(ckpt)
    report["t_checkpoint"] = time.perf_counter() - t0
    print(f"[prep] checkpoint {report['t_checkpoint']:.1f}s -> {ckpt}",
          flush=True)
    del s

    t0 = time.perf_counter()
    s2, tracker = restore_and_wheel(
        ckpt, lx, lz, slip=args.slip, verbosity=args.verbosity, h=args.h)
    report["t_restore"] = time.perf_counter() - t0
    print(f"[wheel] restore+init {report['t_restore']:.1f}s", flush=True)

    t0 = time.perf_counter()
    drawbar = []
    t = 0.0
    chunk = max(args.drive / 6, args.h * 100)
    while t < args.drive:
        s2.DoDynamics(chunk)
        t += chunk
        pts, fs = tracker.GetContactForces()
        dp = float(fs[:, 0].sum()) if len(fs) else 0.0
        drawbar.append(dp)
        print(f"[wheel] t={t:.3f} x={tracker.Pos()[0]:.3f} "
              f"z={tracker.Pos()[2]:.3f} drawbar={dp:.1f} N", flush=True)
    report["t_drive"] = time.perf_counter() - t0
    report["drive_steps"] = int(args.drive / args.h)
    report["drawbar_N"] = drawbar
    report["t_total"] = (report["t_init"] + report["t_settle"]
                         + report["t_checkpoint"] + report["t_restore"]
                         + report["t_drive"])
    print(json.dumps(report), flush=True)
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
