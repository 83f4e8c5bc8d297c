"""Round-4 physics verification on the real TPU through the public API.

Targets this round's engine changes:
  poly  — the reworked two-class CD (compacted L-L sweep + multi-bin
          cross entries): a ratio-3 bed settles, floor reaction equals
          bed weight, and contact counts match physics expectations.
  bin   — the adaptive bin-size factor: an oversized SetBinSize run
          reproduces the default run's contacts and positions.
  mono  — baseline fused-path settle (regression guard): energy decays,
          floor reaction == weight, nothing through the floor.

Usage: python tools/verify_r4.py [mono|poly|bin] (default: all)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from dem_engine_tpu.utils import compile_cache

compile_cache.enable()


def _on_tpu():
    import jax

    return jax.devices()[0].platform != "cpu"


def _bed(sim, n_side=8, layers=3, r=0.01, ratio=0.0, crr=0.25, mu=0.5):
    sim.InstructBoxDomainDimension(1.0, 1.0, 0.6)
    mat = sim.LoadMaterial({"E": 1e7, "nu": 0.3, "CoR": 0.3,
                            "mu": mu, "Crr": crr})
    rho = 2.6e3
    tmpl = sim.LoadSphereType(4 / 3 * np.pi * r**3 * rho, r, mat)
    pitch = 2.05 * r
    xs = (np.arange(n_side) - (n_side - 1) / 2) * pitch
    g = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1).reshape(-1, 2)
    pos = []
    for k in range(layers):
        z = -0.25 + r * 1.05 + k * pitch
        pos.append(np.concatenate(
            [g, np.full((g.shape[0], 1), z)], axis=1))
    pos = np.concatenate(pos)
    sim.AddClumps(tmpl, pos)
    n_small = pos.shape[0]
    m_small = 4 / 3 * np.pi * r**3 * rho
    masses = [m_small] * n_small
    if ratio:
        rl = r * ratio
        tmpl_l = sim.LoadSphereType(4 / 3 * np.pi * rl**3 * rho, rl, mat)
        xl = (np.arange(3) - 1.0) * (2.2 * rl)
        gl = np.stack(np.meshgrid(xl, xl, indexing="ij"), -1).reshape(-1, 2)
        zl = -0.25 + layers * pitch + rl * 1.2
        pos_l = np.concatenate([gl, np.full((gl.shape[0], 1), zl)], axis=1)
        sim.AddClumps(tmpl_l, pos_l)
        masses += [4 / 3 * np.pi * rl**3 * rho] * pos_l.shape[0]
    sim.AddBCPlane([0, 0, -0.25], [0, 0, 1], mat)
    sim.SetInitTimeStep(5e-6)
    sim.SetGravitationalAcceleration([0, 0, -9.81])
    sim.SetCDUpdateFreq(20)
    return np.asarray(masses)


def _check_settled(sim, masses, label, zmin=-0.25):
    n = masses.shape[0]
    p = np.asarray(sim.GetOwnerPosition())[:n]
    v = np.asarray(sim.GetOwnerVelocity())[:n]
    sp = np.linalg.norm(v, axis=1)
    p90 = float(np.percentile(sp, 90))
    assert p.T[2].min() > zmin - 1e-4, (label, "through floor",
                                        p.T[2].min())
    assert p.T[2].max() < 0.3, (label, "launched", p.T[2].max())
    assert p90 < 0.05, (label, "not settled", p90)
    info = sim.GetContactDetailedInfo()
    fz = 0.0
    for blk in info:
        if blk["kind"] == "SA":
            fz += float(blk["force"][:, 2].sum())
    weight = float((masses * 9.81).sum())
    # the floor carries the whole bed's weight (SA normal is +z on A)
    assert abs(fz - weight) / weight < 0.08, (label, fz, weight)
    print(f"[{label}] OK: p90|v|={p90:.4f}, floor={fz:.3f} "
          f"weight={weight:.3f}, contacts={int(sim.GetNumContacts())}",
          flush=True)


def run_mono():
    from dem_engine_tpu.api import DEMSolver

    sim = DEMSolver()
    masses = _bed(sim)
    sim.Initialize()
    if _on_tpu():
        assert sim.engine.cfg.use_fused_force, "fused path must be active"
    e_prev = None
    for _ in range(4):
        sim.DoDynamics(0.1)
        p = np.asarray(sim.GetOwnerPosition())[:masses.shape[0]]
        v = np.asarray(sim.GetOwnerVelocity())[:masses.shape[0]]
        e = float((masses * 9.81 * (p[:, 2] + 0.25)).sum()
                  + 0.5 * (masses * (v**2).sum(1)).sum())
        if e_prev is not None:
            assert e < e_prev * 1.05, ("energy rose", e_prev, e)
        e_prev = e
    _check_settled(sim, masses, "mono")
    return sim


def run_poly():
    from dem_engine_tpu.api import DEMSolver

    sim = DEMSolver()
    masses = _bed(sim, ratio=3.0)
    sim.Initialize()
    assert sim.engine.cfg.cd_two_class, "two-class CD must be active"
    if _on_tpu():
        assert sim.engine.cfg.use_pallas_sweep, "Pallas sweep required"
    sim.DoDynamics(0.5)
    _check_settled(sim, masses, "poly")
    if _on_tpu():
        assert sim.engine.cfg.use_pallas_sweep, "sweep fell off"
    return sim


def run_bin():
    from dem_engine_tpu.api import DEMSolver

    sims = []
    for bs in (None, 0.2):  # default vs ~4x oversized bins
        sim = DEMSolver()
        masses = _bed(sim, n_side=6, layers=2)
        if bs:
            sim.SetBinSize(bs)
        sim.Initialize()
        if bs:
            assert sim.engine.bin_factor > 2.0, sim.engine.bin_factor
        sim.DoDynamics(0.3)
        sims.append((sim, masses))
    (s0, m0), (s1, m1) = sims
    n = m0.shape[0]
    assert int(s0.GetNumContacts()) == int(s1.GetNumContacts()), (
        int(s0.GetNumContacts()), int(s1.GetNumContacts()))
    p0 = np.asarray(s0.GetOwnerPosition())[:n]
    p1 = np.asarray(s1.GetOwnerPosition())[:n]
    np.testing.assert_allclose(p0, p1, atol=1e-5)
    print(f"[bin] OK: factor={s1.engine.bin_factor:.2f}, contacts "
          f"{int(s1.GetNumContacts())} match default", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    t0 = time.time()
    if which in ("mono", "all"):
        run_mono()
    if which in ("poly", "all"):
        run_poly()
    if which in ("bin", "all"):
        run_bin()
    print(f"VERIFY_R4_OK ({which}) in {time.time()-t0:.0f}s", flush=True)
