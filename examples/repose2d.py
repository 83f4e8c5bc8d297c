"""Quasi-2D angle of repose — DEMdemo_Repose2D (reference
src/demo/DEMdemo_Repose2D.cpp): particles pour between two close walls
(one-particle-thick slab) onto the floor; the 2D heap profile gives the
repose angle directly."""

import numpy as np

import dem_engine_tpu as dem


def build(n=400, r=0.005, mu=0.5, crr=0.06, h=2e-5, verbosity="QUIET"):
    s = dem.DEMSolver()
    s.SetVerbosity(verbosity)
    s.InstructBoxDomainDimension(0.6, 0.1, 0.6)
    mat = s.LoadMaterial({"E": 5e7, "nu": 0.3, "CoR": 0.4, "mu": mu,
                          "Crr": crr})
    rho = 2600.0
    m_sph = rho * 4 / 3 * np.pi * r**3
    # 2D-ish flat triangle clump in the x-z plane
    a = 0.9 * r
    rel = np.asarray([[a, 0, 0], [-0.5 * a, 0, 0.866 * a],
                      [-0.5 * a, 0, -0.866 * a]])
    i_s = 2 / 5 * m_sph * r**2
    moi = [3 * i_s + 3 * m_sph * a**2] * 3
    tmpl = s.LoadClumpType(3 * m_sph, moi, [r, r, r], rel, mat)

    # narrow slot pour: a tall thin column centered above the floor,
    # non-overlapping lattice (clump bounding radius ~ r + a)
    rng = np.random.default_rng(1)
    rb = 1.15 * (r + a)
    ncol = 4
    xs = (np.arange(ncol) - (ncol - 1) / 2) * 2 * rb
    col = np.arange(n) % ncol
    lvl = np.arange(n) // ncol
    pts = np.stack([
        xs[col] + rng.uniform(-0.1 * r, 0.1 * r, n),
        np.zeros(n),
        0.02 + lvl * 2 * rb,
    ], axis=1)
    s.AddClumps(tmpl, pts)

    s.AddBCPlane([0, 0, -0.25], [0, 0, 1], mat)
    # confining walls one clump-width apart
    s.AddBCPlane([0, -1.6 * r - a, 0], [0, 1, 0], mat)
    s.AddBCPlane([0, 1.6 * r + a, 0], [0, -1, 0], mat)
    s.SetInitTimeStep(h)
    s.SetGravitationalAcceleration([0, 0, -9.81])
    s.SetCDUpdateFreq(20)
    s.Initialize()
    return s, n


def measure_angle(s, n):
    """2D slope fit: max height per |x| bin."""
    pos = s.GetOwnerPosition()[:n]
    z = pos[:, 2] + 0.25
    x = np.abs(pos[:, 0])
    edges = np.linspace(0, max(x.max(), 0.02), 9)
    hs, rs = [], []
    for i in range(len(edges) - 1):
        m = (x >= edges[i]) & (x < edges[i + 1])
        if m.sum() >= 3:
            hs.append(np.quantile(z[m], 0.9))
            rs.append(0.5 * (edges[i] + edges[i + 1]))
    if len(rs) < 3:
        return 0.0
    slope = -np.polyfit(rs, hs, 1)[0]
    return float(np.degrees(np.arctan(max(slope, 0.0))))


def main(sim_time=1.2):
    s, n = build(verbosity="INFO")
    s.DoDynamics(sim_time)
    ang = measure_angle(s, n)
    print(f"2D repose angle: {ang:.1f} deg")
    return ang


if __name__ == "__main__":
    main()
