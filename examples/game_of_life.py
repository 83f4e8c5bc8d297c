"""Family-change rules as a cellular automaton — DEMdemo_GameOfLife
(reference src/demo/DEMdemo_GameOfLife.cpp): a grid of fixed spheres where
family 0 = alive, 1 = dead, evolved purely by ChangeFamilyWhen conditions
reading neighbor state. A stress test of the per-step family-change path.

Here the neighbor count is evaluated from positions (owner view) on a
static lattice; no dynamics at all (everything family-fixed).
"""

import jax.numpy as jnp
import numpy as np

import dem_engine_tpu as dem

ALIVE, DEAD = 0, 1


def build(n=24, seed=3, verbosity="QUIET"):
    solver = dem.DEMSolver()
    solver.SetVerbosity(verbosity)
    solver.InstructBoxDomainDimension(n + 4.0, n + 4.0, 4.0)
    mat = solver.LoadMaterial({"E": 1e8, "nu": 0.3, "CoR": 0.5, "mu": 0.0,
                               "Crr": 0.0})
    tmpl = solver.LoadSphereType(1.0, 0.45, mat)
    xs = np.arange(n) - n / 2 + 0.5
    g = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1).reshape(-1, 2)
    pts = np.concatenate([g, np.zeros((g.shape[0], 1))], axis=1)
    batch = solver.AddClumps(tmpl, pts)
    rng = np.random.default_rng(seed)
    fam = np.where(rng.uniform(size=pts.shape[0]) < 0.35, ALIVE, DEAD)
    batch.SetFamilies(fam)

    # all cells are immobile; contacts disabled entirely
    solver.SetFamilyFixed(ALIVE)
    solver.SetFamilyFixed(DEAD)
    solver.DisableContactBetweenFamilies(ALIVE, ALIVE)
    solver.DisableContactBetweenFamilies(ALIVE, DEAD)
    solver.DisableContactBetweenFamilies(DEAD, DEAD)

    grid_n = n

    def neighbor_alive_counts(view):
        # reconstruct lattice indices from positions (static lattice)
        p = view.pos[:, :2]
        ij = jnp.round(p - p.min(axis=0, keepdims=True)).astype(jnp.int32)
        idx = ij[:, 0] * grid_n + ij[:, 1]
        alive = (view.family == ALIVE).astype(jnp.int32)
        board = jnp.zeros((grid_n * grid_n,), jnp.int32).at[idx].set(alive)
        b = board.reshape(grid_n, grid_n)
        cnt = jnp.zeros_like(b)
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                cnt = cnt + jnp.roll(jnp.roll(b, di, 0), dj, 1)
        return cnt.reshape(-1)[idx]

    def dies(view, t):
        c = neighbor_alive_counts(view)
        return (view.family == ALIVE) & ((c < 2) | (c > 3))

    def born(view, t):
        c = neighbor_alive_counts(view)
        return (view.family == DEAD) & (c == 3)

    solver.ChangeFamilyWhen(ALIVE, DEAD, dies)
    solver.ChangeFamilyWhen(DEAD, ALIVE, born)
    solver.SetInitTimeStep(1.0)  # one step = one generation
    solver.SetGravitationalAcceleration([0, 0, 0])
    solver.SetCDUpdateFreq(1)
    solver.Initialize()
    return solver, batch, fam


def main(generations=20, n=32):
    solver, batch, fam0 = build(n=n, verbosity="INFO")
    for gen in range(generations):
        solver.DoStepDynamics()
        fam = solver.GetOwnerFamily()[: solver.GetNumClumps()]
        print(f"gen {gen}: {int((fam == ALIVE).sum())} alive")


if __name__ == "__main__":
    main()
