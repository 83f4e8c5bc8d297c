"""Smoke tests of the demo programs (the reference's validation style:
demos as integration tests, SURVEY.md §4)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "examples")


def test_rotating_drum_smoke():
    from rotating_drum import build

    solver, batch, n = build(n_clumps=48, update_freq=20, h=1e-5)
    assert n > 16
    solver.DoDynamics(0.15)
    pos = solver.GetOwnerPosition()[: solver.GetNumClumps()]
    vel = solver.GetOwnerVelocity()[: solver.GetNumClumps()]
    assert np.isfinite(pos).all() and np.isfinite(vel).all()
    # everything stayed inside the drum (radius 0.12 in x-z)
    rad = np.sqrt(pos[:, 0] ** 2 + pos[:, 2] ** 2)
    assert rad.max() < 0.12, rad.max()
    # the spinning drum does work on the bed: particles near the wall get
    # dragged; net angular momentum about y axis should be nonzero
    ly = np.mean(pos[:, 2] * vel[:, 0] - pos[:, 0] * vel[:, 2])
    assert abs(ly) > 1e-7


def test_ball_drop_smoke():
    from ball_drop import build

    solver, tracker, mesh, n = build(n_side=3, verbosity="QUIET", h=1e-5)
    z0 = tracker.Pos()[2]
    solver.DoDynamics(0.1)
    z1 = tracker.Pos()[2]
    assert z1 < z0  # ball fell
    pos = solver.GetOwnerPosition()[: solver.GetNumClumps()]
    assert np.isfinite(pos).all()
    # ball did not tunnel through the bed/floor
    assert z1 > -0.3
    # contact forces on the ball retrievable through the tracker
    pts, fs = tracker.GetContactForces()
    assert pts.shape[1] == 3


def test_wheel_dp_smoke():
    from wheel_dp import build

    solver, tracker, n = build(n_side=4, verbosity="QUIET", h=1e-5)
    x0 = tracker.Pos()[0]
    solver.DoDynamics(0.05)
    x1 = tracker.Pos()[0]
    # wheel advanced at the prescribed velocity
    vx = 2.0 * 0.05 * (1 - 0.2)
    np.testing.assert_allclose(x1 - x0, vx * 0.05, rtol=0.05)
    pos = solver.GetOwnerPosition()[: solver.GetNumClumps()]
    assert np.isfinite(pos).all()


def test_game_of_life_generations():
    from game_of_life import build, ALIVE

    solver, batch, fam0 = build(n=12, verbosity="QUIET")
    counts = []
    for _ in range(4):
        solver.DoStepDynamics()
        fam = solver.GetOwnerFamily()[: solver.GetNumClumps()]
        counts.append(int((fam == ALIVE).sum()))
    # the automaton evolves (population changes at least once)
    assert len(set(counts + [int((fam0 == ALIVE).sum())])) > 1
    # and stays within the board
    assert all(0 <= c <= 12 * 12 for c in counts)


def test_grc_prep_and_restore(tmp_path):
    import os

    from grc_prep import build, restore

    solver, batch, tmpls = build(n_clumps=60, verbosity="QUIET")
    solver.DoDynamics(0.06)
    ck = os.path.join(tmp_path, "terrain.csv")
    solver.WriteClumpFile(ck)
    max_z0 = solver.CreateInspector("clump_max_z").GetValue()

    s2 = restore(ck, verbosity="QUIET")
    assert s2.GetNumClumps() == solver.GetNumClumps()
    # polydispersity survived the roundtrip: same multiset of radii
    r1 = np.sort(np.asarray(solver.state.spheres.radius))
    r2 = np.sort(np.asarray(s2.state.spheres.radius))
    np.testing.assert_allclose(r1, r2, rtol=1e-6)
    s2.DoDynamics(0.02)
    p = s2.GetOwnerPosition()[: s2.GetNumClumps()]
    assert np.isfinite(p).all()
    max_z1 = s2.CreateInspector("clump_max_z").GetValue()
    assert abs(max_z1 - max_z0) < 0.02
