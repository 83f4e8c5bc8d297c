"""Smoke tests for the round-3 demo ports (reference src/demo/ coverage:
Sieve, Plow, Shake, Hopper, TestPack, ContactChain, Repose2D, BallDrop2D,
WheelSlopeSlip, WheelDPSimplified, GRCPrep Part2/3, FlexibleMesh,
SingleSphereCollide)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "examples")


def _finite(s, n=None):
    pos = s.GetOwnerPosition()
    if n is not None:
        pos = pos[:n]
    assert np.isfinite(pos).all()
    return pos


def test_single_sphere_collide_smoke():
    from single_sphere_collide import build

    s = build(h=5e-6)
    z0 = s.GetOwnerPosition()[0, 2]
    s.DoDynamics(0.05)
    z1 = s.GetOwnerPosition()[0, 2]
    assert z1 < z0  # falling
    assert np.isfinite(z1)


def test_test_pack_smoke():
    from test_pack import build, void_ratio

    s, n = build(n=60, h=4e-5)
    s.DoDynamics(0.12)
    _finite(s, n)
    e = void_ratio(s)
    # tiny smoke bed is sparse; just require a finite, positive ratio
    assert 0.0 < e < 500.0


def test_contact_chain_smoke():
    from contact_chain import build, bottom_force

    s, m, n = build(n_stack=5, h=2e-6)
    s.DoDynamics(0.02)
    s.ChangeFamily(3, 2)
    s.DoDynamics(0.02)
    f = bottom_force(s)
    # the floor carries at least the column's own weight (settling
    # transients allowed); the chain did not collapse sideways
    assert f > 0.3 * m * 9.81 * n
    pos = _finite(s, n)
    assert np.abs(pos[:, :2]).max() < 0.1


def test_shake_smoke():
    from shake import build

    s, n = build(n=60, h=4e-5)
    s.DoDynamics(0.1)
    _finite(s, n)


def test_sieve_smoke():
    from sieve import build, passed_fraction

    s, n_grid, kinds = build(n_each=25, h=4e-5)
    s.DoDynamics(0.25)
    small, large = passed_fraction(s, n_grid, kinds)
    assert 0.0 <= large <= small + 0.75  # no mass loss; sane fractions
    _finite(s)


def test_plow_smoke():
    from plow import build

    s, tracker, n = build(n=80, h=4e-5, speed=0.4)
    s.DoDynamics(0.15)
    x0 = tracker.Pos()[0]
    assert x0 > -0.25  # blade moved forward
    _finite(s, n)


def test_hopper_smoke():
    from hopper import build, open_gate, discharged_fraction

    s, n, gate_speed = build(n=60, h=4e-5)
    s.DoDynamics(0.1)
    closed = discharged_fraction(s, n)
    open_gate(s, 0.5)
    s.DoDynamics(0.35)
    opened = discharged_fraction(s, n)
    assert opened >= closed
    _finite(s, n)


def test_repose2d_smoke():
    from repose2d import build, measure_angle

    s, n = build(n=60, h=4e-5)
    s.DoDynamics(0.3)
    ang = measure_angle(s, n)
    assert 0.0 <= ang < 80.0
    _finite(s, n)


def test_ball_drop_2d_smoke():
    from ball_drop_2d import build

    s, tracker, bed_top = build(n=80, drop_h=0.04, h=2e-5)
    z0 = tracker.Pos()[2]
    s.DoDynamics(0.12)
    z1 = tracker.Pos()[2]
    assert z1 < z0  # ball descended
    assert z1 > -0.32  # did not tunnel through the floor
    _finite(s)


def test_wheel_slope_slip_smoke():
    from wheel_slope_slip import build, measure_slip

    s, tracker, rim = build(slope_deg=5.0, h=2e-5)
    s.DoDynamics(0.05)
    slip = measure_slip(s, tracker, rim, t_meas=0.05)
    assert np.isfinite(slip)
    _finite(s)


def test_wheel_dp_simplified_smoke():
    from wheel_dp import build

    s, tracker, n = build(n_side=4, verbosity="QUIET", h=2e-5, slip=0.3)
    s.DoDynamics(0.08)
    pts, fs = tracker.GetContactForces()
    assert pts.shape[1] == 3
    _finite(s)


def test_grc_prep_part2_part3_chain(tmp_path):
    from grc_prep_part2 import run_part1, run_part2
    from grc_prep_part3 import run_part3

    p1 = str(tmp_path / "p1.csv")
    p2 = str(tmp_path / "p2.csv")
    p3 = str(tmp_path / "p3.csv")
    run_part1(p1, n_clumps=60, sim_time=0.08)
    s2, n_extra = run_part2(p1, p2, n_extra=30, sim_time=0.08)
    assert n_extra > 0
    s3 = run_part3(p2, p3, press_time=0.05)
    import dem_engine_tpu as dem

    xyz = dem.DEMSolver.ReadClumpXyzFromCsv(p3)
    n_total = sum(len(v) for v in xyz.values())
    assert n_total >= 60  # all terrain clumps survived the chain
    _finite(s3)


def test_flexible_mesh_smoke():
    from flexible_mesh import build, deflect

    s, tracker, plate = build(n=50, h=4e-5)
    s.DoDynamics(0.08)
    v0 = np.asarray(plate.vertices, np.float64)
    tracker.UpdateMesh(deflect(v0, 0.003))
    s.DoDynamics(0.04)
    pts, fs = tracker.GetContactForces()
    assert pts.shape[1] == 3
    _finite(s)
