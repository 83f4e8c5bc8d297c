"""Quantitative physics checks on the validation demos (reduced scale).

The full-scale literature reproductions run on TPU via the examples'
main(); these reduced versions assert the same physics discriminators
numerically: frictional heaps hold a repose angle that frictionless ones
cannot, penetration resistance grows with depth, centrifuging pins
particles to the drum wall, mixing decorrelates labels, bonds break under
impact, charges repel.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_repose_angle_friction_vs_frictionless():
    from repose import build, measure_angle

    s, n = build(n=260, r=0.005, mu=0.6, crr=0.12, h=5e-5)
    s.Initialize()
    s.DoDynamics(0.7)
    ang_fric = measure_angle(s, 0.005)

    s2, _ = build(n=260, r=0.005, mu=0.0, crr=0.0, h=5e-5)
    s2.Initialize()
    s2.DoDynamics(0.7)
    ang_slick = measure_angle(s2, 0.005)

    # frictional sand-like material holds a heap in the literature range;
    # frictionless spheres spread nearly flat
    assert 12.0 < ang_fric < 45.0, ang_fric
    assert ang_slick < ang_fric - 5.0, (ang_fric, ang_slick)


def test_cone_penetration_resistance_grows():
    from cone_penetration import build, push

    s, tracker, speed = build(n=380, r=0.005, h=5e-5)
    s.Initialize()
    s.DoDynamics(0.2)  # settle
    curve = push(s, tracker, speed=0.3, depth_samples=4, dt_sample=0.035)
    depths = np.asarray([c[0] for c in curve])
    forces = np.asarray([c[1] for c in curve])
    assert depths[-1] > 0.005  # actually penetrated
    # resistance grows with depth: the last sample beats the first and
    # the depth-force correlation is positive (cone index curve shape)
    assert forces[-1] > forces[0]
    assert np.corrcoef(depths, forces)[0, 1] > 0.5
    assert forces[-1] > 0.05  # bears meaningful load (N)


def test_centrifuge_pins_particles_to_wall():
    from centrifuge import build

    s, R, omega, r = build(n=120, omega=50.0, h=4e-5)
    # omega^2 R = 250 m/s^2 >> g: all mass ends on the wall
    s.Initialize()
    s.DoDynamics(0.5)
    pos = s.GetOwnerPosition()
    rad = np.hypot(pos[:, 0], pos[:, 2])
    assert rad.mean() > 0.8 * (R - r), rad.mean()
    # co-rotation: tangential speed ~ omega * rad
    vel = np.asarray(s.state.owners.vel)[: len(rad)]
    vt = np.abs(vel[:, 0] * (-pos[:, 2]) + vel[:, 2] * pos[:, 0]) / \
        np.maximum(rad, 1e-6)
    assert vt.mean() > 0.15 * omega * rad.mean()


def test_mixer_decorrelates_labels():
    from mixer import build, mixing_metric

    s, pts = build(n=200, omega=16.0, h=4e-5)
    labels = np.sign(pts[:, 0])
    s.Initialize()
    m0 = mixing_metric(s, labels)  # before any motion: fully separated
    s.DoDynamics(0.9)
    m1 = mixing_metric(s, labels)
    assert m0 > 0.95  # starts separated
    assert m1 < 0.5  # the paddle mixed the halves


def test_fracture_bonds_break_on_impact():
    from fracture_box import build

    s, n = build(side=3, drop=0.25, h=2e-5)
    s.Initialize(dry_run=True)
    s.SetContactWildcardValueAll("unbroken", 1.0)
    nb0 = int((s.GetAllContactWildcardValue("unbroken") > 0.5).sum())
    assert nb0 >= 2 * 27  # lattice is bonded
    s.DoDynamics(0.35)
    unb = s.GetAllContactWildcardValue("unbroken")
    nb1 = int((unb > 0.5).sum())
    assert nb1 < nb0  # impact broke bonds

    # gentle drop keeps more bonds than a hard drop
    s2, _ = build(side=3, drop=0.005, h=2e-5)
    s2.Initialize(dry_run=True)
    s2.SetContactWildcardValueAll("unbroken", 1.0)
    nb0b = int((s2.GetAllContactWildcardValue("unbroken") > 0.5).sum())
    s2.DoDynamics(0.35)
    nb1b = int((s2.GetAllContactWildcardValue("unbroken") > 0.5).sum())
    assert nb1b / max(nb0b, 1) > nb1 / max(nb0, 1)


def test_electrostatic_cluster_expands():
    from electrostatic import build

    s, n = build(n=27, q=2.0)
    s.Initialize()
    p0 = s.GetOwnerPosition()
    d0 = np.linalg.norm(p0 - p0.mean(0), axis=1).mean()
    s.DoDynamics(0.08)
    p1 = s.GetOwnerPosition()
    d1 = np.linalg.norm(p1 - p1.mean(0), axis=1).mean()
    assert d1 > 1.3 * d0  # Coulomb repulsion expanded the cluster
    # momentum conservation: the cluster's center barely moves
    assert np.linalg.norm(p1.mean(0) - p0.mean(0)) < 0.05 * d0


def test_indentation_bears_and_indents():
    from indentation import build

    from indentation import release_ball

    s, n_bed = build(n=300, r=0.005, ball_r=0.018, ball_rho=12000.0,
                     verbosity="QUIET", h=4e-5)
    s.Initialize()
    s.SetFamilyOwnerWildcardValue(3, "is_indenter", 1.0)
    assert s.GetOwnerWildcardValue("is_indenter")[n_bed] == 1.0
    s.DoDynamics(0.25)  # settle with the ball held fixed
    release_ball(s, n_bed)
    z0 = s.GetOwnerPosition()[n_bed, 2]
    s.DoDynamics(0.4)
    z1 = s.GetOwnerPosition()[n_bed, 2]
    depth = z0 - z1
    # the heavy ball indents a real distance...
    assert depth > 0.002, depth
    # ...but the bed BEARS it: it never reaches the floor (z=-0.2 wall,
    # ball radius 0.018, plus at least one particle layer underneath)
    assert z1 > -0.2 + 0.018 + 0.008, z1
