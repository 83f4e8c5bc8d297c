"""Bladed mixer — DEMdemo_Mixer (reference src/demo/DEMdemo_Mixer.cpp).

A rotating paddle (triangle mesh, prescribed angular velocity) stirs a
settled bed inside a cylindrical vat. Mixing quality is quantified by how
left/right-labeled particles interleave: the label-position correlation
decays from 1 toward 0.
"""

import numpy as np

import dem_engine_tpu as dem
from dem_engine_tpu.structs import DEMMeshConnected

MIXER_FAMILY = 5


def make_paddle(half_len=0.07, half_h=0.03, t=0.004):
    """A thin rectangular blade through the axis (two-sided)."""
    v = np.asarray([
        [-half_len, -t, 0], [half_len, -t, 0],
        [half_len, t, 0], [-half_len, t, 0],
        [-half_len, -t, 2 * half_h], [half_len, -t, 2 * half_h],
        [half_len, t, 2 * half_h], [-half_len, t, 2 * half_h],
    ])
    f = np.asarray([
        [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
        [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7],
    ])
    return v, f


def build(n=400, r=0.005, omega=8.0, vat_rad=0.1, verbosity="QUIET",
          h=2e-5):
    s = dem.DEMSolver()
    s.SetVerbosity(verbosity)
    s.InstructBoxDomainDimension(0.3, 0.3, 0.3)
    mat = s.LoadMaterial({"E": 5e7, "nu": 0.3, "CoR": 0.4, "mu": 0.3,
                          "Crr": 0.005})
    tmpl = s.LoadSphereType(2600 * 4 / 3 * np.pi * r**3, r, mat)
    pts = dem.HCPSampler(2.15 * r).SampleCylinderZ(
        [0, 0, -0.09], vat_rad - 3 * r, 0.03
    )
    rng = np.random.default_rng(2)
    pts = pts + rng.uniform(-0.03 * r, 0.03 * r, pts.shape)
    pts = pts[:n]
    s.AddClumps(tmpl, pts)

    vat = s.AddExternalObject()
    vat.AddCylinder([0, 0, 0], [0, 0, 1], vat_rad, mat, normal="inward")
    s.AddBCPlane([0, 0, -0.13], [0, 0, 1], mat)

    pv, pf = make_paddle()
    mesh = DEMMeshConnected(vertices=pv, faces=pf)
    mesh.SetInitPos([0, 0, -0.125])
    paddle = s.AddWavefrontMeshObject(mesh, mat)
    paddle.SetFamily(MIXER_FAMILY)
    paddle.SetMass(1.0)
    paddle.SetMOI([1e-3, 1e-3, 1e-3])
    s.SetFamilyPrescribedAngVel(MIXER_FAMILY, 0.0, 0.0, omega)
    s.SetFamilyPrescribedLinVel(MIXER_FAMILY, 0.0, 0.0, 0.0)

    s.SetInitTimeStep(h)
    s.SetGravitationalAcceleration([0, 0, -9.81])
    s.SetCDUpdateFreq(20)
    return s, pts


def mixing_metric(s, labels):
    """|corr(label, x-side)|: 1 = unmixed, ~0 = fully mixed."""
    x = s.GetOwnerPosition()[: len(labels), 0]
    side = np.sign(x)
    return float(abs(np.corrcoef(labels, side)[0, 1]))


def main(n=1500, sim_time=3.0, verbosity="INFO"):
    s, pts = build(n=n, verbosity=verbosity)
    labels = np.sign(pts[:, 0])
    s.Initialize()
    s.DoDynamics(0.3)  # settle
    m0 = mixing_metric(s, labels)
    for _ in range(int(sim_time / 0.5)):
        s.DoDynamics(0.5)
        print(f"t={s.GetTime():.1f} mix corr="
              f"{mixing_metric(s, labels):.3f}")
    return m0, mixing_metric(s, labels)


if __name__ == "__main__":
    main()
