"""Electrostatic granular repulsion — DEMdemo_Electrostatic (reference
src/demo/DEMdemo_Electrostatic.cpp).

Charged particles carry a geometry wildcard Q; a custom force model adds
long-range Coulomb repulsion active within the family extra margin (the
non-contact-force mechanism). A charged cluster expands until the floor
friction pins it; total momentum stays ~0.
"""

import jax.numpy as jnp
import numpy as np

import dem_engine_tpu as dem
from dem_engine_tpu.models.force_model import ForceModel, hertz_material_mix


def coulomb_model(K=9e9 * 4e-12):
    def fn(ctx):
        E = ctx.mat("E")
        nu = ctx.mat("nu")
        E_eff, _ = hertz_material_mix(E[0], nu[0], E[1], nu[1])
        ovl = jnp.maximum(ctx.overlap, 0.0)
        r_eff = ctx.a_radius * ctx.b_radius / (ctx.a_radius + ctx.b_radius)
        kn = (2.0 / 3.0) * 2.0 * E_eff * jnp.sqrt(ovl * r_eff)
        force = (kn * ovl)[:, None] * ctx.b2a
        dist = ctx.a_radius + ctx.b_radius - ctx.overlap
        q_a = ctx.a_geo_wc["Q"]
        q_b = ctx.b_geo_wc["Q"]
        f_c = K * q_a * q_b / jnp.maximum(dist * dist, 1e-12)
        force = force + f_c[:, None] * ctx.b2a
        return force, jnp.zeros_like(force), {}

    return ForceModel(
        name="hertz_coulomb", fn=fn, geo_wildcards=("Q",),
        per_material_props=("E", "nu"), pairwise_props=(),
        no_contact_force=True,
    )


def build(n=125, r=0.01, q=2.0, verbosity="QUIET"):
    s = dem.DEMSolver()
    s.SetVerbosity(verbosity)
    s.InstructBoxDomainDimension(2, 2, 2)
    mat = s.LoadMaterial({"E": 1e8, "nu": 0.3})
    s.DefineContactForceModel(coulomb_model())
    tmpl = s.LoadSphereType(2600 * 4 / 3 * np.pi * r**3, r, mat)
    side = int(round(n ** (1 / 3)))
    g = np.mgrid[0:side, 0:side, 0:side].reshape(3, -1).T
    pts = (g - (side - 1) / 2) * 2.5 * r
    b = s.AddClumps(tmpl, pts)
    b.AddGeometryWildcard("Q", np.full(len(pts), q))
    s.SetFamilyExtraMargin(0, 6 * r)  # long-range horizon
    s.SetInitTimeStep(2e-5)
    s.SetGravitationalAcceleration([0, 0, 0])
    return s, len(pts)


def main(n=512, sim_time=0.2, verbosity="INFO"):
    s, n = build(n=n, verbosity=verbosity)
    s.Initialize()
    p0 = s.GetOwnerPosition()
    d0 = np.linalg.norm(p0 - p0.mean(0), axis=1).mean()
    s.DoDynamics(sim_time)
    p1 = s.GetOwnerPosition()
    d1 = np.linalg.norm(p1 - p1.mean(0), axis=1).mean()
    print(f"cluster mean radius: {d0:.4f} -> {d1:.4f} (expanded "
          f"{d1 / d0:.2f}x)")
    return d0, d1


if __name__ == "__main__":
    main()
