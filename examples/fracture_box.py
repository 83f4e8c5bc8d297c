"""Bonded-block fracture — DEMdemo_Fracture_Box (reference
src/demo/DEMdemo_Fracture_Box.cpp).

A cubic lattice of spheres is glued into a solid by per-contact bond
wildcards on persistent contacts; dropped onto the floor, bonds near the
impact face break (the wildcard flips to 0) while the block's core stays
bonded at moderate drop energy.
"""

import jax.numpy as jnp
import numpy as np

import dem_engine_tpu as dem
from dem_engine_tpu.models.force_model import ForceModel


def bond_model(k_bond=1e5, break_strain=0.015, kn_contact=1e5,
               damp=0.25):
    def fn(ctx):
        stretch = -ctx.overlap
        unbroken = ctx.wildcards["unbroken"]
        lim = break_strain * (ctx.a_radius + ctx.b_radius)
        # brittle failure in tension OR crushing compression (impact
        # loads the lattice compressively; pure-tension bonds would
        # never break on a face-flat drop)
        breaks = (stretch > lim) | (ctx.overlap > lim)
        unbroken = jnp.where(breaks, 0.0, unbroken)
        f_bond = jnp.where(unbroken > 0.5, k_bond * ctx.overlap, 0.0)
        # plain repulsive contact for broken/unbonded pairs
        f_contact = jnp.where(
            (unbroken <= 0.5) & (ctx.overlap > 0),
            kn_contact * ctx.overlap, 0.0)
        # normal damping so the lattice rings down instead of shattering
        # from its own seating oscillations
        m_eff = ctx.a_mass * ctx.b_mass / (ctx.a_mass + ctx.b_mass)
        vel_b2a = ctx.a_lin_vel - ctx.b_lin_vel
        vn = jnp.sum(vel_b2a * ctx.b2a, axis=-1)
        active = (unbroken > 0.5) | (ctx.overlap > 0)
        c = 2.0 * damp * jnp.sqrt(k_bond * m_eff)
        f_damp = jnp.where(active, -c * vn, 0.0)
        force = (f_bond + f_contact + f_damp)[:, None] * ctx.b2a
        return force, jnp.zeros_like(force), {"unbroken": unbroken}

    return ForceModel(
        name="bond", fn=fn, contact_wildcards=("unbroken",),
        per_material_props=(), pairwise_props=(), no_contact_force=True,
    )


def build(side=4, r=0.01, drop=0.05, verbosity="QUIET", h=1e-5):
    s = dem.DEMSolver()
    s.SetVerbosity(verbosity)
    s.InstructBoxDomainDimension(1, 1, 1)
    mat = s.LoadMaterial({"E": 1e8, "nu": 0.3, "CoR": 0.3, "mu": 0.4,
                          "Crr": 0.0})
    s.DefineContactForceModel(bond_model())
    tmpl = s.LoadSphereType(2600 * 4 / 3 * np.pi * r**3, r, mat)
    g = np.mgrid[0:side, 0:side, 0:side].reshape(3, -1).T
    pts = (g - (side - 1) / 2) * 1.98 * r  # slight overlap: bonds form
    pts[:, 2] += drop + side * r
    s.AddClumps(tmpl, pts)
    s.AddBCPlane([0, 0, 0.0], [0, 0, 1], mat)
    s.MarkFamilyPersistentContact(0)
    s.SetInitTimeStep(h)
    s.SetGravitationalAcceleration([0, 0, -9.81])
    return s, len(pts)


def main(side=6, drop=0.15, verbosity="INFO"):
    s, n = build(side=side, drop=drop, verbosity=verbosity)
    s.Initialize(dry_run=True)
    s.SetContactWildcardValueAll("unbroken", 1.0)
    n_bonds0 = int((s.GetAllContactWildcardValue("unbroken") > 0.5).sum())
    s.DoDynamics(0.5)
    unb = s.GetAllContactWildcardValue("unbroken")
    n_bonds1 = int((unb > 0.5).sum())
    print(f"bonds: {n_bonds0} -> {n_bonds1} "
          f"({100 * n_bonds1 / max(n_bonds0, 1):.0f}% intact)")
    return n_bonds0, n_bonds1


if __name__ == "__main__":
    main()
