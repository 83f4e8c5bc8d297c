"""Mooring line — the ForceModelMooring user script (reference
src/kernel/DEMUserScripts/ForceModelMooring.cu): a chain of spheres whose
consecutive pairs carry a persistent "bond" encoded in contact wildcards.

Bonded pairs (``innerInteraction > 0``) act as a stiff linear tether:
the first evaluation latches the as-built gap into ``initialLength``
(ref lines 53-56), then the pair resists stretching past it with
``kn = pi R^2 E / 0.03`` and damping ``c = 0.02 * 2 sqrt(m_eff kn)``
(ref lines 58-66: force only when deltaD < 0, i.e. tension). Unbonded
pairs fall back to plain Hertz contact — exactly the reference's else
branch.

Demo: a line anchored at the top (fixed family) with a heavy clump at the
free end settles into a hanging, slightly-stretched tether that does NOT
come apart — bond strains stay well under the tether stiffness scale.
"""

import jax.numpy as jnp
import numpy as np

import dem_engine_tpu as dem
from dem_engine_tpu.models.force_model import ForceModel
from dem_engine_tpu.models.hertz import _full_fn

ANCHOR_FAMILY = 10


def mooring_model():
    def fn(ctx):
        bonded = ctx.wildcards["innerInteraction"] > 1e-12
        fresh = ctx.wildcards["innerInteraction"] > 1.0
        # latch the as-built gap on first evaluation (ref: reuses the
        # initialLength wildcard, ForceModelMooring.cu:53-56)
        init_len = jnp.where(fresh, ctx.overlap,
                             ctx.wildcards["initialLength"])
        inner = jnp.where(fresh, 1.0, ctx.wildcards["innerInteraction"])

        E_a, _ = ctx.mat("E")
        kn = np.pi * ctx.a_radius**2 * E_a / 0.03
        m_eff = ctx.a_mass * ctx.b_mass / jnp.maximum(
            ctx.a_mass + ctx.b_mass, 1e-30)
        c = 0.02 * 2.0 * jnp.sqrt(m_eff * kn)
        delta_d = ctx.overlap - init_len
        vel_b2a = ctx.a_lin_vel - ctx.b_lin_vel
        # tension only (deltaD < 0 ~ stretched past the as-built length)
        tense = bonded & (delta_d < 1e-12)
        f_bond = jnp.where(tense, kn * delta_d, 0.0)[:, None] * ctx.b2a
        f_bond = f_bond - jnp.where(tense, 1.0, 0.0)[:, None] * (
            c[:, None] * vel_b2a)

        # unbonded pairs: plain Hertz-Mindlin contact (ref else branch)
        f_hertz, torque, wc = _full_fn(ctx)
        force = jnp.where(bonded[:, None], f_bond, f_hertz)
        torque = jnp.where(bonded[:, None], 0.0, torque)
        wc["innerInteraction"] = inner
        wc["initialLength"] = jnp.where(bonded, init_len, 0.0)
        return force, torque, wc

    return ForceModel(
        name="mooring",
        fn=fn,
        contact_wildcards=("delta_tan_x", "delta_tan_y", "delta_tan_z",
                           "delta_time", "innerInteraction",
                           "initialLength"),
        per_material_props=("E", "nu"),
        pairwise_props=("CoR", "mu", "Crr"),
        no_contact_force=True,  # bonds act while stretched (no overlap)
    )


def build(n_links=12, r=0.01, weight_mass=0.5, verbosity="QUIET", h=2e-6):
    s = dem.DEMSolver()
    s.SetVerbosity(verbosity)
    s.InstructBoxDomainDimension(1.0, 1.0, 1.2)
    mat = s.LoadMaterial({"E": 5e6, "nu": 0.3, "CoR": 0.2, "mu": 0.3,
                          "Crr": 0.0})
    s.DefineContactForceModel(mooring_model())
    rho = 1200.0
    m = rho * 4 / 3 * np.pi * r**3
    tmpl = s.LoadSphereType(m, r, mat)
    # chain hangs from the top, links built slightly overlapped so the
    # persistent contacts exist at t=0
    z0 = 0.5
    pitch = 1.9 * r
    pos = np.stack(
        [np.zeros(n_links), np.zeros(n_links),
         z0 - np.arange(n_links) * pitch], axis=1)
    batch = s.AddClumps(tmpl, pos)
    batch.SetFamilies([ANCHOR_FAMILY] + [0] * (n_links - 1))
    # a heavy clump bonded to the free end
    tmpl_w = s.LoadSphereType(weight_mass, 1.5 * r, mat)
    s.AddClumps(tmpl_w, [[0, 0, z0 - n_links * pitch - 0.5 * r]])
    s.SetFamilyFixed(ANCHOR_FAMILY)
    # bonds ride persistent contacts: keep every pair alive once formed
    # (family 0 is one side of every bond, anchor-link included)
    s.MarkFamilyPersistentContact(0)
    s.SetInitTimeStep(h)
    s.SetGravitationalAcceleration([0, 0, -9.81])
    s.SetCDUpdateFreq(10)
    # tether reach: bonded pairs separate slightly under load; margin
    # keeps them in the contact table while stretched
    s.SetFamilyExtraMargin(0, 0.5 * r)
    s.SetFamilyExtraMargin(ANCHOR_FAMILY, 0.5 * r)
    return s, n_links


def main(sim_time=0.25, verbosity="QUIET"):
    s, n_links = build(verbosity=verbosity)
    s.Initialize(dry_run=True)
    s.SetContactWildcardValueAll("innerInteraction", 2.0)  # latch request
    s.DoDynamics(sim_time)
    p = np.asarray(s.GetOwnerPosition())[:n_links + 1]
    # the chain must stay connected: consecutive gaps bounded, the weight
    # hangs below the anchor by about the chain length
    gaps = np.linalg.norm(np.diff(p, axis=0), axis=1)
    print(f"max link gap {gaps.max():.4f} m, weight z {p[-1, 2]:.3f}")
    assert gaps.max() < 0.035, gaps.max()
    assert p[-1, 2] < p[0, 2] - 0.15
    return gaps.max()


if __name__ == "__main__":
    main(verbosity="INFO")
