"""User-extensibility surface: custom force models with geometry wildcards,
non-contact forces within extra margins, and bonded persistent contacts.

Parity targets: DEMdemo_Electrostatic (geometry wildcard charges + family
extra margin) and DEMdemo_Fracture (per-contact bond wildcards + persistent
contacts).
"""

import jax.numpy as jnp
import numpy as np

import dem_engine_tpu as dem
from dem_engine_tpu.models.force_model import ForceModel


def _coulomb_model():
    """Hertz normal + long-range Coulomb repulsion via geometry wildcard Q
    (the DEMdemo_Electrostatic shape)."""
    K = 9e9 * 1e-12  # scaled Coulomb constant

    def fn(ctx):
        # normal Hertz (only when overlapping)
        E_pair = ctx.mat("E")
        from dem_engine_tpu.models.force_model import hertz_material_mix

        nu = ctx.mat("nu")
        E_eff, _ = hertz_material_mix(E_pair[0], nu[0], E_pair[1], nu[1])
        ovl = jnp.maximum(ctx.overlap, 0.0)
        r_eff = ctx.a_radius * ctx.b_radius / (ctx.a_radius + ctx.b_radius)
        kn = (2.0 / 3.0) * 2.0 * E_eff * jnp.sqrt(ovl * r_eff)
        force = (kn * ovl)[:, None] * ctx.b2a
        # Coulomb within the margin: center distance from overlap
        dist = ctx.a_radius + ctx.b_radius - ctx.overlap
        q_a = ctx.a_geo_wc["Q"]
        q_b = ctx.b_geo_wc["Q"]
        f_c = K * q_a * q_b / jnp.maximum(dist * dist, 1e-12)
        force = force + f_c[:, None] * ctx.b2a
        return force, jnp.zeros_like(force), {}

    return ForceModel(
        name="hertz_coulomb",
        fn=fn,
        geo_wildcards=("Q",),
        per_material_props=("E", "nu"),
        pairwise_props=(),
        no_contact_force=True,
    )


def test_electrostatic_repulsion():
    solver = dem.DEMSolver()
    solver.SetVerbosity("QUIET")
    solver.InstructBoxDomainDimension(1, 1, 1)
    mat = solver.LoadMaterial({"E": 1e8, "nu": 0.3})
    solver.DefineContactForceModel(_coulomb_model())
    r = 0.01
    tmpl = solver.LoadSphereType(0.001, r, mat)
    b = solver.AddClumps(tmpl, np.asarray([[-0.02, 0, 0], [0.02, 0, 0]]))
    b.AddGeometryWildcard("Q", np.asarray([3.0, 3.0]))
    # see each other from 4 radii apart: extra margin >> gap
    solver.SetFamilyExtraMargin(0, 0.05)
    solver.SetInitTimeStep(1e-5)
    solver.SetGravitationalAcceleration([0, 0, 0])
    solver.Initialize()
    solver.DoDynamics(0.05)
    v = solver.GetOwnerVelocity()
    assert v[0, 0] < -1e-4 and v[1, 0] > 1e-4, f"must repel, v={v}"
    np.testing.assert_allclose(v[0, 0], -v[1, 0], rtol=1e-4)
    p = solver.GetOwnerPosition()
    assert p[1, 0] - p[0, 0] > 0.04 + 1e-4  # moved apart


def _bond_model(k_bond=2e3, break_strain=0.5):
    """Linear bond spring active while the per-contact wildcard `unbroken`
    is 1; bond breaks permanently past a stretch limit (the
    DEMdemo_Fracture shape)."""

    def fn(ctx):
        stretch = -ctx.overlap  # >0 when surfaces separated
        unbroken = ctx.wildcards["unbroken"]
        breaks = stretch > break_strain * (ctx.a_radius + ctx.b_radius)
        unbroken = jnp.where(breaks, 0.0, unbroken)
        # spring force: attracts when stretched, repels when compressed
        f = jnp.where(unbroken > 0.5, k_bond * ctx.overlap, 0.0)
        force = f[:, None] * ctx.b2a
        return force, jnp.zeros_like(force), {"unbroken": unbroken}

    return ForceModel(
        name="bond",
        fn=fn,
        contact_wildcards=("unbroken",),
        per_material_props=(),
        pairwise_props=(),
        no_contact_force=True,
    )


def test_bonded_pair_oscillates_not_escapes():
    solver = dem.DEMSolver()
    solver.SetVerbosity("QUIET")
    solver.InstructBoxDomainDimension(1, 1, 1)
    solver.LoadMaterial({"E": 1e8, "nu": 0.3})
    solver.DefineContactForceModel(_bond_model())
    r = 0.01
    tmpl = solver.LoadSphereType(0.001, r, mat=None) if False else (
        solver.LoadSphereType(0.001, r, solver._materials[0])
    )
    b = solver.AddClumps(
        tmpl, np.asarray([[-0.0100, 0, 0], [0.0100, 0, 0]])
    )
    # surfaces touching at start; give escape velocity
    b.SetVel(np.asarray([[-0.05, 0, 0], [0.05, 0, 0]]))
    solver.MarkFamilyPersistentContact(0)
    solver.SetInitTimeStep(1e-5)
    solver.SetGravitationalAcceleration([0, 0, 0])
    # dry_run performs the first CD pass so the touching pair is in the
    # table; then seed the bond state (the DEMdemo_Fracture recipe)
    solver.Initialize(dry_run=True)
    solver.SetContactWildcardValueAll("unbroken", 1.0)
    max_gap = 0.0
    for _ in range(20):
        solver.DoDynamics(0.01)
        p = solver.GetOwnerPosition()
        gap = p[1, 0] - p[0, 0] - 2 * r
        max_gap = max(max_gap, gap)
    # bond held: never stretched past the break strain (0.5 * 2r)
    assert max_gap < 0.5 * 2 * r + 1e-3
    # still bonded: ends up within a bond length
    p = solver.GetOwnerPosition()
    assert p[1, 0] - p[0, 0] < 2 * r + 0.5 * 2 * r


def test_bond_breaks_at_high_speed():
    solver = dem.DEMSolver()
    solver.SetVerbosity("QUIET")
    solver.InstructBoxDomainDimension(1, 1, 1)
    solver.LoadMaterial({"E": 1e8, "nu": 0.3})
    solver.DefineContactForceModel(_bond_model())
    r = 0.01
    tmpl = solver.LoadSphereType(0.001, r, solver._materials[0])
    b = solver.AddClumps(
        tmpl, np.asarray([[-0.0100, 0, 0], [0.0100, 0, 0]])
    )
    b.SetVel(np.asarray([[-30.0, 0, 0], [30.0, 0, 0]]))  # too fast to hold
    solver.MarkFamilyPersistentContact(0)
    solver.SetInitTimeStep(1e-5)
    solver.SetGravitationalAcceleration([0, 0, 0])
    solver.Initialize(dry_run=True)
    solver.SetContactWildcardValueAll("unbroken", 1.0)
    solver.DoDynamics(0.1)
    p = solver.GetOwnerPosition()
    # escaped far beyond the bond length: bond broke
    assert p[1, 0] - p[0, 0] > 4 * r
