"""Long-range gravity as a custom force model — DEMdemo_SolarSystem
(reference src/demo/DEMdemo_SolarSystem.cpp): no contacts at all, pure
pairwise attraction within a huge family extra margin."""

import jax.numpy as jnp
import numpy as np

import dem_engine_tpu as dem
from dem_engine_tpu.models.force_model import ForceModel

G = 6.674e-11


def gravity_model():
    def fn(ctx):
        dist = ctx.a_radius + ctx.b_radius - ctx.overlap
        m_a, m_b = ctx.a_mass, ctx.b_mass
        f_mag = -G * m_a * m_b / jnp.maximum(dist * dist, 1e-6)
        force = f_mag[:, None] * ctx.b2a  # attraction: toward B
        return force, jnp.zeros_like(force), {}

    return ForceModel(
        name="newtonian_gravity", fn=fn,
        per_material_props=(), pairwise_props=(),
        no_contact_force=True,
    )


def build(verbosity="QUIET"):
    solver = dem.DEMSolver()
    solver.SetVerbosity(verbosity)
    # scaled two-body problem: a 'sun' and a 'planet' in circular orbit
    L = 100.0
    solver.InstructBoxDomainDimension(L, L, L)
    solver.LoadMaterial({"E": 1e9, "nu": 0.3})
    solver.DefineContactForceModel(gravity_model())
    m_sun, m_planet = 1e12, 1.0
    r_orbit = 10.0
    v_circ = np.sqrt(G * m_sun / r_orbit)
    sun = solver.LoadSphereType(m_sun, 0.5, solver._materials[0])
    planet = solver.LoadSphereType(m_planet, 0.1, solver._materials[0])
    b = solver.AddClumps(
        [sun, planet], np.asarray([[0, 0, 0], [r_orbit, 0, 0]])
    )
    b.SetVel(np.asarray([[0, 0, 0], [0, v_circ, 0]]))
    # every pair visible regardless of distance
    solver.SetFamilyExtraMargin(0, 2 * r_orbit)
    period = 2 * np.pi * r_orbit / v_circ
    solver.SetInitTimeStep(period / 2000.0)
    solver.SetGravitationalAcceleration([0, 0, 0])
    solver.SetCDUpdateFreq(50)
    solver.Initialize()
    return solver, r_orbit, v_circ


def main():
    solver, r_orbit, v_circ = build(verbosity="INFO")
    period = 2 * np.pi * r_orbit / v_circ
    for i in range(10):
        solver.DoDynamics(period / 10)
        p = solver.GetOwnerPosition()
        print(f"{(i+1)/10:.1f} T: planet at {p[1]} r="
              f"{np.linalg.norm(p[1] - p[0]):.3f}")


if __name__ == "__main__":
    main()
