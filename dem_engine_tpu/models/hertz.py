"""Built-in Hertz–Mindlin contact force models.

Physics parity with the reference's default models
(kernel/DEMCustomizablePolicies/FullHertzianForceModel.cu and
FrictionlessHertzianForceModel.cu): normal spring–damper derived from the
pair's effective Young's modulus and restitution, tangential history spring
with Coulomb friction clamp, and Schwartz rolling resistance expressed as a
torque-only force. Re-implemented branch-free over batched arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..defines import F, TINY_FLOAT
from .force_model import (
    ContactContext,
    ForceModel,
    effective_mass,
    hertz_material_mix,
)

_PI = 3.14159265358979323846
_PI_SQ = _PI * _PI
_TWO_THIRDS = 2.0 / 3.0
_TWO_SQRT_5_6 = 2.0 * (5.0 / 6.0) ** 0.5


def _hertz_core(ctx: ContactContext, with_friction: bool):
    in_contact = ctx.overlap > 0.0
    ovl = jnp.maximum(ctx.overlap, 0.0)

    E_a, nu_a = ctx.mat("E"), ctx.mat("nu")
    E_eff, G_eff = hertz_material_mix(E_a[0], nu_a[0], E_a[1], nu_a[1])
    CoR = ctx.pair("CoR")

    # contact-point velocities (global frame)
    rot_a, rot_b = ctx.rot_vel_cp_global()
    vel_b2a = (ctx.a_lin_vel + rot_a) - (ctx.b_lin_vel + rot_b)
    proj = jnp.sum(vel_b2a * ctx.b2a, axis=-1)
    vrel_tan = vel_b2a - proj[:, None] * ctx.b2a

    m_eff = effective_mass(ctx)
    r_eff = ctx.a_radius * ctx.b_radius / (ctx.a_radius + ctx.b_radius)
    sqrt_Rd = jnp.sqrt(ovl * r_eff)
    Sn = 2.0 * E_eff * sqrt_Rd

    loge = jnp.log(jnp.maximum(CoR, TINY_FLOAT))
    beta = loge / jnp.sqrt(loge * loge + _PI_SQ)

    k_n = _TWO_THIRDS * Sn
    gamma_n = _TWO_SQRT_5_6 * beta * jnp.sqrt(Sn * m_eff)

    f_normal_mag = k_n * ovl + gamma_n * proj
    force = f_normal_mag[:, None] * ctx.b2a
    torque_only = jnp.zeros_like(force)
    new_wc = {}

    if with_friction:
        ts = ctx.ts
        mu = ctx.pair("mu")
        Crr = ctx.pair("Crr")

        # --- tangential history update --------------------------------
        delta_tan = jnp.stack(
            [
                ctx.wildcards["delta_tan_x"],
                ctx.wildcards["delta_tan_y"],
                ctx.wildcards["delta_tan_z"],
            ],
            axis=-1,
        )
        delta_tan = delta_tan + ts * vrel_tan
        disp_proj = jnp.sum(delta_tan * ctx.b2a, axis=-1)
        delta_tan = delta_tan - disp_proj[:, None] * ctx.b2a
        delta_time = ctx.wildcards["delta_time"] + ts

        # --- rolling resistance (Schwartz; torque-only force) ---------
        # The reference defines R_eff = sqrt(r_eff) and uses
        # kn_simple ∝ sqrt(R_eff) = r_eff^0.25, gn_simple ∝ R_eff^0.25 =
        # r_eff^0.125 (FullHertzianForceModel.cu:74-76) — matched exactly so
        # t_collision and the rolling-resistance onset agree.
        R_eff = jnp.sqrt(r_eff)
        kn_simple = (4.0 / 3.0) * E_eff * jnp.sqrt(R_eff)
        gn_simple = (
            -2.0
            * jnp.sqrt((5.0 / 3.0) * m_eff * E_eff)
            * beta
            * jnp.sqrt(jnp.sqrt(R_eff))
        )
        d_coeff = gn_simple / (2.0 * jnp.sqrt(kn_simple * m_eff))
        t_collision = _PI * jnp.sqrt(
            m_eff / (kn_simple * jnp.maximum(1.0 - d_coeff * d_coeff, TINY_FLOAT))
        )
        # only resist rolling once past the initial collision transient
        past_transient = jnp.where(
            d_coeff < 1.0, delta_time > t_collision, True
        )
        v_rot = rot_b - rot_a
        v_rot_mag = jnp.linalg.norm(v_rot, axis=-1)
        f_mag = jnp.linalg.norm(force, axis=-1)
        roll_on = (Crr > 0.0) & past_transient & (v_rot_mag > TINY_FLOAT)
        torque_only = jnp.where(
            roll_on[:, None],
            v_rot / jnp.maximum(v_rot_mag, TINY_FLOAT)[:, None]
            * (Crr * f_mag)[:, None],
            0.0,
        )

        # --- tangential force with Coulomb clamp -----------------------
        kt = 8.0 * G_eff * sqrt_Rd
        gt = -_TWO_SQRT_5_6 * beta * jnp.sqrt(m_eff * kt)
        tangent_force = -kt[:, None] * delta_tan - gt[:, None] * vrel_tan
        ft = jnp.linalg.norm(tangent_force, axis=-1)
        ft_max = f_mag * mu
        clamp = (ft > ft_max) & (ft > TINY_FLOAT)
        scale = jnp.where(clamp, ft_max / jnp.maximum(ft, TINY_FLOAT), 1.0)
        tangent_force = jnp.where(
            (ft > TINY_FLOAT)[:, None], tangent_force * scale[:, None], 0.0
        )
        # reverse-engineer the (clamped) tangential displacement so the
        # spring does not wind up past the slip limit
        delta_tan = jnp.where(
            clamp[:, None],
            (tangent_force + gt[:, None] * vrel_tan) / (-kt[:, None]),
            delta_tan,
        )
        frictional = mu > 0.0
        force = force + jnp.where(frictional[:, None], tangent_force, 0.0)

        # wildcards cleared when no physical contact
        keep = in_contact
        new_wc = {
            "delta_tan_x": jnp.where(keep, delta_tan[:, 0], 0.0),
            "delta_tan_y": jnp.where(keep, delta_tan[:, 1], 0.0),
            "delta_tan_z": jnp.where(keep, delta_tan[:, 2], 0.0),
            "delta_time": jnp.where(keep, delta_time, 0.0),
        }

    force = jnp.where(in_contact[:, None], force, 0.0)
    torque_only = jnp.where(in_contact[:, None], torque_only, 0.0)
    return force.astype(F), torque_only.astype(F), new_wc


def _full_fn(ctx: ContactContext):
    return _hertz_core(ctx, with_friction=True)


def _frictionless_fn(ctx: ContactContext):
    return _hertz_core(ctx, with_friction=False)


def HertzianForceModel() -> ForceModel:
    """Full history-based Hertz–Mindlin (reference default force model)."""
    return ForceModel(
        name="hertzian_full",
        fn=_full_fn,
        contact_wildcards=(
            "delta_tan_x",
            "delta_tan_y",
            "delta_tan_z",
            "delta_time",
        ),
        per_material_props=("E", "nu"),
        pairwise_props=("CoR", "mu", "Crr"),
        fused_variant="hertz_full",
    )


def HertzianFrictionlessForceModel() -> ForceModel:
    """Frictionless, history-less Hertzian normal force."""
    return ForceModel(
        name="hertzian_frictionless",
        fn=_frictionless_fn,
        contact_wildcards=(),
        per_material_props=("E", "nu"),
        pairwise_props=("CoR",),
        fused_variant="hertz_frictionless",
    )
