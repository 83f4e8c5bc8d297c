"""Explicit time integration with family prescriptions.

Parity target: integrateOwners / integrateVelPos
(DEMIntegrationKernels.cu:100-264) including the three velocity pass-on
policies (IntegrationVelPassOnForwardEuler/CenteredDiff/ExtendedTaylor.cu):

  forward euler      : position advances with the OLD velocity
  centered difference: position advances with the NEW velocity
  extended taylor    : position advances with the midpoint velocity

and the prescription semantics of applyPrescribedVel/Pos/AddedAcceleration:
velocity prescriptions dictate components (skipping true physics for them),
position/quaternion prescriptions pin the pose, added accelerations stack on
top of contact accelerations without polluting the queryable acc arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..defines import F, I, RESERVED_FAMILY, TimeIntegrator
from ..models.prescriptions import PrescriptionTables
from ..state import Owners
from . import quat as quat_ops
from . import voxel


class OwnerView:
    """Read-only convenience view handed to family-change conditions and
    inspectors: f32 positions plus raw state arrays.

    Frame: `pos` is LBF-RELATIVE (the solver's internal frame, origin at
    the domain's lower corner), NOT user coordinates — add the solver's
    `_lbf` offset to user-frame thresholds before comparing (see
    tests/test_api_balldrop.py for the pattern)."""

    def __init__(self, owners: Owners, voxel_size, time):
        self.pos = voxel.decode_f32(owners.vox, owners.loc, voxel_size)
        self.vel = owners.vel
        self.omg = owners.omg
        self.quat = owners.quat
        self.family = owners.family
        self.mass = owners.mass
        self.moi = owners.moi
        self.wildcards = owners.wildcards
        self.time = time


def integrate_owners(
    owners: Owners,
    f_acc: jnp.ndarray,     # f32[N,3] summed contact force, global
    t_acc: jnp.ndarray,     # f32[N,3] summed contact torque, body frame
    params,
    tables: PrescriptionTables,
    voxel_size: float,
    integrator: TimeIntegrator,
    time,
) -> Owners:
    h = params.h
    n = owners.n

    lin_acc = f_acc / owners.mass[:, None]
    ang_acc = t_acc / owners.moi

    pidx, pmatch = tables.lookup(owners.family)
    pm = pmatch[:, None]

    # added accelerations (do not appear in the queryable acc arrays)
    extra_acc = jnp.where(pm & tables.acc_mask[pidx], tables.acc[pidx], 0.0)
    extra_aacc = jnp.where(
        pm & tables.ang_acc_mask[pidx], tables.ang_acc[pidx], 0.0
    )

    # "soft" prescriptions assign the component, then physics integrates
    # on top (reference dictate=false / CorrectFamily* path,
    # DEMIntegrationKernels.cu:95-236)
    v_base = jnp.where(
        pm & tables.lin_vel_soft_mask[pidx], tables.lin_vel_soft[pidx],
        owners.vel,
    )
    o_base = jnp.where(
        pm & tables.rot_vel_soft_mask[pidx], tables.rot_vel_soft[pidx],
        owners.omg,
    )
    vel_unc = v_base + (lin_acc + params.gravity[None, :] + extra_acc
                        + owners.ext_acc) * h
    omg_unc = o_base + (ang_acc + extra_aacc + owners.ext_ang_acc) * h

    v_presc_mask = pm & tables.lin_vel_mask[pidx]
    o_presc_mask = pm & tables.rot_vel_mask[pidx]
    vel_new = jnp.where(v_presc_mask, tables.lin_vel[pidx], vel_unc)
    omg_new = jnp.where(o_presc_mask, tables.rot_vel[pidx], omg_unc)

    # reserved family 255 is always fully fixed (reference
    # APIPrivate.cpp:818-825, Defines.h RESERVED_FAMILY_NUM)
    fixed = (owners.family == RESERVED_FAMILY)[:, None]
    vel_new = jnp.where(fixed, 0.0, vel_new)
    omg_new = jnp.where(fixed, 0.0, omg_new)
    v_presc_mask = v_presc_mask | fixed
    o_presc_mask = o_presc_mask | fixed

    # velocity pass-on strategy (reference
    # DEMCustomizablePolicies/IntegrationVelPassOn*.cu):
    #   FORWARD_EULER       x advances with the OLD velocity
    #   CENTERED_DIFFERENCE x advances with the NEW velocity (symplectic)
    #   EXTENDED_TAYLOR     x advances with the midpoint (old + a*h/2)
    if integrator == TimeIntegrator.FORWARD_EULER:
        v_pass = jnp.where(v_presc_mask, vel_new, owners.vel)
        o_pass = jnp.where(o_presc_mask, omg_new, owners.omg)
    elif integrator == TimeIntegrator.CENTERED_DIFFERENCE:
        v_pass, o_pass = vel_new, omg_new
    elif integrator == TimeIntegrator.EXTENDED_TAYLOR:
        v_pass = jnp.where(
            v_presc_mask, vel_new, owners.vel + 0.5 * (vel_new - owners.vel)
        )
        o_pass = jnp.where(
            o_presc_mask, omg_new, owners.omg + 0.5 * (omg_new - owners.omg)
        )
    else:  # pragma: no cover
        raise ValueError(integrator)

    # position update through the voxel codec; soft position
    # prescriptions re-seat the base position first
    disp = v_pass * h
    vox0, loc0 = owners.vox, owners.loc
    sp_mask = pm & tables.lin_pos_soft_mask[pidx]
    if not tables.empty:
        svox, sloc = voxel.encode(tables.lin_pos_soft[pidx], voxel_size)
        vox0 = jnp.where(sp_mask, svox, vox0)
        loc0 = jnp.where(sp_mask, sloc, loc0)
    vox, loc = voxel.advance(vox0, loc0, disp, voxel_size)

    # position prescription pins components to an absolute position
    p_presc_mask = pm & tables.lin_pos_mask[pidx]
    any_pos = bool(tables.lin_pos_mask.shape[0]) and not tables.empty
    if any_pos:
        target = tables.lin_pos[pidx]  # absolute, LBF-relative (f32)
        tvox, tloc = voxel.encode(target, voxel_size)
        vox = jnp.where(p_presc_mask, tvox, vox)
        loc = jnp.where(p_presc_mask, tloc, loc)

    # orientation; soft quaternion prescriptions re-seat the base first
    q_base = owners.quat
    qs_mask = pmatch & tables.quat_soft_mask[pidx, 0]
    if not tables.empty:
        q_base = jnp.where(
            qs_mask[:, None], quat_ops.normalize(tables.quat_soft[pidx]),
            q_base,
        )
    q_new = quat_ops.integrate(q_base, o_pass, h)
    q_presc_mask = pmatch & tables.quat_mask[pidx, 0]
    if not tables.empty:
        q_target = quat_ops.normalize(
            jnp.where(
                q_presc_mask[:, None],
                tables.quat[pidx],
                q_new,
            )
        )
    else:
        q_target = q_new

    return owners.replace(
        vox=vox,
        loc=loc,
        quat=q_target,
        vel=vel_new,
        omg=omg_new,
        lin_acc=lin_acc,
        ang_acc=ang_acc,
    )


def apply_family_changes(owners: Owners, rules, voxel_size, time) -> Owners:
    """Apply ChangeFamilyWhen rules each step (DEMModeratorKernels.cu)."""
    if not rules:
        return owners
    view = OwnerView(owners, voxel_size, time)
    family = owners.family
    for rule in rules:
        cond = rule.condition(view, time)
        family = jnp.where(
            cond & (owners.family == rule.from_family),
            jnp.asarray(rule.to_family, I),
            family,
        )
    return owners.replace(family=family)
