"""Family prescriptions and family-change rules.

The reference compiles user-supplied C expression strings into per-family
``switch`` cases in the integration kernel (familyPrescription_t,
Structs.h:406-449; codegen APIPrivate.cpp:1601-1708; applied at
DEMIntegrationKernels.cu:8-98). Here a prescription is a set of traceable
Python callables of simulation time. Per step the engine evaluates every
registered family's callables once (they are O(#families), not O(#owners))
into dense tables and gathers per owner by family ID — the XLA equivalent of
the jitified switch.

Semantics preserved from the reference:
  * velocity / angular-velocity prescriptions **dictate** the component
    (true physics is skipped for it) unless the component mask is False;
  * angular velocity is in the owner's body frame (omgBar semantics);
  * position / quaternion prescriptions pin the pose;
  * "added acceleration" is additive and does not show up in contact-force
    query results (DEMIntegrationKernels.cu:144-153).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..defines import F, I

Vec3Fn = Callable[[jnp.ndarray], jnp.ndarray]  # t -> (3,)
QuatFn = Callable[[jnp.ndarray], jnp.ndarray]  # t -> (4,) (w,x,y,z)


@dataclasses.dataclass(frozen=True, eq=False)
class FamilyPrescription:
    family: int
    lin_vel: Optional[Vec3Fn] = None
    lin_vel_mask: Tuple[bool, bool, bool] = (True, True, True)
    rot_vel: Optional[Vec3Fn] = None          # body frame
    rot_vel_mask: Tuple[bool, bool, bool] = (True, True, True)
    lin_pos: Optional[Vec3Fn] = None          # absolute, user frame
    lin_pos_mask: Tuple[bool, bool, bool] = (True, True, True)
    quat: Optional[QuatFn] = None
    acc: Optional[Vec3Fn] = None              # added linear acceleration
    ang_acc: Optional[Vec3Fn] = None          # added angular acc, body frame
    # "soft" (non-dictating) prescriptions: ASSIGNED each step, then the
    # simulation physics integrates on top — exactly the reference's
    # dictate=false / CorrectFamily* codegen, which emits `vX = expr;`
    # with the Prescribed flag left false so `vX += (a+g)h` still runs
    # (APIPrivate.cpp:1615-1641 + DEMIntegrationKernels.cu:95-236)
    lin_vel_soft: Optional[Vec3Fn] = None
    lin_vel_soft_mask: Tuple[bool, bool, bool] = (True, True, True)
    rot_vel_soft: Optional[Vec3Fn] = None     # body frame
    rot_vel_soft_mask: Tuple[bool, bool, bool] = (True, True, True)
    lin_pos_soft: Optional[Vec3Fn] = None     # absolute, user frame
    lin_pos_soft_mask: Tuple[bool, bool, bool] = (True, True, True)
    quat_soft: Optional[QuatFn] = None

    def __hash__(self):
        return id(self)


def fixed(family: int) -> FamilyPrescription:
    """All-DOF fixed family (the semantics of reserved family 255 and
    SetFamilyFixed, reference API.h:688)."""
    zero = lambda t: jnp.zeros((3,), F)
    return FamilyPrescription(family=family, lin_vel=zero, rot_vel=zero)


def _merge_vec(fa, ma, fb, mb):
    """Component-wise merge of a masked vec3 channel: the later
    prescription's components override exactly where ITS mask is set;
    earlier components survive elsewhere. In the reference each axis is
    an independent codegen expression (APIPrivate.cpp:841-937), so
    mixing SetFamilyPrescribedLinVel with the per-axis setters keeps
    the earlier axes prescribed."""
    if fb is None:
        return fa, ma
    if fa is None:
        return fb, mb
    sel = jnp.asarray(mb, bool)

    def fn(t, fa=fa, fb=fb, sel=sel):
        return jnp.where(sel, jnp.asarray(fb(t), F).reshape(3),
                         jnp.asarray(fa(t), F).reshape(3))

    return fn, tuple(x or y for x, y in zip(ma, mb))


def merge(a: FamilyPrescription, b: FamilyPrescription) -> FamilyPrescription:
    """OR-merge two prescriptions for the same family (the reference merges
    repeated calls per family, APIPrivate.cpp:841-937)."""
    assert a.family == b.family
    lin_vel, lin_vel_mask = _merge_vec(
        a.lin_vel, a.lin_vel_mask, b.lin_vel, b.lin_vel_mask)
    rot_vel, rot_vel_mask = _merge_vec(
        a.rot_vel, a.rot_vel_mask, b.rot_vel, b.rot_vel_mask)
    lin_pos, lin_pos_mask = _merge_vec(
        a.lin_pos, a.lin_pos_mask, b.lin_pos, b.lin_pos_mask)
    lv_s, lv_s_mask = _merge_vec(
        a.lin_vel_soft, a.lin_vel_soft_mask,
        b.lin_vel_soft, b.lin_vel_soft_mask)
    rv_s, rv_s_mask = _merge_vec(
        a.rot_vel_soft, a.rot_vel_soft_mask,
        b.rot_vel_soft, b.rot_vel_soft_mask)
    lp_s, lp_s_mask = _merge_vec(
        a.lin_pos_soft, a.lin_pos_soft_mask,
        b.lin_pos_soft, b.lin_pos_soft_mask)
    return FamilyPrescription(
        family=a.family,
        lin_vel=lin_vel,
        lin_vel_mask=lin_vel_mask,
        rot_vel=rot_vel,
        rot_vel_mask=rot_vel_mask,
        lin_pos=lin_pos,
        lin_pos_mask=lin_pos_mask,
        quat=b.quat or a.quat,
        acc=b.acc or a.acc,
        ang_acc=b.ang_acc or a.ang_acc,
        lin_vel_soft=lv_s,
        lin_vel_soft_mask=lv_s_mask,
        rot_vel_soft=rv_s,
        rot_vel_soft_mask=rv_s_mask,
        lin_pos_soft=lp_s,
        lin_pos_soft_mask=lp_s_mask,
        quat_soft=b.quat_soft or a.quat_soft,
    )


@dataclasses.dataclass(frozen=True, eq=False)
class FamilyChange:
    """ChangeFamilyWhen rule (reference API.h:1021, applied per step by
    applyFamilyChanges, DEMModeratorKernels.cu). `condition` receives an
    OwnerView (pos/vel/omg/quat/family/wildcards arrays) and sim time and
    returns a bool[N] mask."""

    from_family: int
    to_family: int
    condition: Callable  # (OwnerView, t) -> bool[N]

    def __hash__(self):
        return id(self)


# ---------------------------------------------------------------------------
# Table evaluation (inside jit, once per step)
# ---------------------------------------------------------------------------


class PrescriptionTables:
    """Dense per-registered-family tables, evaluated at trace time."""

    def __init__(self, prescriptions: Sequence[FamilyPrescription], t):
        pres = sorted(prescriptions, key=lambda p: p.family)
        fam_list = [p.family for p in pres] or [-99999]  # never matches
        self.fam_ids = jnp.asarray(np.asarray(fam_list, np.int32), I)
        P = max(len(pres), 1)

        def table(getter, maskget, width):
            v = jnp.zeros((P, width), F)
            m = jnp.zeros((P, width), bool)
            for i, p in enumerate(pres):
                fn = getter(p)
                if fn is None:
                    continue
                v = v.at[i].set(jnp.asarray(fn(t), F).reshape(width))
                m = m.at[i].set(
                    jnp.asarray(maskget(p), bool).reshape(width))
            return v, m

        self.lin_vel, self.lin_vel_mask = table(
            lambda p: p.lin_vel, lambda p: p.lin_vel_mask, 3
        )
        self.rot_vel, self.rot_vel_mask = table(
            lambda p: p.rot_vel, lambda p: p.rot_vel_mask, 3
        )
        self.lin_pos, self.lin_pos_mask = table(
            lambda p: p.lin_pos, lambda p: p.lin_pos_mask, 3
        )
        self.quat, self.quat_mask = table(
            lambda p: p.quat, lambda p: (True, True, True, True), 4
        )
        self.acc, self.acc_mask = table(
            lambda p: p.acc, lambda p: (True, True, True), 3
        )
        self.ang_acc, self.ang_acc_mask = table(
            lambda p: p.ang_acc, lambda p: (True, True, True), 3
        )
        self.lin_vel_soft, self.lin_vel_soft_mask = table(
            lambda p: p.lin_vel_soft, lambda p: p.lin_vel_soft_mask, 3
        )
        self.rot_vel_soft, self.rot_vel_soft_mask = table(
            lambda p: p.rot_vel_soft, lambda p: p.rot_vel_soft_mask, 3
        )
        self.lin_pos_soft, self.lin_pos_soft_mask = table(
            lambda p: p.lin_pos_soft, lambda p: p.lin_pos_soft_mask, 3
        )
        self.quat_soft, self.quat_soft_mask = table(
            lambda p: p.quat_soft, lambda p: (True, True, True, True), 4
        )
        self.empty = len(pres) == 0

    def lookup(self, family):
        """Per-owner row index into the tables; -matched mask."""
        idx = jnp.searchsorted(self.fam_ids, family)
        idx = jnp.clip(idx, 0, self.fam_ids.shape[0] - 1)
        matched = self.fam_ids[idx] == family
        return idx, matched
