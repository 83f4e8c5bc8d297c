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


def merge(a: FamilyPrescription, b: FamilyPrescription) -> FamilyPrescription:
    """OR-merge two prescriptions for the same family (the reference merges
    repeated calls per family, APIPrivate.cpp:841-937)."""
    assert a.family == b.family
    return FamilyPrescription(
        family=a.family,
        lin_vel=b.lin_vel or a.lin_vel,
        lin_vel_mask=b.lin_vel_mask if b.lin_vel else a.lin_vel_mask,
        rot_vel=b.rot_vel or a.rot_vel,
        rot_vel_mask=b.rot_vel_mask if b.rot_vel else a.rot_vel_mask,
        lin_pos=b.lin_pos or a.lin_pos,
        lin_pos_mask=b.lin_pos_mask if b.lin_pos else a.lin_pos_mask,
        quat=b.quat or a.quat,
        acc=b.acc or a.acc,
        ang_acc=b.ang_acc or a.ang_acc,
        lin_vel_soft=b.lin_vel_soft or a.lin_vel_soft,
        lin_vel_soft_mask=(b.lin_vel_soft_mask if b.lin_vel_soft
                           else a.lin_vel_soft_mask),
        rot_vel_soft=b.rot_vel_soft or a.rot_vel_soft,
        rot_vel_soft_mask=(b.rot_vel_soft_mask if b.rot_vel_soft
                           else a.rot_vel_soft_mask),
        lin_pos_soft=b.lin_pos_soft or a.lin_pos_soft,
        lin_pos_soft_mask=(b.lin_pos_soft_mask if b.lin_pos_soft
                           else a.lin_pos_soft_mask),
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
            vals = np.zeros((P, width), np.float32)
            masks = np.zeros((P, width), bool)
            rows = []
            for i, p in enumerate(pres):
                fn = getter(p)
                if fn is not None:
                    rows.append((i, fn, maskget(p)))
            v = jnp.zeros((P, width), F)
            m = jnp.asarray(masks)
            for i, fn, mask in rows:
                v = v.at[i].set(jnp.asarray(fn(t), F).reshape(width))
                m = m.at[i].set(jnp.asarray(mask, bool).reshape(width)[:width])
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
