"""User-customizable force-model protocol.

The reference lets users supply raw CUDA strings that jitify splices into the
force kernel (DEMCalcForceKernels.cu:248, AuxClasses.h:422-486 DEMForceModel,
ingredient scanner Models.h:216-316). The TPU-native equivalent: a force
model is a *traceable Python callable* over batched jnp arrays. It receives a
`ContactContext` carrying the same "ingredients" DEME exposes (overlap depth,
contact normal/point, body kinematics, mixed material properties, wildcards,
time/ts) and returns the force on body A, a torque-only force, and updated
per-contact wildcards. JAX traces it straight into the compiled step — the
zero-overhead property of jitify substitution, without NVRTC.

All context fields are arrays batched over the contact-table capacity axis.
Padding slots are masked by the engine after the model runs; models may
compute garbage there as long as it is finite (use jnp.where guards around
sqrt/log of possibly-negative values).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax.numpy as jnp


@dataclasses.dataclass
class ContactContext:
    """Ingredients available to force models (parity: Models.h:219-316)."""

    # geometry
    overlap: jnp.ndarray       # f32[C] penetration depth (<0 within margin)
    b2a: jnp.ndarray           # f32[C,3] unit contact normal, B -> A
    cp_a: jnp.ndarray          # f32[C,3] contact point rel owner-A CoM, global orientation
    cp_b: jnp.ndarray          # f32[C,3] contact point rel owner-B CoM, global orientation
    a_radius: jnp.ndarray      # f32[C] sphere A radius
    b_radius: jnp.ndarray      # f32[C] sphere B radius (HUGE for tri/analytical)
    contact_type: jnp.ndarray  # i32[C]
    # kinematics
    a_lin_vel: jnp.ndarray     # f32[C,3] owner A linear velocity, global
    b_lin_vel: jnp.ndarray
    a_rot_vel: jnp.ndarray     # f32[C,3] owner A angular velocity, body frame
    b_rot_vel: jnp.ndarray
    a_quat: jnp.ndarray        # f32[C,4]
    b_quat: jnp.ndarray
    # mass properties
    a_mass: jnp.ndarray        # f32[C]
    b_mass: jnp.ndarray
    a_moi: jnp.ndarray         # f32[C,3]
    b_moi: jnp.ndarray
    # identity
    a_owner: jnp.ndarray       # i32[C]
    b_owner: jnp.ndarray
    a_geo: jnp.ndarray         # i32[C] geometry (sphere/tri/anal component) id
    b_geo: jnp.ndarray
    a_family: jnp.ndarray      # i32[C]
    b_family: jnp.ndarray
    a_mat: jnp.ndarray         # i32[C]
    b_mat: jnp.ndarray
    # state
    time: jnp.ndarray          # f32[]
    ts: jnp.ndarray            # f32[] step size
    # wildcards
    wildcards: Dict[str, jnp.ndarray]       # per-contact, each f32[C]
    a_geo_wc: Dict[str, jnp.ndarray]        # geometry wildcards gathered for A
    b_geo_wc: Dict[str, jnp.ndarray]
    a_owner_wc: Dict[str, jnp.ndarray]
    b_owner_wc: Dict[str, jnp.ndarray]
    # material tables (closed over by helpers below)
    mat_props: Dict[str, jnp.ndarray]       # f32[M] per material
    pair_props: Dict[str, jnp.ndarray]      # f32[M,M] pairwise
    # premixed per-contact material properties (denormalized at CD refresh
    # by forces.finalize_table; declared props resolve without any gather)
    premix: Dict[str, jnp.ndarray] = dataclasses.field(default_factory=dict)

    # -- helpers ----------------------------------------------------------
    def mat(self, name: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-material property for (A, B)."""
        a = self.premix.get(name + ":a")
        if a is not None:
            return a, self.premix[name + ":b"]
        tab = self.mat_props[name]
        return tab[self.a_mat], tab[self.b_mat]

    def pair(self, name: str) -> jnp.ndarray:
        """Pairwise-mixed property for the (A, B) material pair
        (reference: CoR/mu/Crr tables, FullHertzianForceModel.cu:16-18)."""
        p = self.premix.get(name)
        if p is not None:
            return p
        return self.pair_props[name][self.a_mat, self.b_mat]

    def rot_vel_cp_global(self):
        """Contact-point rotational velocity of A and B in the global frame
        (FullHertzianForceModel.cu:21-33): R(q) (omega_body x cp_local)."""
        from ..ops import quat as q

        lcp_a = q.rotate_inv(self.a_quat, self.cp_a)
        lcp_b = q.rotate_inv(self.b_quat, self.cp_b)
        va = q.rotate(self.a_quat, jnp.cross(self.a_rot_vel, lcp_a))
        vb = q.rotate(self.b_quat, jnp.cross(self.b_rot_vel, lcp_b))
        return va, vb


# model signature: fn(ctx) -> (force_on_A[C,3], torque_only_force[C,3],
#                              new_contact_wildcards: dict)
ForceFn = Callable[[ContactContext], Tuple[jnp.ndarray, jnp.ndarray, Dict]]


@dataclasses.dataclass(frozen=True, eq=False)
class ForceModel:
    """A force model + its declared resources (parity: DEMForceModel,
    AuxClasses.h:422-486)."""

    name: str
    fn: ForceFn
    contact_wildcards: Tuple[str, ...] = ()
    owner_wildcards: Tuple[str, ...] = ()
    geo_wildcards: Tuple[str, ...] = ()
    per_material_props: Tuple[str, ...] = ("E", "nu")
    pairwise_props: Tuple[str, ...] = ("CoR", "mu", "Crr")
    # if True the model produces force even without overlap (within the
    # family extra margin) — e.g. electrostatics (DEMdemo_Electrostatic)
    no_contact_force: bool = False
    # built-in models with a hand-written fused Pallas kernel set this
    # ("hertz_full" / "hertz_frictionless"); custom models run the traced
    # XLA path (ops/forces.contact_pass)
    fused_variant: str | None = None

    def __hash__(self):
        return id(self)

    def SetMustHaveMatProp(self, names):
        object.__setattr__(self, "per_material_props", tuple(names))
        object.__setattr__(self, "fused_variant", None)

    def SetMustPairwiseMatProp(self, names):
        object.__setattr__(self, "pairwise_props", tuple(names))
        object.__setattr__(self, "fused_variant", None)

    def SetPerContactWildcards(self, names):
        object.__setattr__(self, "contact_wildcards", tuple(sorted(names)))
        object.__setattr__(self, "fused_variant", None)

    def SetPerOwnerWildcards(self, names):
        object.__setattr__(self, "owner_wildcards", tuple(sorted(names)))

    def SetPerGeometryWildcards(self, names):
        object.__setattr__(self, "geo_wildcards", tuple(sorted(names)))


def effective_mass(ctx: ContactContext) -> jnp.ndarray:
    return ctx.a_mass * ctx.b_mass / (ctx.a_mass + ctx.b_mass)


def effective_radius(ctx: ContactContext) -> jnp.ndarray:
    return ctx.a_radius * ctx.b_radius / (ctx.a_radius + ctx.b_radius)


def hertz_material_mix(E_a, nu_a, E_b, nu_b):
    """Effective Young's/shear modulus of the pair
    (reference matProxy2ContactParam, DEMHelperKernels.cuh:434)."""
    inv_E = (1.0 - nu_a * nu_a) / E_a + (1.0 - nu_b * nu_b) / E_b
    inv_G = (
        2.0 * (2.0 - nu_a) * (1.0 + nu_a) / E_a
        + 2.0 * (2.0 - nu_b) * (1.0 + nu_b) / E_b
    )
    return 1.0 / inv_E, 1.0 / inv_G
