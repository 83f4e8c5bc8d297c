"""Assembly of SimState / RuntimeParams from flat host arrays.

This is the array-level entry point used by both the DEMSolver facade
(api.py) and engine-level tests. It plays the role of the reference's
allocateGPUArrays + initGPUArrays + populateEntityArrays pipeline
(APIPrivate.cpp:1169-1232, dT.cpp:409-1025).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from .defines import F, I
from .ops import voxel
from .state import (
    Analyticals,
    ContactTable,
    Owners,
    RuntimeParams,
    SimState,
    Spheres,
    SolverConfig,
    Triangles,
)


def _f(x, shape=None):
    a = jnp.asarray(x, F)
    return a if shape is None else a.reshape(shape)


def _i(x, shape=None):
    a = jnp.asarray(x, I)
    return a if shape is None else a.reshape(shape)


def make_owners(pos, voxel_size, *, quat=None, vel=None, omg=None,
                family=None, mass=None, moi=None, wildcards=None) -> Owners:
    """pos: (N,3) float64 LBF-relative positions (exact host encode)."""
    pos = np.asarray(pos, np.float64).reshape(-1, 3)
    n = pos.shape[0]
    vox, loc = voxel.encode_host(pos, voxel_size)
    if quat is None:
        quat = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (n, 1))
    return Owners(
        vox=jnp.asarray(vox),
        loc=jnp.asarray(loc),
        quat=_f(quat, (n, 4)),
        vel=_f(np.zeros((n, 3)) if vel is None else vel, (n, 3)),
        omg=_f(np.zeros((n, 3)) if omg is None else omg, (n, 3)),
        lin_acc=jnp.zeros((n, 3), F),
        ang_acc=jnp.zeros((n, 3), F),
        ext_acc=jnp.zeros((n, 3), F),
        ext_ang_acc=jnp.zeros((n, 3), F),
        family=_i(np.zeros(n) if family is None else family, (n,)),
        mass=_f(np.ones(n) if mass is None else mass, (n,)),
        moi=_f(np.ones((n, 3)) if moi is None else moi, (n, 3)),
        wildcards=dict(wildcards or {}),
    )


def make_spheres(owner, relpos, radius, mat=None, wildcards=None) -> Spheres:
    owner = np.asarray(owner).reshape(-1)
    s = owner.shape[0]
    return Spheres(
        owner=_i(owner),
        relpos=_f(relpos, (s, 3)),
        radius=_f(radius, (s,)),
        mat=_i(np.zeros(s) if mat is None else mat, (s,)),
        wildcards={k: _f(v, (s,)) for k, v in (wildcards or {}).items()},
    )


def empty_triangles() -> Triangles:
    return Triangles(
        owner=jnp.zeros((0,), I),
        nodes=jnp.zeros((0, 3, 3), F),
        mat=jnp.zeros((0,), I),
        wildcards={},
    )


def make_triangles(owner, nodes, mat=None, wildcards=None) -> Triangles:
    owner = np.asarray(owner).reshape(-1)
    t = owner.shape[0]
    if t == 0:
        return empty_triangles()
    return Triangles(
        owner=_i(owner),
        nodes=_f(nodes, (t, 3, 3)),
        mat=_i(np.zeros(t) if mat is None else mat, (t,)),
        wildcards={k: _f(v, (t,)) for k, v in (wildcards or {}).items()},
    )


def empty_analyticals() -> Analyticals:
    return Analyticals(
        owner=jnp.zeros((0,), I),
        objtype=jnp.zeros((0,), I),
        relpos=jnp.zeros((0, 3), F),
        direction=jnp.zeros((0, 3), F),
        size=jnp.zeros((0, 3), F),
        normal_sign=jnp.zeros((0,), F),
        mat=jnp.zeros((0,), I),
        wildcards={},
    )


def make_analyticals(owner, objtype, relpos, direction, size, normal_sign,
                     mat=None, wildcards=None) -> Analyticals:
    owner = np.asarray(owner).reshape(-1)
    a = owner.shape[0]
    if a == 0:
        return empty_analyticals()
    return Analyticals(
        owner=_i(owner),
        objtype=_i(objtype, (a,)),
        relpos=_f(relpos, (a, 3)),
        direction=_f(direction, (a, 3)),
        size=_f(size, (a, 3)),
        normal_sign=_f(normal_sign, (a,)),
        mat=_i(np.zeros(a) if mat is None else mat, (a,)),
        wildcards={k: _f(v, (a,)) for k, v in (wildcards or {}).items()},
    )


def empty_ss_table(cfg: SolverConfig, cap: int,
                   uniq_rows: int = 0) -> ContactTable:
    """The ONE owner of the SS-table layout decision (fused/slim/uniq):
    fused layouts exist exactly when the fused pass will read them.
    Restart seeding (api._seed_existing_contacts) and make_state both
    build through here so the layouts can never diverge."""
    from .ops.forces import premix_names

    fused = (cfg.use_fused_force
             and cfg.force_model.fused_variant is not None)
    # slim tables carry NO premix dict: the fused kernel reads the
    # effective moduli from its fstat rows, and the XLA contact_pass never
    # sees this table — 8 dead f32[cap] arrays (~400 MB at the 1M-clump
    # capacity) otherwise ride the state (VERDICT r3 #2)
    return ContactTable.empty(
        cap, cfg.force_model.contact_wildcards,
        () if fused else premix_names(cfg.force_model),
        fused=fused,
        slim=cfg.use_fused_force,
        uniq_rows=uniq_rows,
    )


def ss_layout_fields(cfg: SolverConfig, cap: int,
                     uniq_rows: int = 0) -> dict:
    """The layout-dependent fields of empty_ss_table as a dict, for
    swapping layouts on a live table (OOM-recovery relayout) without
    allocating the identity/history fields."""
    from .ops.forces import premix_names

    fused = (cfg.use_fused_force
             and cfg.force_model.fused_variant is not None)
    return ContactTable.empty_layout(
        cap,
        () if fused else premix_names(cfg.force_model),
        fused=fused,
        slim=cfg.use_fused_force,
        uniq_rows=uniq_rows,
    )


def ss_uniq_rows(cfg: SolverConfig, n_owners: int) -> int:
    """Rows of the per-block unique-other tables (0 when uniq fetch or
    the fused pass is off)."""
    if not (cfg.uniq_cap and cfg.use_fused_force
            and cfg.force_model.fused_variant is not None):
        return 0
    from .ops.pallas_force import OB

    return -(-n_owners // OB) * cfg.uniq_cap


def make_state(owners: Owners, spheres: Spheres, cfg: SolverConfig,
               tris: Optional[Triangles] = None,
               anals: Optional[Analyticals] = None) -> SimState:
    wc = cfg.force_model.contact_wildcards
    from .ops.forces import premix_names

    pn = premix_names(cfg.force_model)
    uniq_rows = ss_uniq_rows(cfg, owners.n)

    # build the zero tables inside ONE jitted program: eagerly, each
    # jnp.zeros is its own device dispatch — ~90 of them — and on the
    # tunneled TPU backend every first-seen eager op is a separate
    # remote compile (a 524k-clump Initialize measured 25 MINUTES of
    # wall clock in eager mode; one fused allocation program compiles
    # once and replays from the persistent cache)
    import jax

    def build(o, s, t, a):
        return SimState(
            owners=o,
            spheres=s,
            tris=t,
            anals=a,
            ss=empty_ss_table(cfg, cfg.cap_ss, uniq_rows=uniq_rows),
            st=ContactTable.empty(cfg.cap_st, wc, pn),
            sa=ContactTable.empty(cfg.cap_sa, wc, pn),
            time=jnp.zeros((), F),
            step=jnp.zeros((), I),
            overflow=jnp.zeros((), I),
            lost_contacts=jnp.zeros((), I),
            max_vel=jnp.zeros((), F),
        )

    return jax.jit(build)(
        owners, spheres,
        tris if tris is not None else empty_triangles(),
        anals if anals is not None else empty_analyticals(),
    )


def make_params(
    *,
    h: float,
    gravity,
    domain,
    materials: Dict[str, np.ndarray],
    pair_materials: Dict[str, np.ndarray],
    update_freq: int = 20,
    expand_safety_multi: float = 1.0,
    expand_safety_adder: float = 0.0,
    approx_max_vel: float = 1e30,
    error_out_vel: float = 5e4,
    error_out_avg_contacts: float = 100.0,
    family_mask: Optional[np.ndarray] = None,
    family_persist: Optional[np.ndarray] = None,
    family_extra_margin: Optional[np.ndarray] = None,
    cls_thr: float = 0.0,
    bin_factor: float = 1.0,
) -> RuntimeParams:
    if family_mask is None:
        family_mask = np.ones((256, 256), bool)
    if family_persist is None:
        family_persist = np.zeros((256, 256), bool)
    if family_extra_margin is None:
        family_extra_margin = np.zeros((256,), np.float32)
    return RuntimeParams(
        h=_f(h),
        gravity=_f(gravity, (3,)),
        domain=_f(domain, (3,)),
        expand_safety_multi=_f(expand_safety_multi),
        expand_safety_adder=_f(expand_safety_adder),
        approx_max_vel=_f(approx_max_vel),
        error_out_vel=_f(error_out_vel),
        error_out_avg_contacts=_f(error_out_avg_contacts),
        max_drift=_i(update_freq),
        family_mask=jnp.asarray(family_mask),
        family_persist=jnp.asarray(family_persist),
        family_extra_margin=_f(family_extra_margin, (256,)),
        mat_props={k: _f(v) for k, v in materials.items()},
        pair_props={k: _f(v) for k, v in pair_materials.items()},
        cls_thr=_f(cls_thr),
        bin_factor=_f(bin_factor),
    )
