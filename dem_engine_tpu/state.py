"""Device-side state pytrees for the solver.

Design translation from the reference (SURVEY.md §7): DEME keeps one copy of
every state array per worker thread (dT.h:161-228, kT.h:143-201) and shuttles
buffers between GPUs. Here there is a single functional `SimState` pytree,
threaded through jitted step functions; XLA owns placement and donation.

Layout decisions (TPU-first):
  * owner positions = int32 voxel triplet + float32 in-voxel offset
    (see ops/voxel.py) — the TPU re-expression of DEME's u64 voxel + u16
    subvoxel fixed point (VariableTypes.h:19-21).
  * angular velocity / angular acceleration / MOI live in the owner's BODY
    frame, matching DEME (omgBar semantics, DEMIntegrationKernels.cu:222,
    DEMCollectForceKernels.cu forceToAngAcc).
  * contact tables are fixed-capacity padded SoA with an explicit count and
    overflow flags; growth happens host-side between chunks, mirroring
    DEME's DualArray resize (DataMigrationHelper.hpp:204).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from .defines import F, I

# ---------------------------------------------------------------------------
# pytree dataclass helper
# ---------------------------------------------------------------------------


def pytree_dataclass(cls=None, *, meta_fields: Tuple[str, ...] = ()):
    """Register a dataclass as a JAX pytree with optional static fields."""

    def wrap(c):
        c = dataclasses.dataclass(c)
        data_fields = tuple(
            f.name for f in dataclasses.fields(c) if f.name not in meta_fields
        )
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=tuple(meta_fields)
        )
        c.replace = dataclasses.replace
        return c

    return wrap(cls) if cls is not None else wrap


# ---------------------------------------------------------------------------
# Entity state
# ---------------------------------------------------------------------------


@pytree_dataclass
class Owners:
    """Per-owner rigid body state (clumps, mesh owners, analytical owners).

    Mirrors the dT owner arrays (reference dT.h:161-199) plus flattened
    mass/MOI (the reference jitifies these; we store arrays — the XLA
    equivalent of its 'flattened' acquisition strategy, Models.h:66-171).
    """

    vox: jnp.ndarray        # i32[N,3]  voxel index per axis (LBF-relative)
    loc: jnp.ndarray        # f32[N,3]  in-voxel offset, in [0, voxel_size)
    quat: jnp.ndarray       # f32[N,4]  (w,x,y,z), body->global
    vel: jnp.ndarray        # f32[N,3]  linear velocity, global frame
    omg: jnp.ndarray        # f32[N,3]  angular velocity, body frame
    lin_acc: jnp.ndarray    # f32[N,3]  last contact accel (for queries)
    ang_acc: jnp.ndarray    # f32[N,3]  last contact angular accel, body frame
    ext_acc: jnp.ndarray    # f32[N,3]  user-set persistent extra accel
    ext_ang_acc: jnp.ndarray  # f32[N,3]
    family: jnp.ndarray     # i32[N]
    mass: jnp.ndarray       # f32[N]
    moi: jnp.ndarray        # f32[N,3]  principal MOI, body frame
    wildcards: Dict[str, jnp.ndarray]  # each f32[N]

    @property
    def n(self) -> int:
        return self.vox.shape[0]


@pytree_dataclass
class Spheres:
    """Per-sphere-component geometry (reference dT.h:103-143 template arrays,
    flattened per component as in ClumpCompAcqStratAllFlatten.cu)."""

    owner: jnp.ndarray    # i32[S]
    relpos: jnp.ndarray   # f32[S,3] body frame offset from owner CoM
    radius: jnp.ndarray   # f32[S]
    mat: jnp.ndarray      # i32[S]
    wildcards: Dict[str, jnp.ndarray]  # geometry wildcards, each f32[S]

    @property
    def n(self) -> int:
        return self.owner.shape[0]


@pytree_dataclass
class Triangles:
    """Triangle-mesh facets (reference BdrsAndObjs.h:230-585). Nodes are in
    the mesh owner's body frame; deformable meshes update them mid-sim."""

    owner: jnp.ndarray   # i32[T]
    nodes: jnp.ndarray   # f32[T,3,3]  three vertices, body frame
    mat: jnp.ndarray     # i32[T]
    wildcards: Dict[str, jnp.ndarray]

    @property
    def n(self) -> int:
        return self.owner.shape[0]


@pytree_dataclass
class Analyticals:
    """Flattened analytical boundary components (reference BdrsAndObjs.h:31-65
    param structs; jitified as __constant__ arrays at APIPrivate.cpp:1724-1788,
    stored as plain arrays here)."""

    owner: jnp.ndarray        # i32[A]
    objtype: jnp.ndarray      # i32[A]  ANAL_* codes
    relpos: jnp.ndarray       # f32[A,3] component position, owner body frame
    direction: jnp.ndarray    # f32[A,3] axis/normal, owner body frame
    size: jnp.ndarray         # f32[A,3] (size1,size2,size3)
    normal_sign: jnp.ndarray  # f32[A]  +1 inward (drum) / -1 outward
    #                           (defines.ENTITY_NORMAL_INWARD/OUTWARD)
    mat: jnp.ndarray          # i32[A]
    wildcards: Dict[str, jnp.ndarray]

    @property
    def n(self) -> int:
        return self.owner.shape[0]


# ---------------------------------------------------------------------------
# Contact tables
# ---------------------------------------------------------------------------


# width of the packed per-contact static record (see forces.build_statics)
STATIC_W = 32

# width of the slim fused-kernel static record (see forces.finalize_table):
#   [0] own_key (-1 dead)  [1] radA  [2:5] relposA  [5:8] relposB
#   [8] radB  [9] massA  [10] massB
#   [11] E_eff  [12] G_eff  [13] CoR  [14] mu  [15] Crr
# (E_eff/G_eff are premixed at refresh — the per-step kernel math starts
# from the effective moduli, saving 4 streamed rows vs raw E/nu pairs)
FSTAT_W = 16

# field-major wildcard rows carried for the fused pass's B-sorted layout
WCB_W = 4  # the fused pass exists only for the built-in Hertz models,
           # whose largest wildcard set is delta_tan xyz + delta_time


@pytree_dataclass
class ContactTable:
    """Fixed-capacity padded contact-pair table for one contact class.

    Equivalent of kT's pair arrays + dT's per-contact force/history arrays
    (kT.h:172-201, dT.h:202-228), with DEME's dynamic resize replaced by
    capacity + overflow-flag + host growth.

    Invariants after a refresh (forces.finalize_table):
      * padding entries have ``idA == -1`` and sit at the END;
      * rows are SORTED by ``own_a`` (so the A-side wrench reduction is a
        sorted segment sum and A-side owner gathers are windowed);
      * ``perm_b`` permutes rows into own_b-sorted order and
        ``own_b_sorted`` = own_b[perm_b] with dead rows mapped to n_owners.
    """

    idA: jnp.ndarray       # i32[C] sphere geometry id
    idB: jnp.ndarray       # i32[C] sphere / triangle / analytical id
    count: jnp.ndarray     # i32[]  number of live entries
    persist: jnp.ndarray   # i32[C] persistency marker
    force: jnp.ndarray     # f32[C,3] last force on A (global frame)
    torque: jnp.ndarray    # f32[C,3] last torque-only force (global frame)
    cpoint: jnp.ndarray    # f32[C,3] last contact point rel owner A CoM
    wildcards: Dict[str, jnp.ndarray]  # each f32[C]
    own_a: jnp.ndarray     # i32[C] owner of the A geometry (-1 dead)
    own_b: jnp.ndarray     # i32[C] owner of the B geometry (-1 dead)
    perm_b: jnp.ndarray    # i32[C] row permutation sorting by own_b
    own_b_sorted: jnp.ndarray  # i32[C] own_b[perm_b]; dead -> n_owners
    statics: jnp.ndarray   # f32[STATIC_W,C] denormalized statics, FIELD-major
                           # (rows = fields: the XLA contact_pass reads row
                           # slices); shape (0, C) when the fused pass owns
                           # this table (slim mode — saves 128 B/contact)
    premix: Dict[str, jnp.ndarray]  # premixed material props, each f32[C]
    # fused-force-pass layouts (shape (FSTAT_W, C) / (WCB_W, C) when the
    # model has a fused kernel variant, else (·, 0)): fstat_a follows the
    # table's own_a-sorted row order; fstat_b / wcb / own_a_b follow the
    # perm_b (own_b-sorted) order so the B-side one-hot wrench reduction
    # needs no per-step permutation
    fstat_a: jnp.ndarray   # f32[FSTAT_W, C]
    fstat_b: jnp.ndarray   # f32[FSTAT_W, C]
    wcb: jnp.ndarray       # f32[WCB_W, C] B-sorted contact wildcards
    own_a_b: jnp.ndarray   # i32[C] own_a[perm_b] (B-pass other-side gather)
    # unique-other-owner fetch (cfg.uniq_cap > 0): per owner block of the
    # fused pass, the other side's distinct owners are gathered once and
    # per-contact records reconstructed in-kernel by a one-hot matmul —
    # the per-step gather shrinks from cap rows to the unique count.
    # Layout rows are sorted by (own, other-own), so uidx is the rank of
    # the row's other-owner within its block's unique list.
    uidx: jnp.ndarray      # f32[C] A-layout unique index (exact int)
    uidx_b: jnp.ndarray    # f32[C] B-layout unique index
    uniq_a: jnp.ndarray    # i32[NB*UB] per-block unique own_b ids
    uniq_b: jnp.ndarray    # i32[NB*UB] per-block unique own_a ids
    uniq_max: jnp.ndarray  # i32[] max per-block unique count at refresh

    @property
    def cap(self) -> int:
        return self.idA.shape[0]

    @staticmethod
    def empty_layout(cap: int, premix_names: Tuple[str, ...] = (),
                     fused: bool = False, slim: bool = False,
                     uniq_rows: int = 0) -> dict:
        """Just the LAYOUT-dependent fields (statics/premix/fused/uniq) as
        a dict. Split out of empty() so an OOM-recovery relayout
        (solver._relayout_ss) can swap layouts on a live table without
        allocating the identity/history fields it is about to discard —
        at a 12M-contact cap those are ~1.4 GB of dead transient on a
        device that just RESOURCE_EXHAUSTED (round-4 1M bench)."""
        fcap = cap if fused else 0
        ucap = fcap if uniq_rows else 0
        # per-contact force/torque/cpoint are QUERY outputs: the fused
        # pass reduces wrenches in-kernel and only materializes them on
        # demand (api._fill_contact_fields), so slim tables carry none —
        # 36 B/contact (~340 MB at the 1M-clump capacity) otherwise rides
        # the scan carry. The XLA contact_pass path writes them per step
        # and keeps the full arrays.
        qcap = 0 if (fused and slim) else cap
        return dict(
            force=jnp.zeros((qcap, 3), F),
            torque=jnp.zeros((qcap, 3), F),
            cpoint=jnp.zeros((qcap, 3), F),
            statics=(jnp.zeros((0, cap), F) if (fused and slim) else
                     jnp.zeros((STATIC_W, cap), F).at[0].set(-1.0)),
            premix={k: jnp.zeros((cap,), F) for k in premix_names},
            fstat_a=jnp.zeros((FSTAT_W, fcap), F).at[0].set(-1.0),
            fstat_b=jnp.zeros((FSTAT_W, fcap), F).at[0].set(-1.0),
            wcb=jnp.zeros((WCB_W, fcap), F),
            own_a_b=jnp.zeros((fcap,), I),
            uidx=jnp.zeros((ucap,), F),
            uidx_b=jnp.zeros((ucap,), F),
            uniq_a=jnp.zeros((uniq_rows,), I),
            uniq_b=jnp.zeros((uniq_rows,), I),
            uniq_max=jnp.zeros((), I),
        )

    @staticmethod
    def empty(cap: int, wildcard_names: Tuple[str, ...] = (),
              premix_names: Tuple[str, ...] = (), fused: bool = False,
              slim: bool = False, uniq_rows: int = 0) -> "ContactTable":
        return ContactTable(
            idA=jnp.full((cap,), -1, I),
            idB=jnp.full((cap,), -1, I),
            count=jnp.zeros((), I),
            persist=jnp.zeros((cap,), I),
            wildcards={k: jnp.zeros((cap,), F) for k in wildcard_names},
            own_a=jnp.full((cap,), -1, I),
            own_b=jnp.full((cap,), -1, I),
            perm_b=jnp.arange(cap, dtype=I),
            own_b_sorted=jnp.full((cap,), 2**30, I),
            **ContactTable.empty_layout(cap, premix_names, fused, slim,
                                        uniq_rows),
        )

    def _resized(self, new_cap: int) -> "ContactTable":
        # one jitted program instead of ~30 eager dispatches: on the
        # tunneled TPU backend every first-seen eager op is a separate
        # remote compile, which made each capacity grow/shrink cost
        # minutes of wall clock at large caps (same fix as
        # initializer.make_state)
        return _resized_jit(self, new_cap)

    def _resized_impl(self, new_cap: int) -> "ContactTable":
        cap = self.cap
        if new_cap <= cap:
            sl = lambda x: x[:new_cap]
            # perm_b sorts rows by own_b with dead rows (key MAX) trailing
            # in index order, so when count <= new_cap the head slice is a
            # valid permutation of [0, new_cap); the clamp only matters in
            # the (never-taken) count > new_cap case
            perm_b = jnp.minimum(self.perm_b[:new_cap], new_cap - 1)
            own_b_sorted = self.own_b_sorted[:new_cap]
        else:
            pad = new_cap - cap

            def sl(x, fill=0):
                return jnp.concatenate(
                    [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)],
                    axis=0,
                )

            # grown rows are dead: append them as identity-permuted slots
            # whose sort key keeps them droppable by the segment reduces
            perm_b = jnp.concatenate(
                [self.perm_b, jnp.arange(cap, new_cap, dtype=I)]
            )
            own_b_sorted = jnp.concatenate(
                [self.own_b_sorted, jnp.full((pad,), 2**30, I)]
            )

        def sl_fill(x, fill):
            return x[:new_cap] if new_cap <= cap else sl(x, fill)

        return ContactTable(
            idA=sl_fill(self.idA, -1),
            idB=sl_fill(self.idB, -1),
            count=jnp.minimum(self.count, new_cap),
            persist=sl(self.persist),
            # slim fused tables carry no per-contact force/torque/cpoint
            # (query outputs; see empty_layout) — keep them empty
            force=sl(self.force) if self.force.shape[0] else self.force,
            torque=sl(self.torque) if self.torque.shape[0] else self.torque,
            cpoint=(sl(self.cpoint) if self.cpoint.shape[0]
                    else self.cpoint),
            wildcards={k: sl(v) for k, v in self.wildcards.items()},
            own_a=sl_fill(self.own_a, -1),
            own_b=sl_fill(self.own_b, -1),
            perm_b=perm_b,
            own_b_sorted=own_b_sorted,
            statics=self._cols(self.statics, new_cap, dead_row0=True),
            premix={k: sl(v) for k, v in self.premix.items()},
            fstat_a=self._cols(self.fstat_a, new_cap, dead_row0=True),
            fstat_b=self._cols(self.fstat_b, new_cap, dead_row0=True),
            wcb=self._cols(self.wcb, new_cap),
            own_a_b=sl_fill(self.own_a_b, 0) if self.own_a_b.shape[0]
            else self.own_a_b,
            # resized uidx rows are stale; the refresh that always follows
            # a grow (and precedes stepping after a shrink via the same
            # dead-rows-trail argument as perm_b) rebuilds them
            uidx=sl(self.uidx) if self.uidx.shape[0] else self.uidx,
            uidx_b=sl(self.uidx_b) if self.uidx_b.shape[0] else self.uidx_b,
            uniq_a=self.uniq_a,
            uniq_b=self.uniq_b,
            uniq_max=self.uniq_max,
        )

    def _cols(self, m, new_cap, dead_row0=False):
        """Resize a field-major (rows, C) array along its column axis.
        Shrink-slicing fstat_b/wcb columns is valid for the same reason the
        perm_b head slice is: dead rows sort to the END of the perm order,
        so live columns survive any shrink that keeps `count` columns."""
        if m.shape[0] == 0 or m.shape[1] != self.cap:
            # unused-layout placeholder ((W, 0) on a cap>0 table when the
            # fused/slim layouts are off): keep it empty instead of
            # inflating it to full width on grow
            return m
        cap = m.shape[1]
        if new_cap <= cap:
            return m[:, :new_cap]
        padc = jnp.zeros((m.shape[0], new_cap - cap), F)
        if dead_row0:
            padc = padc.at[0].set(-1.0)
        return jnp.concatenate([m, padc], axis=1)

    def shrunk(self, new_cap: int) -> "ContactTable":
        """Host-side capacity shrink. Safe because live entries are always
        compacted to the front of the table."""
        assert new_cap <= self.cap
        return self._resized(new_cap)

    def grown(self, new_cap: int) -> "ContactTable":
        """Host-side capacity growth (the resize path of DEME kT.cpp:21-41)."""
        assert new_cap >= self.cap
        return self._resized(new_cap)


_resized_jit = jax.jit(ContactTable._resized_impl, static_argnums=(1,))


# Overflow bit flags (surfaced to host between chunks; the reference instead
# resizes inline or error-outs, SURVEY.md §4.2)
OVF_SS_CAP = 1
OVF_ST_CAP = 2
OVF_SA_CAP = 4
OVF_BIN_OCC = 8
OVF_ROW_CAP = 16
OVF_TRI_BINS = 32
OVF_VEL = 64        # max system velocity above error-out threshold
OVF_ST_OCC = 128    # bin occupancy exceeds the ST sweep's slot scan
OVF_AVG_CONTACTS = 256  # avg contacts/sphere above error-out threshold
OVF_PALLAS_WIN = 512    # pallas sweep slab window exceeded
OVF_SEGRED = 1024       # pallas segment-reduce owner window exceeded
OVF_SPATIAL_BUCKET = 2048  # spatial-refresh exchange bucket exceeded
OVF_UNIQ = 4096         # per-block unique-other-owner count above uniq_cap
OVF_XOCC = 8192         # cross-class entry-bin occupancy above cross_mpb
OVF_LCAP = 16384        # large-class count above the compaction capacity


@pytree_dataclass
class SimState:
    """The full simulation state threaded through jitted step functions."""

    owners: Owners
    spheres: Spheres
    tris: Triangles
    anals: Analyticals
    ss: ContactTable
    st: ContactTable
    sa: ContactTable
    time: jnp.ndarray        # f32[]
    step: jnp.ndarray        # i32[]
    overflow: jnp.ndarray    # i32[] bit flags
    max_vel: jnp.ndarray     # f32[] measured at last refresh
    lost_contacts: jnp.ndarray  # i32[] cumulative dropped-history count


# ---------------------------------------------------------------------------
# Runtime parameters (traced arrays — changing them does NOT recompile)
# ---------------------------------------------------------------------------


@pytree_dataclass
class RuntimeParams:
    """Per-run tunables; the analogue of DEMSimParams (Defines.h:194-265)
    minus anything shape-affecting (those live in SolverConfig)."""

    h: jnp.ndarray                 # f32[] time step
    gravity: jnp.ndarray           # f32[3]
    domain: jnp.ndarray            # f32[3] extents (LBF-relative)
    expand_safety_multi: jnp.ndarray  # f32[]
    expand_safety_adder: jnp.ndarray  # f32[]
    approx_max_vel: jnp.ndarray    # f32[] velocity cap used in margins
    error_out_vel: jnp.ndarray     # f32[]
    error_out_avg_contacts: jnp.ndarray  # f32[]
    max_drift: jnp.ndarray         # i32[] steps the contact table stays live
    family_mask: jnp.ndarray       # bool[256,256] True => contact enabled
    family_persist: jnp.ndarray    # bool[256,256] True => mark persistent
    family_extra_margin: jnp.ndarray  # f32[256]
    mat_props: Dict[str, jnp.ndarray]   # per-material: each f32[M]
    pair_props: Dict[str, jnp.ndarray]  # pairwise-mixed: each f32[M,M]
    # two-class CD radius threshold (radius <= cls_thr -> small class);
    # traced so the split tracks radius changes without recompiles
    cls_thr: jnp.ndarray  # f32[]
    # bin-size multiplier above the 2*max(reach) one-bin-per-sphere floor
    # (>= 1, traced): driven by the engine's adaptive bin tuner and the
    # SetBinSize/SetInitBinSize APIs (reference calibrateParams loop,
    # kT.cpp:43-98) without recompiles
    bin_factor: jnp.ndarray  # f32[]


# ---------------------------------------------------------------------------
# Static solver configuration (hashable; changing it recompiles)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Everything that shapes the compiled program: capacities, the
    integrator, force-model callables, prescription callables.

    This plays the role of DEME's jitify substitution map
    (APIPrivate.cpp:1548-2132): the pieces that were compiled into CUDA
    kernels are here traced into the XLA program.
    """

    voxel_size: float
    integrator: Any                     # TimeIntegrator
    force_model: Any                    # models.ForceModel
    cap_ss: int = 64
    cap_st: int = 16
    cap_sa: int = 16
    max_per_bin: int = 16               # bin occupancy cap (XLA sweep / ST)
    max_tri_per_bin: int = 32
    max_tri_span: int = 4               # bins per axis a triangle may cover
    st_bruteforce: bool = False         # exact S x T candidate matrix
    cd_chunk: int = 0                   # 0 = no chunking of the CD sweep
    use_pallas_sweep: bool = False      # Pallas CD sweep kernel (TPU)
    pallas_win: int = 1024              # sweep slab window size
    prescriptions: Tuple[Any, ...] = ()  # prescriptions.FamilyPrescription
    family_changes: Tuple[Any, ...] = ()
    use_persistency: bool = False
    # owner wrench reduction: "scatter" (CPU / sharded) or "segment"
    # (sorted segment-sums over the owner-sorted table; wins on TPU)
    reduce_mode: str = "scatter"
    use_pallas_reduce: bool = False     # one-hot MXU segment sums (TPU)
    # fused Pallas force pass over the owner-sorted SS table (TPU; only
    # for models with a fused kernel, i.e. the built-in Hertz variants)
    use_fused_force: bool = False
    # spatially-decomposed SS refresh over the device mesh (x-slab domain
    # decomposition + all_to_all halo exchange, parallel/spatial.py);
    # requires an Engine mesh
    spatial_refresh: bool = False
    spatial_capx: int = 0               # exchange bucket rows (0 = auto)
    # skip the SS family post-filter when the family mask is all-true over
    # sphere-capable families (the common case; saves refresh gathers)
    ss_family_filter: bool = True
    # two-class polydisperse CD: spheres class as small/large by the traced
    # radius threshold params.cls_thr; each class gets its own grid so
    # ratio-3 GRC beds keep near-monodisperse bin occupancy (the role of
    # the reference's occupancy-aware decideBinSize + kT bin auto-tuner,
    # APIPrivate.cpp:489-566 / kT.cpp:43-98)
    cd_two_class: bool = False
    # two-class CD tuning: static capacity for the compacted large class
    # (0 = auto: ~n_spheres/3) and the per-coarse-bin entry scan width of
    # the S-L own-bin sweep (binning.find_pairs_cross_fine); both grow on
    # OVF_LCAP / OVF_XOCC
    cross_lcap: int = 0
    cross_mpb: int = 16
    # unique-other-owner fetch for the fused pass (0 = off): per-block
    # unique-list capacity. The refresh builds per-block unique other-owner
    # lists and local indices; the step gathers only unique kinematic
    # records and the kernel expands them with a one-hot matmul on the MXU
    # (cuts the dominant per-step gather by the contact multiplicity)
    uniq_cap: int = 0

    def __hash__(self):
        return hash(
            (
                self.voxel_size,
                self.integrator,
                id(self.force_model),
                self.cap_ss,
                self.cap_st,
                self.cap_sa,
                self.max_per_bin,
                self.max_tri_per_bin,
                self.max_tri_span,
                self.st_bruteforce,
                self.cd_chunk,
                self.use_pallas_sweep,
                self.pallas_win,
                tuple(id(p) for p in self.prescriptions),
                tuple(id(c) for c in self.family_changes),
                self.use_persistency,
                self.reduce_mode,
                self.use_pallas_reduce,
                self.use_fused_force,
                self.spatial_refresh,
                self.spatial_capx,
                self.ss_family_filter,
                self.cd_two_class,
                self.cross_lcap,
                self.cross_mpb,
                self.uniq_cap,
            )
        )
