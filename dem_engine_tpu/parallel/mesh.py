"""Multi-chip sharding of the solver state.

Design (SURVEY.md §5.8): the reference's only inter-device parallelism is
the kT/dT producer-consumer split across 2 GPUs with cudaMemcpy transports.
The TPU-native scaling axis is instead the DATA of one simulation: contact
tables and sphere (geometry) arrays are sharded across a 1D device mesh,
owner rigid-body state is replicated, and the per-owner wrench reduction
becomes a local partial-sum + `psum` over ICI — which XLA's SPMD partitioner
inserts automatically from the sharding constraints below (the
"annotate shardings, let XLA insert collectives" recipe).

With this layout the two dominant costs — per-contact force evaluation and
per-sphere candidate search — scale with device count. The CD refresh
additionally supports spatial domain decomposition (device-owned x-slabs
with an `all_to_all` halo exchange, `parallel/spatial.py`,
cfg.spatial_refresh) so its sort/sweep runs shard-locally instead of over
a globally sorted table.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..state import SimState


def make_mesh(n_devices: Optional[int] = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def _repl(mesh):
    return NamedSharding(mesh, P())


def _shardable(x, n) -> bool:
    return (
        hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] > 0
        and x.shape[0] % n == 0
    )


def state_shardings(state: SimState, mesh: Mesh, axis: str = "shard",
                    shard_owners: bool = True):
    """Build a SimState-shaped pytree of NamedShardings: contact tables,
    sphere arrays AND owner state sharded on their leading axis (when
    divisible), everything else replicated.

    With owners sharded, per-owner integration, kinematic packing and the
    wrench accumulators partition across devices; XLA all-gathers the
    small (N,16) kinematic record table for the per-contact gathers and
    reduce-scatters the wrench sums — ICI-bandwidth-cheap collectives
    compared to the per-contact work they unlock."""
    n = mesh.devices.size
    repl = _repl(mesh)

    def shard0(x):
        if _shardable(x, n):
            spec = P(axis, *([None] * (x.ndim - 1)))
            return NamedSharding(mesh, spec)
        return repl

    def shard_tbl(x):
        # field-major table arrays (statics/fstat/wcb: <=32 rows = fields,
        # columns = contacts) shard on the CONTACT axis so every 1-D
        # contact array and every field-major array use the same contact
        # partition; contact-major 2-D arrays (force (C,3)) shard on
        # axis 0 via shard0
        if hasattr(x, "ndim") and x.ndim == 2 and x.shape[0] <= 32:
            if x.shape[1] > 32 and x.shape[1] % n == 0:
                return NamedSharding(mesh, P(None, axis))
            return repl
        return shard0(x)

    def repl_fn(x):
        return repl

    own_fn = shard0 if shard_owners else repl_fn
    return SimState(
        owners=jax.tree_util.tree_map(own_fn, state.owners),
        spheres=jax.tree_util.tree_map(shard0, state.spheres),
        # triangles index-shard like spheres (divisible counts; small
        # meshes fall back to replication per-leaf): the ST sweep's
        # per-tri work — AABB bin enumeration, slab prefilter, slot scan
        # — then partitions over devices instead of being replicated
        # (VERDICT r4 #7). Analyticals stay replicated: a handful of
        # planes/cylinders is cheaper than any exchange.
        tris=jax.tree_util.tree_map(shard0, state.tris),
        anals=jax.tree_util.tree_map(repl_fn, state.anals),
        ss=jax.tree_util.tree_map(shard_tbl, state.ss),
        st=jax.tree_util.tree_map(shard_tbl, state.st),
        sa=jax.tree_util.tree_map(shard_tbl, state.sa),
        time=repl,
        step=repl,
        overflow=repl,
        max_vel=repl,
        lost_contacts=repl,
    )


def shard_state(state: SimState, mesh: Mesh, axis: str = "shard") -> SimState:
    """Place a SimState onto the mesh according to state_shardings."""
    sh = state_shardings(state, mesh, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, sh
    )
