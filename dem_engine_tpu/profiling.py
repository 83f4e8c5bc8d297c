"""Per-stage named timers — the TPU answer to the reference's SolverTimers
(kT names kT.h:204-206, dT names dT.h:294-297, printed by ShowTimingStats,
APIPublic.cpp:2215).

The reference accumulates per-stage GPU timers around each kernel launch.
Here everything inside a step/refresh is ONE fused XLA program, so stage
costs cannot be read off the production dispatch; instead this module
measures them on demand by compiling *chained prefix programs* of the
refresh pipeline (stage N's cost = prefix(0..N) − prefix(0..N−1)) and
stage programs of the dynamics step, each timed with a scalar-readback
completion barrier (block_until_ready is unreliable on the tunneled TPU
backend) and outputs chained into inputs so the relay cannot cache reps.

Caveats (by design, documented to the user in the printout):
  * values include a per-dispatch floor (~15-22 ms on the tunneled TPU);
    stage splits are meaningful for programs ≥ tens of ms;
  * the kT prefix decomposition follows the single-grid sphere-sphere
    path; for two-class / spatially-decomposed configs only the total
    refresh is reported;
  * "Unpack / Send / Wait" timers from the reference's two-worker
    protocol have no analogue — kT/dT are fused into one program here.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp

from .defines import F, I
from .ops import binning, forces, history


def _timed(fn, state, params, reps=2):
    """Compile fn(state, params) -> state, sync, then time `reps` chained
    invocations; returns mean milliseconds."""
    g = jax.jit(fn)
    y = g(state, params)
    leaves = jax.tree_util.tree_leaves(y)
    sync = next((l for l in leaves if l.dtype != jnp.int32), None)
    if sync is not None:
        float(sync.sum())
    elif leaves:
        int(leaves[0].sum())
    t0 = time.perf_counter()
    for _ in range(reps):
        y = g(y, params)
        leaves = jax.tree_util.tree_leaves(y)
        sync = next((l for l in leaves if l.dtype != jnp.int32), leaves[0])
        float(sync.sum())
    return (time.perf_counter() - t0) / reps * 1e3


def _chain(state, dep):
    """Thread a O(1e-30) dependence on `dep` through the sphere offsets so
    chained reps can't be constant-folded or relay-cached."""
    sp = state.spheres
    return state.replace(
        spheres=sp.replace(relpos=sp.relpos + dep.astype(F) * 1e-30)
    )


def profile_stages(engine, state, params, reps=2) -> Dict[str, float]:
    """Measure per-stage wall times (ms) with the reference's timer names.
    Requires an initialized state whose contact tables have been finalized
    (any refresh/advance does that)."""
    from .solver import refresh_contacts, sphere_world_pos, sphere_margins
    from .ops.pallas_sweep3 import find_pairs_ss_pallas3

    cfg = engine.cfg
    wc_names = cfg.force_model.contact_wildcards
    out: Dict[str, float] = {}

    # ---------------- kT stages (refresh pipeline prefixes) ----------------
    spatial = cfg.spatial_refresh and engine.mesh is not None
    single_grid = (not cfg.cd_two_class and not spatial
                   and state.spheres.n > 0 and cfg.cap_ss > 0)

    def common(st, pp):
        pos = sphere_world_pos(st.owners, st.spheres, cfg.voxel_size)
        mg, _, _ = sphere_margins(st.owners, st.spheres, pp)
        rch = st.spheres.radius + mg
        b, n = binning.build_grid(pp.domain, rch.max(), pp.bin_factor)
        fam = st.owners.family[st.spheres.owner]
        return pos, rch, b, n, fam

    def cd(st, pp):
        pos, rch, b, n, fam = common(st, pp)
        if cfg.use_pallas_sweep:
            ia, ib, nn, _, _, _ = find_pairs_ss_pallas3(
                pos, rch, st.spheres.owner, fam, pp.family_mask, b, n,
                cfg.cap_ss, win=cfg.pallas_win,
                family_filter=cfg.ss_family_filter)
        else:
            ia, ib, nn, _, _ = binning.find_pairs_ss(
                pos, rch, st.spheres.owner, fam, pp.family_mask, b, n,
                cfg.cap_ss, cfg.max_per_bin, cfg.cd_chunk)
        return ia, ib, nn

    if single_grid:
        def p_discretize(st, pp):
            pos, rch, b, n, fam = common(st, pp)
            tab = binning.build_sphere_table(
                pos, rch, st.spheres.owner, fam, b, n,
                max(st.spheres.n, 1))
            return _chain(st, tab.sorted_bin.sum() + tab.rec.sum())

        def p_pairs(st, pp):
            ia, ib, nn = cd(st, pp)
            return _chain(st, ia.sum() + ib.sum() + nn)

        def p_hist(st, pp):
            ia, ib, nn = cd(st, pp)
            ss2, _ = history.carry_history(
                st.ss, ia, ib, jnp.minimum(nn, cfg.cap_ss), wc_names,
                cfg.use_persistency)
            return st.replace(ss=ss2)

        def p_fin(st, pp):
            ia, ib, nn = cd(st, pp)
            ss2, _ = history.carry_history(
                st.ss, ia, ib, jnp.minimum(nn, cfg.cap_ss), wc_names,
                cfg.use_persistency)
            ss2 = forces.finalize_table(
                "ss", ss2, st.owners, st.spheres, st.tris, st.anals,
                pp, cfg.force_model, slim=cfg.use_fused_force,
                uniq_cap=cfg.uniq_cap)
            return st.replace(
                ss=ss2.replace(count=jnp.minimum(ss2.count, cfg.cap_ss)))

        t0 = _timed(p_discretize, state, params, reps)
        t1 = _timed(p_pairs, state, params, reps)
        t2 = _timed(p_hist, state, params, reps)
        t3 = _timed(p_fin, state, params, reps)
        out["Discretize domain"] = t0
        out["Find contact pairs"] = max(t1 - t0, 0.0)
        out["Build history map"] = max(t2 - t1, 0.0)
        out["Finalize tables (TPU)"] = max(t3 - t2, 0.0)
    else:
        t3 = 0.0

    def p_full(st, pp):
        return refresh_contacts(st, pp, cfg, mesh=engine.mesh)

    t_full = _timed(p_full, state, params, reps)
    out["kT total (refresh)"] = t_full
    if single_grid:
        out["Other kT (ST/SA, margins, error-outs)"] = max(t_full - t3, 0.0)

    # ---------------- dT stages --------------------------------------------
    model = cfg.force_model
    fused_ss = (cfg.use_fused_force and model.fused_variant is not None
                and state.spheres.n > 0 and state.ss.cap > 0)

    def forces_only(st, pp):
        krec = forces.pack_kinematics(st.owners)
        dep = jnp.zeros((), F)
        passes = []
        for kind, table, n_geo in (("ss", st.ss, st.spheres.n),
                                   ("st", st.st, st.tris.n),
                                   ("sa", st.sa, st.anals.n)):
            if n_geo == 0 or table.cap == 0 or st.spheres.n == 0:
                continue
            if kind == "ss" and fused_ss:
                from .ops.pallas_force import fused_step_ss

                f_a, t_a, _ = fused_step_ss(
                    table, st.owners, pp, cfg.voxel_size, model,
                    forces.pack_kinematics(st.owners, world_omg=True))
                dep = dep + f_a.sum() + t_a.sum()
                continue
            p = forces.contact_pass(
                kind, table, st.owners, st.spheres, st.tris, st.anals,
                pp, st.time, cfg.voxel_size, model, krec=krec)
            passes.append(p)
            dep = dep + p["rec_a"].sum()
        return passes, dep

    def p_force(st, pp):
        _, dep = forces_only(st, pp)
        return _chain(st, dep)

    def p_reduce(st, pp):
        passes, dep = forces_only(st, pp)
        if passes:
            if cfg.reduce_mode == "segment":
                f_acc, t_acc = forces.reduce_wrench_segment(
                    st.owners.n, passes, use_pallas=cfg.use_pallas_reduce)
            else:
                f_acc, t_acc = forces.reduce_wrench(st.owners.n, passes)
            dep = dep + f_acc.sum() + t_acc.sum()
        return _chain(st, dep)

    from .solver import dynamics_step

    def p_step(st, pp):
        return dynamics_step(st, pp, cfg)

    tf = _timed(p_force, state, params, reps)
    tr = _timed(p_reduce, state, params, reps)
    ts = _timed(p_step, state, params, reps)
    out["Clear force array"] = 0.0  # fused into the XLA program
    out["Calculate contact forces"
        + (" (+reduction, fused kernel)" if fused_ss else "")] = tf
    out["Optional force reduction"] = max(tr - tf, 0.0)
    out["Integration"] = max(ts - tr, 0.0)
    out["dT total (one step)"] = ts
    return out


def format_stages(stages: Dict[str, float]) -> str:
    w = max(len(k) for k in stages)
    lines = ["[stage timers] measured on demand via prefix programs "
             "(includes a per-dispatch floor; reference timer names, "
             "kT.h:204-206 / dT.h:294-297; Unpack/Send/Wait are n/a — "
             "kT+dT are one fused program here)"]
    for k, v in stages.items():
        lines.append(f"  {k:<{w}} : {v:10.3f} ms")
    return "\n".join(lines)
