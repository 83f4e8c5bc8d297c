"""Scan-based component profiling at bench scale (dispatch-noise-free):
each component is timed as lax.scan of REPS chained applications inside
ONE jit, so the ~15-22ms dispatch floor amortizes away.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dem_engine_tpu.utils import compile_cache

    compile_cache.enable()
    from __graft_entry__ import _build_case
    from dem_engine_tpu import solver
    from dem_engine_tpu.defines import F, I
    from dem_engine_tpu.models.prescriptions import PrescriptionTables
    from dem_engine_tpu.ops import binning, forces, history
    from dem_engine_tpu.solver import Engine

    cfg, state, params = _build_case(n_clumps=args.n, update_freq=25)
    eng = Engine(cfg)
    state = eng.refresh(state, params)
    state = eng._steps_fn(25, state, params)(state, params)
    state = eng.maybe_shrink(state)
    state = eng.refresh(state, params)
    cfg = eng.cfg
    print(f"n={args.n} S={state.spheres.n} ss={int(state.ss.count)} "
          f"sa={int(state.sa.count)} cap_ss={cfg.cap_ss} "
          f"cap_sa={cfg.cap_sa}", flush=True)
    R = args.reps

    def timed_scan(name, body):
        """body: state -> state (or pseudo); scanned R times in one jit."""
        @jax.jit
        def run(s, c):
            def f(carry, _):
                s2 = body(carry)
                return s2, None
            s2, _ = jax.lax.scan(f, s.replace(time=s.time + c * 1e-30),
                                 None, length=R)
            return s2.owners.vel.sum() * 1e-30 + c

        c = run(state, jnp.zeros(()))
        float(c)
        t0 = time.perf_counter()
        c = run(state, c + 1.0)
        v = float(c)
        dt = (time.perf_counter() - t0) / R
        print(f"{name:44s} {dt*1e3:9.2f} ms  (chk {v:.3g})", flush=True)
        return dt

    # full dynamics step
    timed_scan("dynamics_step", lambda s: solver.dynamics_step(s, params, cfg))

    # ss pass only
    def ss_only(s):
        krec = forces.pack_kinematics(s.owners)
        p = forces.contact_pass("ss", s.ss, s.owners, s.spheres, s.tris,
                                s.anals, params, s.time, cfg.voxel_size,
                                cfg.force_model, krec=krec)
        return s.replace(owners=s.owners.replace(
            vel=s.owners.vel + p["rec_a"][:1, :3].sum() * 1e-30))

    timed_scan("ss contact_pass only", ss_only)

    # sa pass only
    def sa_only(s):
        krec = forces.pack_kinematics(s.owners)
        p = forces.contact_pass("sa", s.sa, s.owners, s.spheres, s.tris,
                                s.anals, params, s.time, cfg.voxel_size,
                                cfg.force_model, krec=krec)
        return s.replace(owners=s.owners.replace(
            vel=s.owners.vel + p["rec_a"][:1, :3].sum() * 1e-30))

    timed_scan("sa contact_pass only", sa_only)

    # ss pass + segment reduce
    def ss_red(s):
        krec = forces.pack_kinematics(s.owners)
        p = forces.contact_pass("ss", s.ss, s.owners, s.spheres, s.tris,
                                s.anals, params, s.time, cfg.voxel_size,
                                cfg.force_model, krec=krec)
        f_acc, t_acc = forces.reduce_wrench_segment(s.owners.n, [p])
        return s.replace(owners=s.owners.replace(
            vel=s.owners.vel + f_acc * 1e-30))

    timed_scan("ss pass + segment reduce", ss_red)

    # integrator only
    def integ_only(s):
        from dem_engine_tpu.ops import integrator as integ

        z = jnp.zeros((s.owners.n, 3), F) + s.time * 1e-30
        tabp = PrescriptionTables(cfg.prescriptions, s.time)
        o = integ.integrate_owners(s.owners, z, z, params, tabp,
                                   cfg.voxel_size, cfg.integrator, s.time)
        return s.replace(owners=o, time=s.time + 1e-30)

    timed_scan("integrator only", integ_only)

    # refresh
    timed_scan("refresh_contacts (full)",
               lambda s: solver.refresh_contacts(s, params, cfg))

    # CD only
    def cd_only(s):
        pos = solver.sphere_world_pos(s.owners, s.spheres, cfg.voxel_size)
        margin, absv, raw = solver.sphere_margins(s.owners, s.spheres,
                                                  params)
        reach = s.spheres.radius + margin
        bs, nb = binning.build_grid(params.domain, reach.max())
        fam = s.owners.family[s.spheres.owner]
        from dem_engine_tpu.ops.pallas_sweep3 import find_pairs_ss_pallas3

        idA, idB, n_ss, occ, tab, wovf = find_pairs_ss_pallas3(
            pos, reach, s.spheres.owner, fam, params.family_mask, bs, nb,
            cfg.cap_ss, win=cfg.pallas_win, family_filter=False)
        return s.replace(owners=s.owners.replace(
            vel=s.owners.vel + n_ss.astype(F) * 1e-30))

    timed_scan("CD (find_pairs v3) only", cd_only)

    # carry_history only
    def carry_only(s):
        ss, _lost = history.carry_history(
            s.ss, s.ss.idA, s.ss.idB, s.ss.count,
            cfg.force_model.contact_wildcards, cfg.use_persistency)
        return s.replace(ss=ss, time=s.time + 1e-30)

    timed_scan("carry_history(ss) only", carry_only)

    # finalize only
    def fin_only(s):
        ss = forces.finalize_table("ss", s.ss, s.owners, s.spheres,
                                   s.tris, s.anals, params,
                                   cfg.force_model)
        return s.replace(ss=ss, time=s.time + 1e-30)

    timed_scan("finalize_table(ss) only", fin_only)

    # sa refresh block (brute-force overlap matrix)
    def sa_refresh(s):
        from dem_engine_tpu.ops import narrowphase, quat, voxel

        vs = cfg.voxel_size
        pos = solver.sphere_world_pos(s.owners, s.spheres, vs)
        margin, _, _ = solver.sphere_margins(s.owners, s.spheres, params)
        anals = s.anals
        own_b = anals.owner
        base_b = voxel.decode_f32(s.owners.vox[own_b],
                                  s.owners.loc[own_b], vs)
        obj_pos = base_b + quat.rotate(s.owners.quat[own_b], anals.relpos)
        obj_dir = quat.rotate(s.owners.quat[own_b], anals.direction)
        ovl, _, _ = narrowphase.sphere_analytical(
            pos[:, None, :], s.spheres.radius[:, None],
            anals.objtype[None, :], obj_pos[None, :, :],
            obj_dir[None, :, :], anals.size[None, :, :],
            anals.normal_sign[None, :])
        aA, aB, n_sa = binning.find_pairs_sa(
            ovl + margin[:, None], s.spheres.owner,
            s.owners.family[s.spheres.owner], anals.owner,
            s.owners.family[anals.owner], params.family_mask, cfg.cap_sa)
        return s.replace(owners=s.owners.replace(
            vel=s.owners.vel + n_sa.astype(F) * 1e-30))

    timed_scan("sa refresh block (bruteforce+compact)", sa_refresh)


if __name__ == "__main__":
    main()
