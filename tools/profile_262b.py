"""Drill into contact_pass / reduce costs at 262k (scan-based)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from dem_engine_tpu.utils import compile_cache

    compile_cache.enable()
    from __graft_entry__ import _build_case
    from dem_engine_tpu import solver
    from dem_engine_tpu.defines import F, I
    from dem_engine_tpu.ops import forces, narrowphase, quat
    from dem_engine_tpu.solver import Engine

    cfg, state, params = _build_case(n_clumps=262144, update_freq=25)
    eng = Engine(cfg)
    state = eng.refresh(state, params)
    state = eng._steps_fn(25, state, params)(state, params)
    state = eng.maybe_shrink(state)
    state = eng.refresh(state, params)
    cfg = eng.cfg
    cap = cfg.cap_ss
    print(f"cap_ss={cap} count={int(state.ss.count)}", flush=True)
    R = 10

    def timed(name, body):
        @jax.jit
        def run(s, c):
            def f(carry, _):
                return body(carry), None
            s2, _ = jax.lax.scan(f, s.replace(time=s.time + c * 1e-30),
                                 None, length=R)
            return s2.owners.vel.sum() * 1e-30 + c

        c = run(state, jnp.zeros(()))
        float(c)
        t0 = time.perf_counter()
        c = run(state, c + 1.0)
        float(c)
        dt = (time.perf_counter() - t0) / R
        print(f"{name:46s} {dt*1e3:9.2f} ms", flush=True)

    def wire(s, x):
        return s.replace(owners=s.owners.replace(
            vel=s.owners.vel + x.reshape(-1)[:1].sum() * 1e-30))

    # 1. the two kinematic gathers alone
    def g2(s):
        krec = forces.pack_kinematics(s.owners)
        live = s.ss.idA >= 0
        a = krec[jnp.where(live, s.ss.own_a, 0)]
        b = krec[jnp.where(live, s.ss.own_b, 0)]
        return wire(s, a + b)

    timed("pack + A/B kinematic gathers", g2)

    # 2. + unpack + quat rotate of relpos (geometry prologue)
    def g3(s):
        krec = forces.pack_kinematics(s.owners)
        live = s.ss.idA >= 0
        A = forces._unpack_kin(krec[jnp.where(live, s.ss.own_a, 0)])
        B = forces._unpack_kin(krec[jnp.where(live, s.ss.own_b, 0)])
        sr = s.ss.statics
        rel_a = quat.rotate(A["quat"], sr[2:5].T)
        from dem_engine_tpu.ops.voxel import rel_pos
        d = rel_pos(B["vox"], B["loc"], A["vox"], A["loc"], cfg.voxel_size)
        pos_b = d + quat.rotate(B["quat"], sr[8:11].T)
        ovl, b2a, cp = narrowphase.sphere_sphere(
            rel_a, sr[:, 5], pos_b, sr[:, 11])
        return wire(s, ovl)

    timed("gathers + narrow phase", g3)

    # 3. full ss pass, trivial force model
    from dem_engine_tpu.models.force_model import ForceModel

    def triv(ctx):
        f = ctx.overlap[:, None] * ctx.b2a
        return f, jnp.zeros_like(f), {}

    trivial = ForceModel(name="trivial", fn=triv, contact_wildcards=(),
                         per_material_props=(), pairwise_props=())

    def pass_triv(s):
        p = forces.contact_pass("ss", s.ss, s.owners, s.spheres, s.tris,
                                s.anals, params, s.time, cfg.voxel_size,
                                trivial)
        return wire(s, p["rec_a"])

    timed("ss pass w/ trivial force model", pass_triv)

    # 4. full ss pass, hertz
    def pass_h(s):
        p = forces.contact_pass("ss", s.ss, s.owners, s.spheres, s.tris,
                                s.anals, params, s.time, cfg.voxel_size,
                                cfg.force_model)
        return wire(s, p["rec_a"])

    timed("ss pass w/ hertz (ref)", pass_h)

    # 5. permute alone
    def perm(s):
        rec_b = s.ss.force + s.time * 1e-30  # stand-in (cap,3)
        rb = rec_b[s.ss.perm_b]
        return wire(s, rb)

    timed("perm_b permute (cap x3w)", perm)

    # 6. sorted segment sums alone
    def seg(s):
        rec = jnp.concatenate([s.ss.force, s.ss.torque], axis=1) \
            + s.time * 1e-30
        ids_a = jnp.where(s.ss.own_a >= 0, s.ss.own_a, s.owners.n)
        acc = jax.ops.segment_sum(rec, ids_a, num_segments=s.owners.n + 1,
                                  indices_are_sorted=True)
        return wire(s, acc)

    timed("segment_sum A-side (cap x6w)", seg)

    # 7. hertz math alone on precomputed (no gathers): feed ctx from
    #    contiguous fake arrays
    def math_only(s):
        z3 = s.ss.force + s.time * 1e-30
        n = z3 / jnp.maximum(jnp.linalg.norm(z3, axis=1, keepdims=True),
                             1e-6)
        ovl = s.ss.statics[5] * 0.01
        vel = z3
        # normal spring-damper + tangential-ish math, ~50 flops/slot
        E = 1e9
        sn = 2 * E * jnp.sqrt(jnp.maximum(ovl, 0) * 0.005)
        proj = jnp.sum(vel * n, axis=1)
        ft = sn[:, None] * n + proj[:, None] * n * 0.1
        return wire(s, ft)

    timed("elementwise math strawman (capx~20ops)", math_only)


if __name__ == "__main__":
    main()
