"""Fused Pallas force pass over the owner-sorted sphere-sphere table.

The reference evaluates geometry + the user force model + history update in
ONE kernel per contact (calculateContactForces, DEMCalcForceKernels.cu:44-267)
feeding a cached-index reduce (DEMCubForceCollection.cu:19-170). Round 2's
XLA step instead round-tripped the contact table through HBM between the
narrow phase, the friction/wildcard chain, the table update and the wrench
emission.

Round-3 design: the step is TWO passes of the same kernel, one per owner
side, and the per-step B-side permutation (measured 72 ms at 3.9M contacts
— 55% of the round-2 fused step) is GONE:

  * pass A runs over the own_a-sorted layout (fstat_a/wildcard dict),
    pass B over the refresh-built own_b-sorted layout (fstat_b/wcb, i.e.
    the perm_b row order). Each pass reduces ITS side's wrench in-kernel.
  * grid = blocks of OB consecutive owners of the reducing side. Each
    block's contact rows are the contiguous range [cstart, cend) (one XLA
    searchsorted), walked in CH-wide chunks DMA'd from HBM.
  * the reducing side's kinematic gather AND its wrench reduction are the
    SAME one-hot matmul: E[o, j] = (own[j] == block_lo + o), so
    kin = krec_block @ E and acc += rec @ E^T, both on the MXU. The krec
    block is a statically-mapped VMEM input — no window can ever spill,
    for any owner count. The OTHER side's kinematics are one XLA row
    gather, streamed through VMEM.
  * per-contact constants stream as ONE slim 16-row record (state.FSTAT_W:
    geometry + premixed E_eff/G_eff/CoR/mu/Crr — half of round 2's 32-row
    statics + 8-row premix traffic).
  * both passes read their own layout's OLD wildcards and write their own
    layout's NEW wildcards. The updates are bitwise-identical functions of
    identical values (the one-hot bf16x3 matmul is an exact row select —
    see _split3), so the two copies never diverge between refreshes.
  * chunks shared between adjacent owner blocks are visited twice with
    complementary one-hot masks; wildcard outputs for a shared chunk are
    read back and merged so each row's final value comes from the block
    that owns it (the grid is sequential, so this is race-free).

Physics parity: the math mirrors models/hertz.py line for line (itself the
re-derivation of FullHertzianForceModel.cu / FrictionlessHertzianForceModel
.cu); narrow phase mirrors ops/narrowphase.sphere_sphere
(checkSpheresOverlap, DEMHelperKernels.cuh:293).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..defines import F, I, TINY_FLOAT

import os

BF16X3 = os.environ.get("DEM_BF16X3", "1") == "1"

# contact chunk width / owners per grid block (swept on hardware:
# OB 512 -> 41.5 ms, 256 -> 18.9, 128 -> 17.7 per pass at 3.93M
# contacts — the one-hot matmul cost is linear in OB, boundary
# revisits grow only as n_blocks). Env-overridable for A/B sweeps
# (tools/r5_step_budget.py).
CH = int(os.environ.get("DEM_CH", "512"))
OB = int(os.environ.get("DEM_OB", "128"))

_PI_SQ = 9.869604401089358
_TWO_SQRT_5_6 = 2.0 * (5.0 / 6.0) ** 0.5
_PI = 3.14159265358979323846

# kinematic record rows (matches forces.KREC_W layout)
# [0:3] vox  [3:6] loc  [6:10] quat  [10:13] vel  [13:16] omg
# (omg is WORLD-frame here — forces.pack_kinematics(world_omg=True);
# contact-point velocities are then single cross products)

# fstat rows (state.FSTAT_W; forces.finalize_table):
# [0] own_key (-1 dead)  [1] radA  [2:5] relposA  [5:8] relposB
# [8] radB  [9] m_eff (premixed)  [10] t_col_eff (premixed Schwartz
# collision time; 0 = overdamped, `past` always true)
# [11] E_eff  [12] G_eff  [13] beta (premixed Hertz damping ratio)
# [14] mu  [15] Crr

# wildcard rows (sorted contact_wildcards of the full Hertz model)
# [0] delta_tan_x [1] delta_tan_y [2] delta_tan_z [3] delta_time


# ---------------------------------------------------------------------------
# vector-slab helpers: 3-vectors are (3, CH) arrays, scalars (1, CH) rows.
# Elementwise vec3 ops touch the same vreg count as a single row op (ceil(3/8)
# sublanes), so packing x/y/z into one op triples the VPU math throughput
# vs the round-2 row-tuple form (measured 17.5 -> see BENCH_NOTES r3).
# Cross products use sublane rolls built from concat slices; dot products
# are sublane-axis reductions.
# ---------------------------------------------------------------------------


def _v3(m, i):
    return m[i:i + 3, :]


def _q4(m, i):
    """quat as (w row, xyz slab)."""
    return (m[i:i + 1, :], m[i + 1:i + 4, :])


def _add3(a, b):
    return a + b


def _sub3(a, b):
    return a - b


def _neg3(a):
    return -a


def _scale3(a, s):
    return a * s          # s is (1, ch): sublane-broadcast multiply


def _dot3(a, b):
    return jnp.sum(a * b, axis=0, keepdims=True)


def _rollup(a):
    """rows (0,1,2) -> (1,2,0)"""
    return jnp.concatenate([a[1:3], a[0:1]], axis=0)


def _rolldn(a):
    """rows (0,1,2) -> (2,0,1)"""
    return jnp.concatenate([a[2:3], a[0:2]], axis=0)


def _cross3(a, b):
    return _rollup(a) * _rolldn(b) - _rolldn(a) * _rollup(b)


def _where3(c, a, b):
    if not isinstance(b, jnp.ndarray):
        b = jnp.zeros_like(a) + b
    return jnp.where(c, a, b)


def _rot(q, v):
    """quat.rotate on slabs: body -> global (15-multiply form)."""
    qw, qv = q
    t = 2.0 * _cross3(qv, v)
    return v + qw * t + _cross3(qv, t)


def _rot_inv(q, v):
    return _rot((q[0], -q[1]), v)


# ---------------------------------------------------------------------------
# the fused Hertz math on field-major rows (parity: models/hertz.py)
# ---------------------------------------------------------------------------


_NOMATH = os.environ.get("DEM_FORCE_NOMATH", "0") == "1"


def _hertz_rows(s, w, Ak, Bk, h, voxel_size, with_friction, side_b,
                extras=False):
    if _NOMATH:  # perf floor probe: DMA + matmuls only (tools/sweep_var)
        rec = jnp.concatenate([s[0:8, :] + Ak[0:8, :] + Bk[0:8, :]], axis=0)
        wc_new = (w + h) if with_friction else None
        live = s[0:1, :] >= 0.0
        if extras:
            return rec, wc_new, live, jnp.concatenate([Ak, Bk], 0)[:16]
        return rec, wc_new, live
    return _hertz_rows_real(s, w, Ak, Bk, h, voxel_size, with_friction,
                            side_b, extras)


def _hertz_rows_real(s, w, Ak, Bk, h, voxel_size, with_friction, side_b,
                     extras=False):
    """s (FSTAT_W, CH) slim statics, w (8, CH) wildcards (or None),
    Ak/Bk (16, CH) kinematics. Returns (rec (8, CH) wrench record of the
    reducing side, wc_new (8, CH) or None, live (1, CH) bool[, ext (16,CH)
    per-contact force/torque/cpoint when extras])."""
    avox, aloc = _v3(Ak, 0), _v3(Ak, 3)
    aq, avel, aomg = _q4(Ak, 6), _v3(Ak, 10), _v3(Ak, 13)
    bvox, bloc = _v3(Bk, 0), _v3(Bk, 3)
    bq, bvel, bomg = _q4(Bk, 6), _v3(Bk, 10), _v3(Bk, 13)
    radA, relA = s[1:2, :], _v3(s, 2)
    relB, radB = _v3(s, 5), s[8:9, :]
    # statics-derived constants premixed at refresh (forces.finalize_
    # table): recomputing them here cost ~8 transcendental slab ops per
    # chunk per pass (the step runs K times per refresh, twice per step)
    m_eff = s[9:10, :]
    t_col_eff = s[10:11, :]
    live = s[0:1, :] >= 0.0

    # B position relative to owner A CoM (exact voxel-int difference)
    d = (bvox - avox) * voxel_size + (bloc - aloc)
    rel_a = _rot(aq, relA)
    pos_b = _add3(d, _rot(bq, relB))

    # narrow phase (ops/narrowphase.sphere_sphere)
    dd = _sub3(rel_a, pos_b)
    dist = jnp.sqrt(_dot3(dd, dd))
    safe = jnp.maximum(dist, TINY_FLOAT)
    b2a = _scale3(dd, 1.0 / safe)
    overlap = radA + radB - dist
    cp = _add3(pos_b, _scale3(b2a, radB - overlap * 0.5))
    cp_b = _sub3(cp, d)
    in_contact = overlap > 0.0
    ovl = jnp.maximum(overlap, 0.0)

    # premixed effective moduli + damping ratio (forces.finalize_table)
    E_eff, G_eff = s[11:12, :], s[12:13, :]
    beta = s[13:14, :]

    # contact-point velocities (ContactContext.rot_vel_cp_global): omg
    # rides WORLD-frame in krec, so rot(q, cross(omg_b, rot_inv(q, cp)))
    # collapses to cross(omg_w, cp) — same vector, 2 rotations fewer
    # per side (rotations preserve cross products)
    va = _cross3(aomg, cp)
    vb = _cross3(bomg, cp_b)
    vel_b2a = _sub3(_add3(avel, va), _add3(bvel, vb))
    proj = _dot3(vel_b2a, b2a)
    vrel_tan = _sub3(vel_b2a, _scale3(b2a, proj))

    r_eff = radA * radB / jnp.maximum(radA + radB, TINY_FLOAT)
    sqrt_Rd = jnp.sqrt(ovl * r_eff)
    Sn = 2.0 * E_eff * sqrt_Rd
    k_n = (2.0 / 3.0) * Sn
    gamma_n = _TWO_SQRT_5_6 * beta * jnp.sqrt(Sn * m_eff)
    f_n = k_n * ovl + gamma_n * proj
    force = _scale3(b2a, f_n)
    torque_only = jnp.zeros_like(force)
    wc_new = None

    if with_friction:
        mu, Crr = s[14:15, :], s[15:16, :]
        dtan = w[0:3, :]
        dtan = _add3(dtan, _scale3(vrel_tan, h))
        disp_proj = _dot3(dtan, b2a)
        dtan = _sub3(dtan, _scale3(b2a, disp_proj))
        dtime = w[3:4, :] + h

        # rolling resistance engages past the Schwartz collision time
        # (parity hertz.py:80-108); t_col_eff premixed at refresh with
        # the overdamped case folded in as 0 (dtime >= h > 0)
        past = dtime > t_col_eff
        v_rot = _sub3(vb, va)
        v_rot_mag = jnp.sqrt(_dot3(v_rot, v_rot))
        f_mag = jnp.sqrt(_dot3(force, force))
        roll_on = (Crr > 0.0) & past & (v_rot_mag > TINY_FLOAT)
        torque_only = _where3(
            roll_on,
            _scale3(v_rot, Crr * f_mag
                    / jnp.maximum(v_rot_mag, TINY_FLOAT)),
            0.0,
        )

        # tangential force with Coulomb clamp (hertz.py:110-129)
        kt = 8.0 * G_eff * sqrt_Rd
        gt = -_TWO_SQRT_5_6 * beta * jnp.sqrt(m_eff * kt)
        tf = _sub3(_scale3(dtan, -kt), _scale3(vrel_tan, gt))
        ft = jnp.sqrt(_dot3(tf, tf))
        ft_max = f_mag * mu
        clamp = (ft > ft_max) & (ft > TINY_FLOAT)
        scl = jnp.where(clamp, ft_max / jnp.maximum(ft, TINY_FLOAT), 1.0)
        tf = _where3(ft > TINY_FLOAT, _scale3(tf, scl), 0.0)
        dtan = _where3(
            clamp,
            _scale3(_add3(tf, _scale3(vrel_tan, gt)),
                    -1.0 / jnp.where(kt > TINY_FLOAT, kt, 1.0)),
            dtan,
        )
        force = _add3(force, _where3(mu > 0.0, tf, 0.0))

        keep = in_contact
        # slim 4-row wildcard record (delta_tan xyz + delta_time)
        wc_new = jnp.concatenate(
            [
                jnp.where(keep, dtan, 0.0),
                jnp.where(keep, dtime, 0.0),
            ],
            axis=0,
        )

    force = _where3(in_contact & live, force, 0.0)
    torque_only = _where3(in_contact & live, torque_only, 0.0)
    f_tot = _add3(force, torque_only)
    zero = jnp.zeros_like(f_n)
    # body-frame torque: cross(rot_inv(cp), rot_inv(f)) == rot_inv(
    # cross(cp, f)) — one rotation instead of two
    if side_b:
        tq_b = _rot_inv(bq, _cross3(cp_b, _neg3(f_tot)))
        rec = jnp.concatenate(
            [-force, jnp.where(live, tq_b, 0.0), zero, zero], axis=0)
    else:
        tq_a = _rot_inv(aq, _cross3(cp, f_tot))
        rec = jnp.concatenate(
            [force, jnp.where(live, tq_a, 0.0), zero, zero], axis=0)
    if extras:
        # cpoint rides for every LIVE row (margin pairs included) to
        # match the XLA contact_pass / reference generateContactInfo;
        # force/torque are already masked by in_contact & live above
        ext = jnp.concatenate(
            [force,
             torque_only,
             jnp.where(live, cp, 0.0)]
            + [zero] * 7,
            axis=0,
        )
        return rec, wc_new, live, ext
    return rec, wc_new, live


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _make_kernel(ch, ob, voxel_size, with_friction, side_b, extras=False,
                 ub=0):
    """ub > 0 = unique-other-owner mode: instead of streaming pre-gathered
    (16, ch) other-side records, the block's distinct other owners arrive
    as a (ub, 16) VMEM slab and each chunk reconstructs its per-contact
    records with a second one-hot matmul from the streamed local unique
    index (ContactTable.uidx)."""
    def kernel(cr_ref, krec_ref, *rest):
        it = iter(rest)
        uslab_ref = next(it) if ub else None
        fstat_hbm = next(it)
        wc_hbm = next(it) if with_friction else None
        ot_hbm = next(it)  # (16, capp) records, or (1, capp) uidx when ub
        hs_ref = next(it)
        acc_ref = next(it)
        wcout_hbm = next(it) if with_friction else None
        ext_hbm = next(it) if extras else None
        fstat_s = next(it)
        wc_s = next(it) if with_friction else None
        ot_s = next(it)  # (2, 16, ch) records or (2, 1, ch) uidx
        wcob_s = next(it) if with_friction else None
        wcrb_s = next(it) if with_friction else None
        ext_s = next(it) if extras else None
        exrb_s = next(it) if extras else None
        sems = next(it)

        i = pl.program_id(0)
        cstart = cr_ref[2 * i]
        cend = cr_ref[2 * i + 1]
        c0 = cstart // ch
        c1 = (cend + ch - 1) // ch
        nk = c1 - c0
        block_lo = i * ob
        h = hs_ref[0, 0]

        # bf16x3 one-hot matmuls: Mosaic lowers only DEFAULT (bf16) and
        # HIGHEST (6-pass fp32). DEFAULT destroys the voxel-int rows of
        # the kinematic records, HIGHEST pays 2x the needed passes. The
        # telescoping 3-way bf16 split is f32-exact (hi/mid/lo carry
        # disjoint mantissa ranges and their sum IS the f32), and a
        # one-hot select of each part stays exact, so 3 DEFAULT passes
        # reconstruct the f32 select bit-for-bit.
        def _split3(x):
            hi = x.astype(jnp.bfloat16)
            r1 = x - hi.astype(F)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(F)).astype(jnp.bfloat16)
            return hi, mid, lo

        def _mm3(parts, e, dims):
            out = None
            for p in parts:
                d = jax.lax.dot_general(
                    p, e, dims, preferred_element_type=jnp.float32)
                out = d if out is None else out + d
            return out

        krec_parts = (
            _split3(krec_ref[...]) if BF16X3 else None
        )  # loop-invariant (ob, 16) x3 — owner records ride row-major
        # (the same (N,16) array feeds the i16 row gathers; dim-0
        # contraction below saves the per-step (N,16)->(16,N) transpose)
        uslab_parts = (
            _split3(uslab_ref[...]) if (ub and BF16X3) else None
        )  # loop-invariant (ub, 16) x3 unique other-owner records

        # double-buffered input streams: chunk k lands in slot k%2; the
        # k+1 DMAs start before the k waits so the HBM streams ride behind
        # the compute instead of serializing with it
        def in_cps(k, slot):
            off = pl.multiple_of((c0 + k) * ch, ch)
            cps = [
                pltpu.make_async_copy(
                    fstat_hbm.at[:, pl.ds(off, ch)], fstat_s.at[slot],
                    sems.at[slot, 0]),
                pltpu.make_async_copy(
                    ot_hbm.at[:, pl.ds(off, ch)], ot_s.at[slot],
                    sems.at[slot, 1]),
            ]
            if with_friction:
                cps.append(pltpu.make_async_copy(
                    wc_hbm.at[:, pl.ds(off, ch)], wc_s.at[slot],
                    sems.at[slot, 2]))
            return cps

        @pl.when(nk > 0)
        def _():
            for cp in in_cps(0, 0):
                cp.start()

        def body(k, acc):
            c = c0 + k
            slot = k % 2
            off = pl.multiple_of(c * ch, ch)

            @pl.when(k + 1 < nk)
            def _():
                for cp in in_cps(k + 1, 1 - slot):
                    cp.start()

            # shared-boundary merge: the first chunk of this block may also
            # be the last chunk of the previous block, which already wrote
            # it (with garbage for OUR rows — its one-hot kinematics window
            # does not cover them; the previous grid step's epilogue waited
            # the write). Read its output back and keep its values for the
            # rows it owns.
            merge = (k == 0) & (cstart % ch != 0)

            if with_friction:
                @pl.when(merge)
                def _():
                    rb = pltpu.make_async_copy(
                        wcout_hbm.at[:, pl.ds(off, ch)], wcrb_s,
                        sems.at[0, 5])
                    rb.start()
                    rb.wait()
            if extras:
                # extras needs the same shared-boundary merge: the
                # previous block already wrote this chunk (zeros for OUR
                # rows), and we must not zero ITS rows back
                @pl.when(merge)
                def _():
                    rb = pltpu.make_async_copy(
                        ext_hbm.at[:, pl.ds(off, ch)], exrb_s,
                        sems.at[1, 5])
                    rb.start()
                    rb.wait()

            for cp in in_cps(k, slot):
                cp.wait()

            s = fstat_s[slot]
            own = s[0:1, :].astype(jnp.int32)
            rel = own - block_lo
            inblk = (s[0:1, :] >= 0.0) & (rel >= 0) & (rel < ob)
            E = ((jax.lax.broadcasted_iota(jnp.int32, (ob, ch), 0) == rel)
                 & inblk).astype(jnp.bfloat16 if BF16X3 else F)
            if BF16X3:
                kin = _mm3(krec_parts, E,
                           (((0,), (0,)), ((), ())))      # (16, ch)
            else:
                kin = jax.lax.dot_general(
                    krec_ref[...], E, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            if ub:
                # reconstruct the other side's records from the block's
                # unique slab: a second one-hot matmul on the MXU (same
                # exactness argument as the krec fetch). Rows outside this
                # block carry another block's uidx — their E2 column is
                # zeroed (their outputs are discarded by inblk/mine anyway,
                # this just keeps the garbage finite).
                ui = ot_s[slot][0:1, :].astype(jnp.int32)
                E2 = ((jax.lax.broadcasted_iota(jnp.int32, (ub, ch), 0)
                       == ui) & inblk).astype(
                          jnp.bfloat16 if BF16X3 else F)
                if BF16X3:
                    ot = _mm3(uslab_parts, E2, (((0,), (0,)), ((), ())))
                else:
                    ot = jax.lax.dot_general(
                        uslab_ref[...], E2, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
            else:
                ot = ot_s[slot]
            Ak, Bk = (ot, kin) if side_b else (kin, ot)

            out = _hertz_rows(
                s, wc_s[slot] if with_friction else None,
                Ak, Bk, h, voxel_size, with_friction, side_b,
                extras=extras,
            )
            rec, wc_new, live = out[0], out[1], out[2]

            # reduce through the same one-hot (select first: NaNs from
            # out-of-block rows must not ride a 0-weight product)
            rec = jnp.where(inblk, rec, 0.0)
            if BF16X3:
                acc = acc + _mm3(_split3(rec), E,
                                 (((1,), (1,)), ((), ())))  # (8, ob)
            else:
                acc = acc + jax.lax.dot_general(
                    rec, E, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            # per-row outputs; rows before cstart keep the previous
            # block's values (they are his), rows after cend get fixed by
            # the next block's merge. Writes are double-buffered too:
            # before reusing a slot, wait its k-2 write out.
            if with_friction or extras:
                rowid = off + jax.lax.broadcasted_iota(
                    jnp.int32, (1, ch), 1)
                mine = rowid >= cstart
            if with_friction:
                @pl.when(k >= 2)
                def _():
                    _wc_write(k - 2).wait()

                wcob_s[slot] = jnp.where(mine, wc_new, wcrb_s[...])
                _wc_write(k).start()
            if extras:
                ext_s[...] = jnp.where(
                    mine, jnp.where(inblk, out[3], 0.0), exrb_s[...])
                wcp = pltpu.make_async_copy(
                    ext_s, ext_hbm.at[:, pl.ds(off, ch)], sems.at[0, 4])
                wcp.start()
                wcp.wait()
            return acc

        def _wc_write(k):
            off = pl.multiple_of((c0 + k) * ch, ch)
            slot = k % 2
            return pltpu.make_async_copy(
                wcob_s.at[slot], wcout_hbm.at[:, pl.ds(off, ch)],
                sems.at[slot, 3])

        acc_ref[...] = jax.lax.fori_loop(
            0, nk, body, jnp.zeros((8, ob), F)
        )

        # epilogue: the last one or two wildcard writes are still in
        # flight; the next grid step's merge readback (and the caller)
        # must see them landed
        if with_friction:
            @pl.when(nk >= 2)
            def _():
                _wc_write(nk - 2).wait()

            @pl.when(nk >= 1)
            def _():
                _wc_write(nk - 1).wait()

    return kernel


def fused_hertz_pass(fstat, wcT, krecT, otT, cr, n_blocks, h,
                     voxel_size, with_friction, side_b, interpret=False,
                     ch=None, ob=None, extras=False, uslab=None, ub=0):
    """Run one fused force pass over one owner-sorted layout. All array
    layouts are field-major:

      fstat (FSTAT_W, capp) slim statics of this layout,
      wcT (4, capp) this layout's wildcards or None,
      krecT (n_blocks*ob, 16) owner kinematic records (one-hot side;
          row-major — shared layout with the i16 row gathers),
      otT (16, capp) other-side kinematics (pre-gathered); with ub > 0
          instead the (1, capp) unique-index stream (ContactTable.uidx)
          while uslab (n_blocks*ub, 16) carries each block's unique
          other-owner records,
      cr (2*n_blocks,) i32 per-block [cstart, cend) contact ranges,
      h: f32[] traced step size.

    Returns (accT (8, n_blocks*ob) reduced owner wrenches of this side,
             wc_outT (4, capp) or None[, extT (16, capp) per-contact
             force/torque_only/cpoint rows when extras]).
    """
    ch = ch or CH
    ob = ob or OB
    capp = fstat.shape[1]
    assert capp % ch == 0, capp
    hs = jnp.reshape(h.astype(F), (1, 1))

    in_specs = [
        pl.BlockSpec((ob, 16), lambda i, b: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [krecT]
    if ub:
        in_specs.append(pl.BlockSpec((ub, 16), lambda i, b: (i, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(uslab)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    inputs.append(fstat)
    if with_friction:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        inputs.append(wcT)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    inputs.append(otT)
    in_specs.append(pl.BlockSpec((1, 1), lambda i, b: (0, 0),
                                 memory_space=pltpu.SMEM))
    inputs.append(hs)

    out_specs = [pl.BlockSpec((8, ob), lambda i, b: (0, i),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((8, n_blocks * ob), F)]
    if with_friction:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        out_shape.append(jax.ShapeDtypeStruct((4, capp), F))
    if extras:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        out_shape.append(jax.ShapeDtypeStruct((16, capp), F))

    # leading dim 2 = double-buffer slots (chunk k in slot k%2)
    scratch = [pltpu.VMEM((2, fstat.shape[0], ch), jnp.float32)]
    if with_friction:
        scratch.append(pltpu.VMEM((2, 4, ch), jnp.float32))   # wildcards in
    # other-side kinematic records, or the uidx stream in unique mode
    scratch.append(pltpu.VMEM((2, 16 if not ub else 1, ch), jnp.float32))
    if with_friction:
        scratch.append(pltpu.VMEM((2, 4, ch), jnp.float32))   # wc out
        scratch.append(pltpu.VMEM((4, ch), jnp.float32))      # wc readback
    if extras:
        scratch.append(pltpu.VMEM((16, ch), jnp.float32))     # extras buffer
        scratch.append(pltpu.VMEM((16, ch), jnp.float32))     # extras readback
    scratch.append(pltpu.SemaphoreType.DMA((2, 6)))

    out = pl.pallas_call(
        _make_kernel(ch, ob, float(voxel_size), with_friction, side_b,
                     extras=extras, ub=ub),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=scratch,
        ),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(cr, *inputs)
    acc = out[0]
    wc_out = out[1] if with_friction else None
    ext = out[-1] if extras else None
    return (acc, wc_out, ext) if extras else (acc, wc_out)


# ---------------------------------------------------------------------------
# step-level wrapper: layout prep + the two passes
# ---------------------------------------------------------------------------


def _pad_cols(m, pad, dead_row0=False):
    if not pad:
        return m
    padc = jnp.zeros((m.shape[0], pad), F)
    if dead_row0:
        padc = padc.at[0].set(-1.0)
    return jnp.concatenate([m, padc], axis=1)


def fused_step_ss(table, owners, params, voxel_size, model, krec,
                  interpret=None, extras=False):
    """One fused force step over the SS table. Returns
    (f_acc (N,3), t_acc (N,3), new_table).

    The caller guarantees the table came out of forces.finalize_table
    (owner-sorted, fstat_a/fstat_b/wcb/own_a_b layouts present) and that
    the model is one of the built-in Hertz variants (model.fused_variant).
    With `extras` the A pass additionally emits per-contact force /
    torque_only / cpoint into the table (query support — costs one extra
    16-row output stream, so the hot loop leaves it off).
    """
    from . import forces
    from .pallas_segred import owner_block_ranges

    if interpret is None:  # Mosaic needs hardware; tests run on CPU
        interpret = jax.default_backend() == "cpu"
    with_friction = model.fused_variant == "hertz_full"
    n_owners = owners.n
    cap = table.cap
    pad = (-cap) % CH
    capp = cap + pad
    live = table.idA >= 0
    wc_names = sorted(table.wildcards)

    # ---- pass A: own_a-sorted layout --------------------------------------
    fstatA = _pad_cols(table.fstat_a, pad, dead_row0=True)
    wcT = None
    if with_friction:
        wrows = [table.wildcards[n] for n in wc_names]
        wrows += [jnp.zeros((cap,), F)] * (4 - len(wrows))
        wcT = _pad_cols(jnp.stack(wrows, axis=0), pad)

    ids_a = jnp.where(table.own_a >= 0, table.own_a, n_owners)
    if pad:
        ids_a = jnp.concatenate(
            [ids_a, jnp.full((pad,), n_owners, I)], axis=0)
    cr_a, n_blocks = owner_block_ranges(ids_a, n_owners, OB)

    npad = n_blocks * OB
    krecT = jnp.concatenate(
        [krec, jnp.zeros((npad - n_owners, krec.shape[1]), F)], axis=0
    )

    ub = 0
    uslab_a = uslab_b = None
    if table.uniq_a.shape[0]:
        # unique-other mode: gather only each block's DISTINCT other-side
        # owners (one merged gather over both layouts' unique lists) and
        # let the kernel expand per-contact records with a one-hot matmul
        # from the streamed uidx. Cuts the step's dominant gather from
        # 2*cap rows to the unique counts (~2.5-5x fewer on settled beds).
        nu = table.uniq_a.shape[0]
        ub = nu // n_blocks
        assert ub * n_blocks == nu, (nu, n_blocks)
        merged = jnp.minimum(
            jnp.concatenate([table.uniq_a, table.uniq_b]), n_owners - 1)
        slabs = forces.gather_rows(krec, merged)
        uslab_a, uslab_b = slabs[:nu], slabs[nu:]
        btT = _pad_cols(table.uidx.reshape(1, cap), pad)
        atT = _pad_cols(table.uidx_b.reshape(1, cap), pad)
    else:
        # ONE merged row-gather for both passes' other-side kinematics
        # (two 3.93M-row gathers cost 40 ms, the merged one 36 —
        # tools/profile_*)
        own_b = jnp.where(live, table.own_b, 0)
        both = forces.gather_rows(
            krec, jnp.concatenate([own_b, table.own_a_b])).T
        btT = _pad_cols(both[:, :cap], pad)
        atT = _pad_cols(both[:, cap:], pad)

    outA = fused_hertz_pass(
        fstatA, wcT, krecT, btT, cr_a, n_blocks, params.h,
        voxel_size, with_friction, side_b=False, interpret=interpret,
        extras=extras, uslab=uslab_a, ub=ub,
    )
    accA, wcA_out = outA[0], outA[1]

    # ---- pass B: own_b-sorted layout --------------------------------------
    fstatB = _pad_cols(table.fstat_b, pad, dead_row0=True)
    wcbT = _pad_cols(table.wcb[:4], pad) if with_friction else None
    ids_b = jnp.minimum(table.own_b_sorted, n_owners)
    if pad:
        ids_b = jnp.concatenate(
            [ids_b, jnp.full((pad,), n_owners, I)], axis=0)
    cr_b, _ = owner_block_ranges(ids_b, n_owners, OB)

    accB, wcB_out = fused_hertz_pass(
        fstatB, wcbT, krecT, atT, cr_b, n_blocks, params.h,
        voxel_size, with_friction, side_b=True, interpret=interpret,
        uslab=uslab_b, ub=ub,
    )

    acc = (accA + accB)[:6, :n_owners].T
    f_acc = acc[:, 0:3]
    t_acc = acc[:, 3:6]

    new_wc = dict(table.wildcards)
    wcb = table.wcb
    if with_friction:
        for k, name in enumerate(wc_names):
            new_wc[name] = jnp.where(live, wcA_out[k, :cap], 0.0)
        live_b = table.own_b_sorted < n_owners
        wcb = jnp.where(live_b[None, :], wcB_out[:, :cap], 0.0)
        if table.wcb.shape[0] > 4:
            wcb = jnp.concatenate(
                [wcb, jnp.zeros((table.wcb.shape[0] - 4, cap), F)], axis=0)
    new_table = table.replace(wildcards=new_wc, wcb=wcb)
    if extras:
        # dead tail rows past the last owner block's range are never
        # written by the kernel (fresh HBM) — mask them out
        ext = jnp.where(live[None, :], outA[2][:, :cap], 0.0)
        new_table = new_table.replace(
            force=ext[0:3, :].T,
            torque=ext[3:6, :].T,
            cpoint=ext[6:9, :].T,
        )
    return f_acc, t_acc, new_table
