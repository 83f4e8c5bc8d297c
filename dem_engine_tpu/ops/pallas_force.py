"""Fused Pallas force pass over the owner-sorted sphere-sphere table.

The reference evaluates geometry + the user force model + history update in
ONE kernel per contact (calculateContactForces, DEMCalcForceKernels.cu:44-267)
feeding a cached-index reduce (DEMCubForceCollection.cu:19-170). Round 2's
XLA step instead round-tripped the contact table through HBM between the
narrow phase, the friction/wildcard chain, the table update and the wrench
emission — the builder-measured ~50 ms of a 114 ms step at 262k clumps.

This kernel is the TPU re-expression of that single pass, organized around
the table's owner-sorted invariant:

  * grid = blocks of OB consecutive owners. Each block's contact rows are
    the contiguous range [cstart, cend) (one XLA searchsorted), walked in
    CH-wide chunks DMA'd from HBM.
  * the A-side kinematic gather AND the A-side wrench reduction are the
    SAME one-hot matmul: E[o, j] = (own_a[j] == block_lo + o), so
    A_kin = krec_block @ E and acc += rec_a @ E^T, both on the MXU. The
    krec block is a statically-mapped VMEM input — no window can ever
    spill, for any owner count (this removes round 2's 350k-owner gate).
  * all math runs field-major on (1, CH) rows: statics (32, CH) chunks,
    premixed materials, wildcards, and the XLA-pre-gathered B kinematics
    stream through VMEM; new wildcards and the B-side wrench records
    stream back out. Nothing per-contact is materialized in HBM between
    stages.
  * chunks shared between adjacent owner blocks are visited twice with
    complementary one-hot masks; per-row outputs for a shared chunk are
    read back and merged so each row's final value comes from the block
    that owns it (the grid is sequential, so this is race-free).

The B-side reduction stays outside: rec_b rows are permuted into
own_b-sorted order (refresh-built permutation) and summed by the
owner-block segment-sum kernel (pallas_segred.seg_sum_sorted_blocks).

Physics parity: the math mirrors models/hertz.py line for line (itself the
re-derivation of FullHertzianForceModel.cu / FrictionlessHertzianForceModel
.cu); narrow phase mirrors ops/narrowphase.sphere_sphere
(checkSpheresOverlap, DEMHelperKernels.cuh:293).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..defines import F, I, TINY_FLOAT

CH = 512   # contact chunk width
OB = 512   # owners per grid block

_PI_SQ = 9.869604401089358
_TWO_SQRT_5_6 = 2.0 * (5.0 / 6.0) ** 0.5
_PI = 3.14159265358979323846

# kinematic record rows (matches forces.KREC_W layout)
# [0:3] vox  [3:6] loc  [6:10] quat  [10:13] vel  [13:16] omg

# statics rows (forces.finalize_table, kind == "ss")
# [0] own_a  [1] own_b  [2:5] relposA  [5] radA  [8:11] relposB  [11] radB
# [17] massA [18] massB

# premix rows (forces.premix_names for the Hertz models)
# [0] E:a [1] E:b [2] nu:a [3] nu:b [4] CoR [5] mu [6] Crr

# wildcard rows (sorted contact_wildcards of the full Hertz model)
# [0] delta_tan_x [1] delta_tan_y [2] delta_tan_z [3] delta_time


# ---------------------------------------------------------------------------
# row-vector helpers: 3-vectors are tuples of (1, CH) rows so every op is a
# full-lane VPU op with no sublane relayouts
# ---------------------------------------------------------------------------


def _v3(m, i):
    return (m[i:i + 1, :], m[i + 1:i + 2, :], m[i + 2:i + 3, :])


def _q4(m, i):
    return (m[i:i + 1, :], m[i + 1:i + 2, :], m[i + 2:i + 3, :],
            m[i + 3:i + 4, :])


def _add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _neg3(a):
    return (-a[0], -a[1], -a[2])


def _scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _where3(c, a, b):
    if not isinstance(b, tuple):
        b = (jnp.full_like(a[0], b),) * 3
    return tuple(jnp.where(c, x, y) for x, y in zip(a, b))


def _rot(q, v):
    """quat.rotate on rows: body -> global (15-multiply form)."""
    qv = (q[1], q[2], q[3])
    t = _scale3(_cross3(qv, v), 2.0)
    return _add3(v, _add3(_scale3(t, q[0]), _cross3(qv, t)))


def _rot_inv(q, v):
    return _rot((q[0], -q[1], -q[2], -q[3]), v)


# ---------------------------------------------------------------------------
# the fused Hertz math on field-major rows (parity: models/hertz.py)
# ---------------------------------------------------------------------------


def _hertz_rows(s, p, w, Ak, Bk, h, voxel_size, with_friction):
    """s (32, CH) statics, p (8, CH) premix, w (8, CH) wildcards (or None),
    Ak/Bk (16, CH) kinematics. Returns (rec_a (8, CH), rec_b (8, CH),
    wc_new (8, CH) or None, live (1, CH) bool)."""
    avox, aloc = _v3(Ak, 0), _v3(Ak, 3)
    aq, avel, aomg = _q4(Ak, 6), _v3(Ak, 10), _v3(Ak, 13)
    bvox, bloc = _v3(Bk, 0), _v3(Bk, 3)
    bq, bvel, bomg = _q4(Bk, 6), _v3(Bk, 10), _v3(Bk, 13)
    relA, radA = _v3(s, 2), s[5:6, :]
    relB, radB = _v3(s, 8), s[11:12, :]
    mA, mB = s[17:18, :], s[18:19, :]
    live = s[0:1, :] >= 0.0

    # B position relative to owner A CoM (exact voxel-int difference)
    d = tuple(
        (bv - av) * voxel_size + (bl - al)
        for av, al, bv, bl in zip(avox, aloc, bvox, bloc)
    )
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

    # material mix (models/force_model.hertz_material_mix)
    Ea, Eb, nua, nub = p[0:1, :], p[1:2, :], p[2:3, :], p[3:4, :]
    CoR = p[4:5, :]
    inv_E = (1.0 - nua * nua) / Ea + (1.0 - nub * nub) / Eb
    E_eff = 1.0 / inv_E
    inv_G = (2.0 * (2.0 - nua) * (1.0 + nua) / Ea
             + 2.0 * (2.0 - nub) * (1.0 + nub) / Eb)
    G_eff = 1.0 / inv_G

    # contact-point velocities (ContactContext.rot_vel_cp_global)
    lcp_a = _rot_inv(aq, cp)
    lcp_b = _rot_inv(bq, cp_b)
    va = _rot(aq, _cross3(aomg, lcp_a))
    vb = _rot(bq, _cross3(bomg, lcp_b))
    vel_b2a = _sub3(_add3(avel, va), _add3(bvel, vb))
    proj = _dot3(vel_b2a, b2a)
    vrel_tan = _sub3(vel_b2a, _scale3(b2a, proj))

    m_eff = mA * mB / jnp.maximum(mA + mB, TINY_FLOAT)
    r_eff = radA * radB / jnp.maximum(radA + radB, TINY_FLOAT)
    sqrt_Rd = jnp.sqrt(ovl * r_eff)
    Sn = 2.0 * E_eff * sqrt_Rd
    loge = jnp.log(jnp.maximum(CoR, TINY_FLOAT))
    beta = loge / jnp.sqrt(loge * loge + _PI_SQ)
    k_n = (2.0 / 3.0) * Sn
    gamma_n = _TWO_SQRT_5_6 * beta * jnp.sqrt(Sn * m_eff)
    f_n = k_n * ovl + gamma_n * proj
    force = _scale3(b2a, f_n)
    torque_only = (jnp.zeros_like(f_n),) * 3
    wc_new = None

    if with_friction:
        mu, Crr = p[5:6, :], p[6:7, :]
        dtan = (w[0:1, :], w[1:2, :], w[2:3, :])
        dtan = _add3(dtan, _scale3(vrel_tan, h))
        disp_proj = _dot3(dtan, b2a)
        dtan = _sub3(dtan, _scale3(b2a, disp_proj))
        dtime = w[3:4, :] + h

        # rolling resistance (Schwartz; parity hertz.py:80-108)
        R_eff = jnp.sqrt(r_eff)
        kn_simple = (4.0 / 3.0) * E_eff * jnp.sqrt(R_eff)
        gn_simple = (-2.0 * jnp.sqrt((5.0 / 3.0) * m_eff * E_eff) * beta
                     * jnp.sqrt(jnp.sqrt(R_eff)))
        d_coeff = gn_simple / (
            2.0 * jnp.maximum(jnp.sqrt(kn_simple * m_eff), TINY_FLOAT)
        )
        t_col = _PI * jnp.sqrt(
            m_eff / jnp.maximum(
                kn_simple
                * jnp.maximum(1.0 - d_coeff * d_coeff, TINY_FLOAT),
                TINY_FLOAT,
            )
        )
        # (scalar-True where-arm trips Mosaic's i1 truncation; use bool ops)
        past = (d_coeff >= 1.0) | (dtime > t_col)
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
        zero = jnp.zeros_like(dtime)
        wc_new = jnp.concatenate(
            [
                jnp.where(keep, dtan[0], 0.0),
                jnp.where(keep, dtan[1], 0.0),
                jnp.where(keep, dtan[2], 0.0),
                jnp.where(keep, dtime, 0.0),
                zero, zero, zero, zero,
            ],
            axis=0,
        )

    force = _where3(in_contact & live, force, 0.0)
    torque_only = _where3(in_contact & live, torque_only, 0.0)
    f_tot = _add3(force, torque_only)
    tq_a = _cross3(lcp_a, _rot_inv(aq, f_tot))
    tq_b = _cross3(lcp_b, _rot_inv(bq, _neg3(f_tot)))
    zero = jnp.zeros_like(f_n)
    rec_a = jnp.concatenate(
        list(force) + [jnp.where(live, t, 0.0) for t in tq_a]
        + [zero, zero], axis=0)
    rec_b = jnp.concatenate(
        [-f for f in force] + [jnp.where(live, t, 0.0) for t in tq_b]
        + [zero, zero], axis=0)
    return rec_a, rec_b, wc_new, live


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _make_kernel(ch, ob, voxel_size, with_friction):
    def kernel(cr_ref, krec_ref, stat_hbm, prem_hbm, *rest):
        if with_friction:
            (wc_hbm, bt_hbm, hs_ref, acc_ref, wcout_hbm, recb_hbm,
             stat_s, prem_s, wc_s, bt_s, wcob_s, recb_s, wcrb_s,
             recbrb_s, sems) = rest
        else:
            (bt_hbm, hs_ref, acc_ref, recb_hbm,
             stat_s, prem_s, bt_s, recb_s, recbrb_s, sems) = rest
            wc_hbm = wc_s = wcout_hbm = wcob_s = wcrb_s = None

        i = pl.program_id(0)
        cstart = cr_ref[2 * i]
        cend = cr_ref[2 * i + 1]
        c0 = cstart // ch
        c1 = (cend + ch - 1) // ch
        block_lo = i * ob
        h = hs_ref[0, 0]

        def body(c, acc):
            off = pl.multiple_of(c * ch, ch)
            cps = [
                pltpu.make_async_copy(
                    stat_hbm.at[:, pl.ds(off, ch)], stat_s, sems.at[0]),
                pltpu.make_async_copy(
                    prem_hbm.at[:, pl.ds(off, ch)], prem_s, sems.at[1]),
                pltpu.make_async_copy(
                    bt_hbm.at[:, pl.ds(off, ch)], bt_s, sems.at[2]),
            ]
            if with_friction:
                cps.append(pltpu.make_async_copy(
                    wc_hbm.at[:, pl.ds(off, ch)], wc_s, sems.at[3]))
            for cp in cps:
                cp.start()

            # shared-boundary merge: the first chunk of this block may also
            # be the last chunk of the previous block, which already wrote
            # it (with garbage for OUR rows — its A-kinematics window does
            # not cover them). Read its output back and keep its values for
            # the rows it owns. Non-first chunks never look at the readback
            # (their merge mask is all-mine).
            merge = (c == c0) & (cstart % ch != 0)

            @pl.when(merge)
            def _():
                rb = [pltpu.make_async_copy(
                    recb_hbm.at[:, pl.ds(off, ch)], recbrb_s, sems.at[4])]
                if with_friction:
                    rb.append(pltpu.make_async_copy(
                        wcout_hbm.at[:, pl.ds(off, ch)], wcrb_s,
                        sems.at[5]))
                for cp in rb:
                    cp.start()
                for cp in rb:
                    cp.wait()

            for cp in cps:
                cp.wait()

            s = stat_s[...]
            own = s[0:1, :].astype(jnp.int32)
            rel = own - block_lo
            inblk = (s[0:1, :] >= 0.0) & (rel >= 0) & (rel < ob)
            E = ((jax.lax.broadcasted_iota(jnp.int32, (ob, ch), 0) == rel)
                 & inblk).astype(F)                       # (ob, ch)
            # HIGHEST: default MXU precision rounds inputs to bf16,
            # which destroys the voxel-int rows of the kinematic records
            Ak = jax.lax.dot_general(
                krec_ref[...], E, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                             # (16, ch)

            rec_a, rec_b, wc_new, live = _hertz_rows(
                s, prem_s[...], wc_s[...] if with_friction else None,
                Ak, bt_s[...], h, voxel_size, with_friction,
            )

            # A-side reduce through the same one-hot (select first: NaNs
            # from out-of-block rows must not ride a 0-weight product)
            rec_a = jnp.where(inblk, rec_a, 0.0)
            acc = acc + jax.lax.dot_general(
                rec_a, E, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                             # (8, ob)

            # per-row outputs; rows before cstart keep the previous
            # block's values (they are his), rows after cend get fixed by
            # the next block's merge
            slot = off + jax.lax.broadcasted_iota(jnp.int32, (1, ch), 1)
            mine = slot >= cstart
            recb_s[...] = jnp.where(mine, rec_b, recbrb_s[...])
            wr = [pltpu.make_async_copy(
                recb_s, recb_hbm.at[:, pl.ds(off, ch)], sems.at[6])]
            if with_friction:
                wcob_s[...] = jnp.where(mine, wc_new, wcrb_s[...])
                wr.append(pltpu.make_async_copy(
                    wcob_s, wcout_hbm.at[:, pl.ds(off, ch)], sems.at[7]))
            for cp in wr:
                cp.start()
            for cp in wr:
                cp.wait()
            return acc

        acc_ref[...] = jax.lax.fori_loop(
            c0, c1, body, jnp.zeros((8, ob), F)
        )

    return kernel


def fused_hertz_ss(statics, premixT, wcT, krecT, btT, cr, n_blocks, h,
                   voxel_size, with_friction, interpret=False,
                   ch=None, ob=None):
    """Run the fused force pass. All array layouts are field-major:

      statics (32, capp), premixT (8, capp), wcT (8, capp) or None,
      krecT (16, n_blocks*ob), btT (16, capp) B-side kinematics,
      cr (2*n_blocks,) i32 per-block [cstart, cend) contact ranges,
      h: f32[] traced step size.

    Returns (accT (8, n_blocks*ob) A-side owner wrenches,
             wc_outT (8, capp) or None, rec_bT (8, capp) field-major).
    """
    ch = ch or CH
    ob = ob or OB
    capp = statics.shape[1]
    assert capp % ch == 0, capp
    hs = jnp.reshape(h.astype(F), (1, 1))

    in_specs = [
        pl.BlockSpec((16, ob), lambda i, b: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    inputs = [krecT, statics, premixT]
    if with_friction:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        inputs.append(wcT)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    inputs.append(btT)
    in_specs.append(pl.BlockSpec((1, 1), lambda i, b: (0, 0),
                                 memory_space=pltpu.SMEM))
    inputs.append(hs)

    out_specs = [pl.BlockSpec((8, ob), lambda i, b: (0, i),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((8, n_blocks * ob), F)]
    if with_friction:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        out_shape.append(jax.ShapeDtypeStruct((8, capp), F))
    out_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    out_shape.append(jax.ShapeDtypeStruct((8, capp), F))

    scratch = [
        pltpu.VMEM((32, ch), jnp.float32),   # statics
        pltpu.VMEM((8, ch), jnp.float32),    # premix
    ]
    if with_friction:
        scratch.append(pltpu.VMEM((8, ch), jnp.float32))   # wildcards in
    scratch.append(pltpu.VMEM((16, ch), jnp.float32))      # B kinematics
    if with_friction:
        scratch.append(pltpu.VMEM((8, ch), jnp.float32))   # wc out buffer
    scratch.append(pltpu.VMEM((8, ch), jnp.float32))       # rec_b buffer
    if with_friction:
        scratch.append(pltpu.VMEM((8, ch), jnp.float32))   # wc readback
    scratch.append(pltpu.VMEM((8, ch), jnp.float32))       # rec_b readback
    scratch.append(pltpu.SemaphoreType.DMA((8,)))

    out = pl.pallas_call(
        _make_kernel(ch, ob, float(voxel_size), with_friction),
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
    if with_friction:
        return out[0], out[1], out[2]
    return out[0], None, out[1]


# ---------------------------------------------------------------------------
# step-level wrapper: layout prep + B-side reduce
# ---------------------------------------------------------------------------


def fused_step_ss(table, owners, params, voxel_size, model, krec,
                  interpret=None):
    """One fused force step over the SS table. Returns
    (f_acc (N,3), t_acc (N,3), new_table).

    The caller guarantees the table came out of forces.finalize_table
    (owner-sorted, field-major statics, valid perm_b/own_b_sorted) and that
    the model is one of the built-in Hertz variants (model.fused_variant).
    """
    from . import forces
    from .pallas_segred import owner_block_ranges, seg_sum_sorted_blocks

    if interpret is None:  # Mosaic needs hardware; tests run on CPU
        interpret = jax.default_backend() == "cpu"
    with_friction = model.fused_variant == "hertz_full"
    n_owners = owners.n
    cap = table.cap
    pad = (-cap) % CH
    capp = cap + pad

    statics = table.statics
    if pad:
        statics = jnp.concatenate(
            [statics, jnp.zeros((statics.shape[0], pad), F).at[0].set(-1.0)],
            axis=1,
        )

    pn = forces.premix_names(model)
    prows = [table.premix[n] for n in pn]
    prows += [jnp.zeros((cap,), F)] * (8 - len(prows))
    premixT = jnp.stack(prows, axis=0)
    if pad:
        premixT = jnp.concatenate(
            [premixT, jnp.zeros((8, pad), F)], axis=1)

    wcT = None
    wc_names = sorted(table.wildcards)
    if with_friction:
        wrows = [table.wildcards[n] for n in wc_names]
        wrows += [jnp.zeros((cap,), F)] * (8 - len(wrows))
        wcT = jnp.stack(wrows, axis=0)
        if pad:
            wcT = jnp.concatenate([wcT, jnp.zeros((8, pad), F)], axis=1)

    live = table.idA >= 0
    ids_a = jnp.where(table.own_a >= 0, table.own_a, n_owners)
    if pad:
        ids_a = jnp.concatenate(
            [ids_a, jnp.full((pad,), n_owners, I)], axis=0)
    cr, n_blocks = owner_block_ranges(ids_a, n_owners, OB)

    npad = n_blocks * OB
    krecT = jnp.concatenate(
        [krec, jnp.zeros((npad - n_owners, krec.shape[1]), F)], axis=0
    ).T

    own_b = jnp.where(live, table.own_b, 0)
    bt = forces.gather_rows(krec, own_b)
    btT = bt.T
    if pad:
        btT = jnp.concatenate([btT, jnp.zeros((16, pad), F)], axis=1)

    accT, wc_outT, rec_b = fused_hertz_ss(
        statics, premixT, wcT, krecT, btT, cr, n_blocks, params.h,
        voxel_size, with_friction, interpret=interpret,
    )

    # B side: permute into own_b-sorted order, owner-block segment sum.
    # Rows past the processed range are uninitialized — mask before use.
    rec_b = jnp.where(live[:, None], rec_b[:, :cap].T, 0.0)
    rec_b_sorted = rec_b[table.perm_b]
    acc_b = seg_sum_sorted_blocks(
        rec_b_sorted[:, :6], table.own_b_sorted, n_owners,
        interpret=interpret,
    )

    acc_a = accT[:6, :n_owners].T
    f_acc = acc_a[:, 0:3] + acc_b[:, 0:3]
    t_acc = acc_a[:, 3:6] + acc_b[:, 3:6]

    new_wc = dict(table.wildcards)
    if with_friction:
        for k, name in enumerate(wc_names):
            new_wc[name] = jnp.where(live, wc_outT[k, :cap], 0.0)
    new_table = table.replace(wildcards=new_wc)
    return f_acc, t_acc, new_table
