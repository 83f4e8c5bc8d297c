"""Two-class polydisperse CD: the (S-S Pallas/XLA + L-L + S-L cross)
composition must find exactly the same candidate pairs as the single-grid
sweep on a ratio-3 random cloud (the GRC-bed shape that used to knock the
engine off the Pallas sweep, VERDICT r2 #4)."""

import jax
import jax.numpy as jnp
import numpy as np

from dem_engine_tpu.defines import F, I
from dem_engine_tpu.ops import binning
from dem_engine_tpu.ops.pallas_sweep3 import find_pairs_ss_pallas3


def _pairs_set(idA, idB):
    a = np.asarray(idA)
    b = np.asarray(idB)
    live = a >= 0
    return set(zip(a[live].tolist(), b[live].tolist()))


def _cloud(n=600, ratio=3.0, seed=0):
    rng = np.random.default_rng(seed)
    r_small = 0.01
    radius = np.where(
        rng.uniform(size=n) < 0.8, r_small, r_small * ratio
    )
    pos = rng.uniform(0.05, 0.95, (n, 3)) * np.asarray([1.0, 1.0, 0.3])
    margin = 0.2 * r_small
    reach = radius + margin
    owner = np.arange(n)
    family = np.zeros(n, np.int64)
    return (jnp.asarray(pos, F), jnp.asarray(reach, F),
            jnp.asarray(radius, F), jnp.asarray(owner, I),
            jnp.asarray(family, I))


def _single_grid(pos, reach, owner, family, mask, domain, cap):
    bs, nb = binning.build_grid(domain, reach.max())
    idA, idB, n, occ, tab = binning.find_pairs_ss(
        pos, reach, owner, family, mask, bs, nb, cap, 64
    )
    assert int(occ) <= 64
    return _pairs_set(idA, idB), int(n)


def _two_class(pos, reach, radius, owner, family, mask, domain, cap,
               thr, pallas_small=False, lcap=None, cross_mpb=64):
    small = radius <= thr
    large = ~small
    S = pos.shape[0]
    reach_s = jnp.max(jnp.where(small, reach, 0.0))
    reach_l = jnp.max(jnp.where(large, reach, 0.0))
    # mirror solver.refresh_contacts: cell covers reach_s + reach_l too
    bs_l, nb_l = binning.build_grid(
        domain, jnp.maximum(reach_l, 0.5 * (reach_s + reach_l)))
    lcap = lcap or S
    ((pos_c, reach_c, own_c, fam_c), orig_l, live_l, _n_large,
     lcap_ovf) = binning.compact_member(
        large, lcap, pos, reach, owner, family)
    assert not bool(lcap_ovf)
    reach_c = jnp.where(live_l, reach_c, -1e30)
    own_c = jnp.where(live_l, own_c, -1)
    fam_c = jnp.where(live_l, fam_c, 0)
    idA, idB, n_ll, occ_l, _ = binning.find_pairs_ss(
        pos_c, reach_c, own_c, fam_c, mask, bs_l, nb_l, cap, 64,
        member=live_l,
    )
    idA = jnp.where(idA >= 0, orig_l[jnp.maximum(idA, 0)], -1)
    idB = jnp.where(idB >= 0, orig_l[jnp.maximum(idB, 0)], -1)
    rec_l = jnp.concatenate(
        [pos_c, reach_c[:, None], own_c.astype(F)[:, None],
         fam_c.astype(F)[:, None],
         jnp.minimum(orig_l, S).astype(F)[:, None]], axis=1)
    eb, el, occ_x = binning.build_cross_entries(
        pos_c, jnp.maximum(reach_c + reach_s, 0.0), live_l, bs_l, nb_l)
    assert int(occ_x) <= cross_mpb
    idA, idB, n_xl = binning.find_pairs_cross_fine(
        pos, reach, owner, family, small, rec_l, eb, el, mask,
        bs_l, nb_l, cap, cross_mpb,
        base=jnp.minimum(n_ll, cap), outs=(idA, idB),
    )
    bs_s, nb_s = binning.build_grid(domain, reach_s)
    if pallas_small:
        idA_s, idB_s, n_sss, occ_s, _, win_ovf = find_pairs_ss_pallas3(
            pos, reach, owner, family, mask, bs_s, nb_s, cap,
            member=small, interpret=True,
        )
        assert not bool(win_ovf)
        shift = jnp.minimum(n_sss, cap)
        k = jnp.arange(cap, dtype=I)
        dest = jnp.where(idA >= 0, k + shift, cap)
        dest = jnp.where(dest < cap, dest, cap)
        idA = idA_s.at[dest].set(idA, mode="drop", unique_indices=True)
        idB = idB_s.at[dest].set(idB, mode="drop", unique_indices=True)
        total = int(n_sss) + int(n_xl)
    else:
        idA, idB, total, occ_s, _ = binning.find_pairs_ss(
            pos, reach, owner, family, mask, bs_s, nb_s, cap, 64,
            member=small, base=jnp.minimum(n_xl, cap), outs=(idA, idB),
        )
        total = int(total)
    return _pairs_set(idA, idB), total


def test_twoclass_matches_single_grid():
    pos, reach, radius, owner, family = _cloud()
    mask = jnp.ones((256, 256), bool)
    domain = jnp.asarray([1.0, 1.0, 0.3], F)
    cap = 65536
    thr = float(np.sqrt(0.01 * 0.03))

    ref, n_ref = _single_grid(pos, reach, owner, family, mask, domain, cap)
    got, n_got = _two_class(pos, reach, radius, owner, family, mask,
                            domain, cap, thr)
    assert n_ref == len(ref)
    assert n_got == len(got)
    assert got == ref


def test_twoclass_pallas_small_matches():
    pos, reach, radius, owner, family = _cloud(seed=3)
    mask = jnp.ones((256, 256), bool)
    domain = jnp.asarray([1.0, 1.0, 0.3], F)
    cap = 65536
    thr = float(np.sqrt(0.01 * 0.03))

    ref, _ = _single_grid(pos, reach, owner, family, mask, domain, cap)
    got, n_got = _two_class(pos, reach, radius, owner, family, mask,
                            domain, cap, thr, pallas_small=True)
    assert n_got == len(got)
    assert got == ref


def test_twoclass_respects_family_mask():
    pos, reach, radius, owner, family = _cloud(seed=5, n=300)
    family = jnp.asarray(
        np.where(np.arange(300) % 3 == 0, 1, 0), I
    )
    mask = jnp.ones((256, 256), bool).at[1, 1].set(False)
    domain = jnp.asarray([1.0, 1.0, 0.3], F)
    cap = 65536
    thr = float(np.sqrt(0.01 * 0.03))

    ref, _ = _single_grid(pos, reach, owner, family, mask, domain, cap)
    got, _ = _two_class(pos, reach, radius, owner, family, mask,
                        domain, cap, thr)
    assert got == ref
    fam = np.asarray(family)
    for a, b in got:
        assert not (fam[a] == 1 and fam[b] == 1)


def test_engine_twoclass_settles():
    """A tiny ratio-3 bed through the public API with two-class CD forced
    on agrees with the single-grid engine on contact counts."""
    from dem_engine_tpu.api import DEMSolver

    def build(two_class):
        rng = np.random.default_rng(0)
        sim = DEMSolver()
        sim.InstructBoxDomainDimension(0.4, 0.4, 0.3)
        mat = sim.LoadMaterial({"E": 1e7, "nu": 0.3, "CoR": 0.4,
                                "mu": 0.4, "Crr": 0.0})
        if two_class:
            sim.SetCDTwoClassGrids(True)
        else:
            sim.SetCDTwoClassGrids(False)
        tmpl_s = sim.LoadSphereType(0.008**3 * 2.6e3, 0.008, mat)
        tmpl_l = sim.LoadSphereType(0.024**3 * 2.6e3, 0.024, mat)
        pos_s = rng.uniform(0.05, 0.35, (120, 3)) * [1, 1, 0.5]
        pos_l = rng.uniform(0.05, 0.35, (20, 3)) * [1, 1, 0.5]
        sim.AddClumps(tmpl_s, pos_s)
        sim.AddClumps(tmpl_l, pos_l)
        sim.AddBCPlane([0.2, 0.2, 0.02], [0, 0, 1], mat)
        sim.SetInitTimeStep(5e-6)
        sim.SetGravitationalAcceleration([0, 0, -9.81])
        sim.SetCDUpdateFreq(10)
        sim.Initialize()
        return sim

    sim_a = build(two_class=True)
    assert sim_a.engine.cfg.cd_two_class
    sim_b = build(two_class=False)
    assert not sim_b.engine.cfg.cd_two_class
    sim_a.DoDynamics(2e-3)
    sim_b.DoDynamics(2e-3)
    na = int(sim_a.GetNumContacts())
    nb = int(sim_b.GetNumContacts())
    assert na == nb
    pa = np.asarray(sim_a.GetOwnerPosition())
    pb = np.asarray(sim_b.GetOwnerPosition())
    np.testing.assert_allclose(pa, pb, rtol=0, atol=1e-6)


def test_sweep_reenable_probe():
    """OVF_BIN_OCC disables the Pallas sweep; the engine re-probes it
    after a backoff of CD epochs instead of staying on the XLA fallback
    forever (VERDICT r2 #4)."""
    from __graft_entry__ import _build_case
    from dem_engine_tpu.solver import Engine
    from dem_engine_tpu.state import OVF_BIN_OCC

    cfg, state, params = _build_case(16, use_pallas_sweep=True)
    eng = Engine(cfg)
    b0 = eng._sweep_backoff
    state = eng.grow_for(state, OVF_BIN_OCC)
    assert not eng.cfg.use_pallas_sweep
    assert eng._sweep_disabled_occ
    assert eng._sweep_backoff == 2 * b0

    # not due yet
    eng._cd_epochs = eng._sweep_probe_at - 1
    eng._maybe_reenable_sweep()
    assert not eng.cfg.use_pallas_sweep
    # due: probe re-enables
    eng._cd_epochs = eng._sweep_probe_at
    eng._maybe_reenable_sweep()
    assert eng.cfg.use_pallas_sweep
    # trips again: disabled with doubled backoff
    state = eng.grow_for(state, OVF_BIN_OCC)
    assert not eng.cfg.use_pallas_sweep
    assert eng._sweep_backoff == 4 * b0


def test_twoclass_small_reach_above_large():
    """Margins (velocity / family extra) can push a SMALL-class sphere's
    reach above the large class's max reach; the coarse grid must size
    its cell by reach_s + reach_l, not 2*reach_l, or cross pairs beyond
    one L-cell are silently missed (regression)."""
    pos, reach, radius, owner, family = _cloud(seed=11, n=400)
    # inflate the small class's reach well past the large class's
    small_np = np.asarray(radius) <= 0.02
    reach = jnp.where(jnp.asarray(small_np),
                      jnp.asarray(radius, F) + 0.05, reach)
    mask = jnp.ones((256, 256), bool)
    domain = jnp.asarray([1.0, 1.0, 0.3], F)
    cap = 262144
    thr = float(np.sqrt(0.01 * 0.03))

    ref, _ = _single_grid(pos, reach, owner, family, mask, domain, cap)
    got, n_got = _two_class(pos, reach, radius, owner, family, mask,
                            domain, cap, thr)
    assert n_got == len(got)
    assert got == ref
