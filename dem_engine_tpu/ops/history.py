"""Contact-history mapping across contact-table refreshes.

The reference builds ``contactMapping[new] = old_index`` with run-length
encoding + a per-sphere matching kernel (DEMCubContactDetection.cu:895-974,
buildPersistentMap in DEMHistoryMappingKernels.cu:17), then dT gathers the
old wildcards through the map (rearrangeContactWildcards,
DEMPrepForceKernels.cu:46). Semantics preserved here:

  * a new contact matching an old (idA, idB) pair inherits its wildcards;
  * unmatched new contacts start with zeroed wildcards;
  * old contacts flagged persistent that were NOT re-detected are
    re-injected into the new table with their history
    (overwritePrevContactArrays / persistency path, :601-802).

TPU-native mechanism: one multi-key ``lax.sort`` merge of old+new keys —
each key occurs at most once per table, so a new entry matches iff its
predecessor in the merged order is an old entry with an equal key.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..defines import F, I
from ..state import ContactTable


def _merge_match(old_idA, old_idB, new_idA, new_idB):
    """For each new slot: index of the old slot with equal (idA, idB), or -1.
    Also returns, for each old slot, whether it was matched by a new slot.

    TPU cost note: results are carried back to slot order by a second sort
    on the original concat position (~3-5 ns/row) instead of the two
    2·cap-row scatters this used to do (~10-18 ns/row each, CLAUDE.md
    primitive costs). The concat position also subsumes the old tag/slot
    sort operands: old rows sit before new rows among equal (idA, idB)
    keys because their positions are smaller, and each key occurs at most
    once per table."""
    n_old = old_idA.shape[0]
    n_new = new_idA.shape[0]
    a = jnp.concatenate([old_idA, new_idA])
    b = jnp.concatenate([old_idB, new_idB])
    pos = jnp.arange(n_old + n_new, dtype=I)
    sa, sb, spos = jax.lax.sort((a, b, pos), num_keys=2)
    sold = spos < n_old  # old-table rows keep their slot as position

    prev_eq = jnp.concatenate(
        [
            jnp.zeros((1,), bool),
            (sa[1:] == sa[:-1]) & (sb[1:] == sb[:-1]),
        ]
    )
    prev_old = jnp.concatenate([jnp.zeros((1,), bool), sold[:-1]])
    matched_here = (~sold) & prev_eq & prev_old
    partner = jnp.concatenate([jnp.zeros((1,), I), spos[:-1]])
    match_val = jnp.where(matched_here, partner, -1)

    # old matched mask: an old entry is matched iff its successor is an
    # equal-key new entry
    next_eq = jnp.concatenate([prev_eq[1:], jnp.zeros((1,), bool)])
    next_new = jnp.concatenate([~sold[1:], jnp.zeros((1,), bool)])
    old_hit_here = sold & next_eq & next_new

    # un-sort: one position-keyed sort carries both outputs home
    _, mv, oh = jax.lax.sort(
        (spos, match_val, old_hit_here.astype(I)), num_keys=1
    )
    mapping = mv[n_old:]
    old_matched = oh[:n_old].astype(bool)
    return mapping, old_matched


def carry_history(
    old: ContactTable,
    new_idA: jnp.ndarray,
    new_idB: jnp.ndarray,
    new_count: jnp.ndarray,
    wildcard_names: Tuple[str, ...],
    use_persistency: bool,
):
    """Build the refreshed ContactTable, carrying wildcards/persistency.
    Returns (table, n_lost): n_lost counts non-persistent contacts that
    carried live history (any nonzero wildcard) but were NOT re-detected
    -- the reference's lost-contact sentry (dT.cpp:2040-2144).

    Padding entries on both sides have idA == -1; since every real idA >= 0,
    a padding "match" can only map padding→padding, which carries zeros and
    is masked by `live` anyway.
    """
    from .forces import gather_rows

    cap = new_idA.shape[0]
    mapping, old_matched = _merge_match(old.idA, old.idB, new_idA, new_idB)
    live = new_idA >= 0
    matched = live & (mapping >= 0)
    safe_map = jnp.where(matched, mapping, 0)

    # ONE packed row gather for all carried per-contact fields: separate
    # width-1 f32 gathers cost ~13-15 ns/row each on this TPU while a
    # packed i16-bitcast row gather is ~5 ns/row total (CLAUDE.md
    # primitive costs — this was ~360 ms of the 262k refresh as 5
    # scalar gathers, stage-G bisect round 4)
    src_cols = [
        old.wildcards.get(k) if old.wildcards.get(k) is not None
        else jnp.zeros((old.cap,), F)
        for k in wildcard_names
    ]
    packed = jnp.stack(
        src_cols + [old.persist.astype(F)], axis=1)   # (cap_old, n_wc+1)
    rows = gather_rows(packed, safe_map)               # (cap, n_wc+1)
    wildcards = {
        k: jnp.where(matched, rows[:, i], 0.0)
        for i, k in enumerate(wildcard_names)
    }
    persist = jnp.where(matched, rows[:, len(wildcard_names)].astype(I), 0)

    # lost-contact sentry: history silently dropped?
    old_live = old.idA >= 0
    had_history = jnp.zeros_like(old_live)
    for k in wildcard_names:
        src_wc = old.wildcards.get(k)
        if src_wc is not None:
            had_history |= jnp.abs(src_wc) > 0
    n_lost = jnp.sum(
        (old_live & ~old_matched & (old.persist == 0) & had_history)
        .astype(I)
    )

    if use_persistency:
        # re-inject old persistent contacts that were not re-detected
        keep = (old.idA >= 0) & (old.persist > 0) & (~old_matched)
        csum = jnp.cumsum(keep.astype(I))
        dest = jnp.where(keep, new_count + csum - 1, cap)
        dest = jnp.where(dest < cap, dest, cap)
        new_idA = new_idA.at[dest].set(old.idA, mode="drop")
        new_idB = new_idB.at[dest].set(old.idB, mode="drop")
        persist = persist.at[dest].set(old.persist, mode="drop")
        for k in wildcard_names:
            src = old.wildcards.get(k)
            if src is not None:
                wildcards[k] = wildcards[k].at[dest].set(src, mode="drop")
        new_count = new_count + csum[-1] if keep.size else new_count

    return ContactTable(
        idA=new_idA,
        idB=new_idB,
        count=new_count,
        persist=persist,
        # slim fused tables carry no query fields (state.empty_layout);
        # keep whatever shape the old table had
        force=jnp.zeros_like(old.force),
        torque=jnp.zeros_like(old.torque),
        cpoint=jnp.zeros_like(old.cpoint),
        wildcards=wildcards,
        # stale until the caller's finalize_table rebuilds them
        own_a=old.own_a,
        own_b=old.own_b,
        perm_b=old.perm_b,
        own_b_sorted=old.own_b_sorted,
        statics=old.statics,
        premix=old.premix,
        fstat_a=old.fstat_a,
        fstat_b=old.fstat_b,
        wcb=old.wcb,
        own_a_b=old.own_a_b,
        uidx=old.uidx,
        uidx_b=old.uidx_b,
        uniq_a=old.uniq_a,
        uniq_b=old.uniq_b,
        uniq_max=old.uniq_max,
    ), n_lost
