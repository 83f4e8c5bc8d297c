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
    Also returns, for each old slot, whether it was matched by a new slot."""
    n_old = old_idA.shape[0]
    n_new = new_idA.shape[0]
    a = jnp.concatenate([old_idA, new_idA])
    b = jnp.concatenate([old_idB, new_idB])
    tag = jnp.concatenate(
        [jnp.zeros((n_old,), I), jnp.ones((n_new,), I)]
    )
    slot = jnp.concatenate(
        [jnp.arange(n_old, dtype=I), jnp.arange(n_new, dtype=I)]
    )
    sa, sb, stag, sslot = jax.lax.sort((a, b, tag, slot), num_keys=3)

    prev_eq = jnp.concatenate(
        [
            jnp.zeros((1,), bool),
            (sa[1:] == sa[:-1]) & (sb[1:] == sb[:-1]),
        ]
    )
    prev_old = jnp.concatenate([jnp.zeros((1,), bool), stag[:-1] == 0])
    matched_here = (stag == 1) & prev_eq & prev_old
    partner = jnp.concatenate([jnp.zeros((1,), I), sslot[:-1]])

    # scatter back to new-slot space
    new_ids = jnp.where(stag == 1, sslot, n_new)
    mapping = (
        jnp.full((n_new,), -1, I)
        .at[new_ids]
        .set(jnp.where(matched_here, partner, -1), mode="drop")
    )

    # old matched mask: an old entry is matched iff its successor is an
    # equal-key new entry
    next_eq = jnp.concatenate([prev_eq[1:], jnp.zeros((1,), bool)])
    next_new = jnp.concatenate([stag[1:] == 1, jnp.zeros((1,), bool)])
    old_hit_here = (stag == 0) & next_eq & next_new
    old_ids = jnp.where(stag == 0, sslot, n_old)
    old_matched = (
        jnp.zeros((n_old,), bool).at[old_ids].set(old_hit_here, mode="drop")
    )
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
    cap = new_idA.shape[0]
    mapping, old_matched = _merge_match(old.idA, old.idB, new_idA, new_idB)
    live = new_idA >= 0
    matched = live & (mapping >= 0)
    safe_map = jnp.where(matched, mapping, 0)

    def gather_wc(name):
        src = old.wildcards.get(name)
        if src is None:
            return jnp.zeros((cap,), F)
        return jnp.where(matched, src[safe_map], 0.0)

    wildcards = {k: gather_wc(k) for k in wildcard_names}
    persist = jnp.where(matched, old.persist[safe_map], 0)

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
        force=jnp.zeros((cap, 3), F),
        torque=jnp.zeros((cap, 3), F),
        cpoint=jnp.zeros((cap, 3), F),
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
