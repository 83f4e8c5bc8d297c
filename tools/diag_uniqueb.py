"""Measure the unique-other-owner factor per owner block on a settled bed.

The fused pass gathers one 16-f32 kinematic record per contact for the
non-reducing side (2 x cap rows/step, ~5 ns/row => 36 ms at 3.93M).
If instead each owner-block fetches only its DISTINCT other-side owners
and expands in-kernel with a one-hot matmul, the gather shrinks by the
multiplicity factor measured here.
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from __graft_entry__ import _build_case  # noqa: E402
from dem_engine_tpu.solver import Engine  # noqa: E402

OB = 128


def uniq_stats(own_sorted, own_other, n_owners, label):
    """own_sorted: the layout's reducing-side owner per row (sorted);
    own_other: the other side per row (same row order)."""
    live = own_sorted < n_owners
    blocks = np.asarray(own_sorted[live]) // OB
    other = np.asarray(own_other[live])
    tot = len(other)
    uniq_tot = 0
    umax = 0
    for b in np.unique(blocks):
        u = len(np.unique(other[blocks == b]))
        uniq_tot += u
        umax = max(umax, u)
    print(f"[{label}] rows={tot} unique={uniq_tot} "
          f"factor={tot / max(uniq_tot, 1):.2f} max_per_block={umax}")
    return umax


def main(n=4096, settle_steps=3000):
    cfg, state, params = _build_case(n_clumps=n, update_freq=25)
    eng = Engine(cfg)
    state = eng.advance(state, params, settle_steps, 25)
    tbl = state.ss
    n_owners = state.owners.n
    own_a = np.asarray(tbl.own_a)
    own_b = np.asarray(tbl.own_b)
    live = np.asarray(tbl.idA) >= 0
    # layout A: rows sorted by own_a (finalize_table order)
    oa = np.where(live, own_a, n_owners)
    ob_ = np.where(live, own_b, n_owners)
    umax_a = uniq_stats(oa, ob_, n_owners, "A-layout (gather B)")
    # layout B: rows sorted by own_b
    perm = np.asarray(tbl.perm_b)
    obs = np.asarray(tbl.own_b_sorted)
    oas = oa[perm]
    umax_b = uniq_stats(np.where(obs < n_owners, obs, n_owners),
                        np.where(obs < n_owners, oas, n_owners),
                        n_owners, "B-layout (gather A)")
    print(f"contacts={int(tbl.count)} owners={n} "
          f"suggested UB >= {max(umax_a, umax_b)}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096,
         int(sys.argv[2]) if len(sys.argv) > 2 else 3000)
