"""Diff the SS pair list of the two-class CD vs the single-grid CD on the
TPU for the poly verify bed (no stepping, just one refresh each)."""
import sys, os, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from dem_engine_tpu.utils import compile_cache
compile_cache.enable()

from tools.verify_r3 import build


def pairs_of(sim):
    st = sim.state.ss
    a = np.asarray(st.idA)
    b = np.asarray(st.idB)
    live = a >= 0
    return set(zip(a[live].tolist(), b[live].tolist()))


s, n, masses = build(poly=True)
assert s.engine.cfg.cd_two_class
s.state = s.engine.refresh(s.state, s.params)
p_two = pairs_of(s)
print("two-class pairs:", len(p_two), flush=True)

# same sim, single-grid refresh
eng = s.engine
eng.cfg = dataclasses.replace(eng.cfg, cd_two_class=False)
eng._build()
s.state = eng.refresh(s.state, s.params)
p_one = pairs_of(s)
print("single-grid pairs:", len(p_one), flush=True)

only_two = p_two - p_one
only_one = p_one - p_two
print("only in two-class:", len(only_two), sorted(only_two)[:20], flush=True)
print("only in single:", len(only_one), sorted(only_one)[:20], flush=True)

if only_one:
    rad = np.asarray(s.state.spheres.radius)
    kinds = {}
    thr = s._cls_thr
    for a, b in only_one:
        ka = "S" if rad[a] <= thr else "L"
        kb = "S" if rad[b] <= thr else "L"
        kinds[ka + kb] = kinds.get(ka + kb, 0) + 1
    print("missing pair kinds:", kinds, flush=True)
if only_two:
    rad = np.asarray(s.state.spheres.radius)
    thr = s._cls_thr
    kinds = {}
    for a, b in only_two:
        ka = "S" if rad[a] <= thr else "L"
        kb = "S" if rad[b] <= thr else "L"
        kinds[ka + kb] = kinds.get(ka + kb, 0) + 1
    print("extra pair kinds:", kinds, flush=True)
print("DIAG_DONE", flush=True)
