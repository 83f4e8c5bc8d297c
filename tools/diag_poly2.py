"""Poly bed on TPU with two-class CD DISABLED: if it still explodes the
bug is in the fused force path at mixed radii, not the two-class CD."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dem_engine_tpu.utils import compile_cache
compile_cache.enable()
import numpy as np
import tools.verify_r3 as vr

_orig_build = vr.build
def build_nodc(poly=False):
    from dem_engine_tpu.api import DEMSolver
    old = DEMSolver.Initialize
    s_n_m = None
    # easiest: build normally but force the flag off beforehand
    import types
    sim_holder = {}
    def patched(self, *a, **k):
        self.SetCDTwoClassGrids(False)
        return old(self, *a, **k)
    DEMSolver.Initialize = patched
    try:
        out = _orig_build(poly)
    finally:
        DEMSolver.Initialize = old
    return out

vr.build = build_nodc
try:
    vr.run_case("poly3-singlegrid", poly=True, check_two_class=False)
    print("POLY_SINGLEGRID_OK", flush=True)
except AssertionError as e:
    print("POLY_SINGLEGRID_FAIL:", e, flush=True)
