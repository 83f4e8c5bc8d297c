import sys, dataclasses
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from __graft_entry__ import _build_case
from dem_engine_tpu.solver import estimate_hbm_peak

for n, cap in ((262144, 3145728), (1048576, 9437184)):
    cfg, state, params = _build_case(n_clumps=n, cap_ss=cap, uniq_cap=512)
    cfg = dataclasses.replace(cfg, use_pallas_sweep=True,
                              use_fused_force=True, use_pallas_reduce=True)
    gb = lambda x: round(x / 2**30, 2)
    for uc in (512, 0):
        c2 = dataclasses.replace(cfg, uniq_cap=uc)
        m = estimate_hbm_peak(state, c2)
        print(n, "cap", cap, "uniq", uc,
              {k: gb(v) for k, v in m.items()}, flush=True)
