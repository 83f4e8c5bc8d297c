"""Drawbar-pull slip sweep — DEMdemo_WheelDPSimplified (reference
src/demo/DEMdemo_WheelDPSimplified.cpp): the simplified cylindrical wheel
of wheel_dp driven at several imposed slips; drawbar pull must increase
with slip (the signature terramechanics curve, CPC paper fig. set)."""

import numpy as np

from wheel_dp import build


def run_slip(slip, sim_time=0.6, settle=0.2):
    solver, tracker, n = build(verbosity="QUIET", slip=slip)
    solver.DoDynamics(settle)
    fx_acc, k = 0.0, 0
    t = 0.0
    while t < sim_time:
        solver.DoDynamics(0.05)
        t += 0.05
        pts, fs = tracker.GetContactForces()
        fx_acc += fs[:, 0].sum() if len(fs) else 0.0
        k += 1
    return fx_acc / max(k, 1)


def main(slips=(0.0, 0.2, 0.5)):
    out = []
    for sl in slips:
        dp = run_slip(sl)
        out.append((sl, dp))
        print(f"slip {sl:.1f} -> mean drawbar pull {dp:.3f} N")
    return out


if __name__ == "__main__":
    main()
