"""ProfileStageTimings: the per-stage named-timer table (reference
SolverTimers, kT.h:204-206 / dT.h:294-297) measured via prefix programs."""

import numpy as np

import dem_engine_tpu as dem


def _small_scene():
    s = dem.DEMSolver()
    s.SetVerbosity("QUIET")
    s.InstructBoxDomainDimension(1.0, 1.0, 1.0)
    mat = s.LoadMaterial({"E": 1e7, "nu": 0.3, "CoR": 0.5, "mu": 0.3,
                          "Crr": 0.0})
    r = 0.02
    t = s.LoadSphereType(0.1, r, mat)
    xs = np.linspace(-0.3, 0.3, 6)
    pts = np.stack(np.meshgrid(xs, xs, [0.0, 2.1 * r]), axis=-1
                   ).reshape(-1, 3)
    s.AddClumps(t, pts)
    s.AddBCPlane([0, 0, -0.05], [0, 0, 1], mat)
    s.SetInitTimeStep(5e-6)
    s.SetGravitationalAcceleration([0, 0, -9.81])
    s.Initialize()
    return s


def test_profile_stage_timings_keys_and_print(capsys):
    s = _small_scene()
    s.DoDynamics(2e-4)
    stages = s.ProfileStageTimings(reps=1)
    # kT stage names (reference kT.h:204-206) on the single-grid path
    for k in ("Discretize domain", "Find contact pairs",
              "Build history map", "kT total (refresh)"):
        assert k in stages, sorted(stages)
    # dT stage names (reference dT.h:294-297)
    assert "Optional force reduction" in stages
    assert "Integration" in stages
    assert any(k.startswith("Calculate contact forces") for k in stages)
    assert all(np.isfinite(v) and v >= 0.0 for v in stages.values())
    # totals bound their parts (diffs are clamped >= 0, totals measured)
    assert stages["kT total (refresh)"] > 0.0
    assert stages["dT total (one step)"] > 0.0
    out = capsys.readouterr().out
    assert "Find contact pairs" in out
    # ShowTimingStats appends the cached stage table
    s.ShowTimingStats()
    out = capsys.readouterr().out
    assert "stage timers" in out
