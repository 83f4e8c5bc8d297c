"""Engine degrade/adaptation events route through the DEMSolver verbosity
sink (reference leveled STEP_METRIC/ANOMALY diagnostics, Structs.h:278-365):
WARNING events surface at default verbosity, growth metrics only at
STEP_METRIC+."""

import numpy as np

import dem_engine_tpu as dem


def _scene(verbosity):
    s = dem.DEMSolver()
    s.SetVerbosity(verbosity)
    s.InstructBoxDomainDimension(1.0, 1.0, 1.0)
    mat = s.LoadMaterial({"E": 1e7, "nu": 0.3, "CoR": 0.5, "mu": 0.3,
                          "Crr": 0.0})
    t = s.LoadSphereType(0.1, 0.02, mat)
    s.AddClumps(t, np.asarray([[0, 0, 0.0], [0, 0, 0.05]]))
    s.AddBCPlane([0, 0, -0.05], [0, 0, 1], mat)
    s.SetInitTimeStep(5e-6)
    s.SetGravitationalAcceleration([0, 0, -9.81])
    s.Initialize()
    return s


def test_engine_log_wired_and_leveled(capsys):
    s = _scene("INFO")
    assert s.engine.log is not None
    # WARNING-level events surface at INFO verbosity
    s.engine._emit("WARNING", "synthetic warning event")
    out = capsys.readouterr().out
    assert "synthetic warning event" in out and "[WARNING]" in out
    # STEP_METRIC events are filtered out at INFO
    s.engine._emit("STEP_METRIC", "synthetic metric event")
    assert "synthetic metric event" not in capsys.readouterr().out


def test_step_metric_level_shows_growth_events(capsys):
    s = _scene("STEP_METRIC")
    s.engine._emit("STEP_METRIC", "growth 0x1: caps")
    assert "growth 0x1" in capsys.readouterr().out


def test_quiet_silences_everything(capsys):
    s = _scene("QUIET")
    s.engine._emit("WARNING", "should not appear")
    assert "should not appear" not in capsys.readouterr().out
