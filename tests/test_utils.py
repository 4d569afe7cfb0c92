"""Timing / profiling utilities (SURVEY.md §5.1 observability rebuild)."""
import numpy as np

from mpc_verde_tpu.utils.timing import Timer, timed
from mpc_verde_tpu.utils.profiling import SolvePhaseTimer, device_trace


def test_timer_phases_and_summary():
    t = Timer()
    for _ in range(3):
        with t.phase("solve"):
            sum(range(1000))
    with t.phase("plant"):
        pass
    s = t.summary()
    assert s["solve"]["count"] == 3
    assert s["solve"]["total_s"] >= 0.0
    assert abs(t.mean_ms("solve") - 1e3 * s["solve"]["total_s"] / 3) < 1e-9
    assert t.mean_ms("missing") == 0.0


def test_timed_contextmanager():
    with timed("block") as out:
        sum(range(1000))
    assert out["label"] == "block"
    assert out["seconds"] >= 0.0


def test_solve_phase_timer_report():
    t = SolvePhaseTimer()
    with t.phase("rollout"):
        pass
    with t.phase("backward"):
        pass
    rep = t.report()
    assert "rollout" in rep and "backward" in rep


def test_device_trace_smoke(tmp_path):
    import jax.numpy as jnp

    with device_trace(str(tmp_path / "trace")) as logdir:
        x = jnp.arange(8.0) ** 2
        float(x.sum())
    # trace directory was created and populated
    import os

    assert os.path.isdir(logdir)
    assert any(os.scandir(logdir))
