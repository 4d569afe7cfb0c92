"""Headless smoke tests for the viz layer (plots + animation)."""
import matplotlib

matplotlib.use("Agg")

import numpy as np

from mpc_verde_tpu.viz import mpcplot, showandsave, simulate, tracking_dashboard


def test_mpcplot_and_save(tmp_path, rng):
    x = rng.normal(size=(30, 3))
    u = rng.normal(size=(29, 2))
    t = np.arange(30) * 0.2
    fig = mpcplot(x, u, t, xnames=["x", "y", "theta"], unames=["v", "w"])
    out = showandsave(fig, str(tmp_path / "run.pdf"))
    assert (tmp_path / "run.pdf").stat().st_size > 0


def test_tracking_dashboard(rng):
    t = np.arange(50) * 0.05
    x = rng.normal(size=(50, 3))
    refs = x + 0.1
    u = rng.normal(size=(49, 1))
    fig = tracking_dashboard(t, x, refs, u,
                             traj_actual=(t, x[:, 0]), traj_ref=(t, refs[:, 0]))
    assert fig is not None


def test_animation_renders(tmp_path, rng):
    n_frames, N = 6, 5
    cat_states = rng.normal(size=(3, N + 1, n_frames))
    cat_controls = rng.normal(size=(n_frames, 2))
    anim = simulate(cat_states, cat_controls, None, 0.2, N,
                    np.array([0, 0, 0, 5.0, 5.0, 0.0]), save=True,
                    filename=str(tmp_path / "a.gif"), interval_ms=50)
    assert (tmp_path / "a.gif").stat().st_size > 0
