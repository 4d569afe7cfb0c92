"""Reference generation: circular params, courses, synthesis pipeline."""
import numpy as np

from mpc_verde_tpu.refgen import (
    circular_reference_params,
    synthetic_lane_change,
    extend_lane_change_course,
    double_lane_change_course,
    lateral_error_references,
    path_heading,
    stage_param_tensor,
)


def test_circular_params_match_reference_loop():
    """Vectorized tensor == the literal triple loop of
    Trajectory_tracking.py:88-97."""
    Delta, Nt, Nsim = 0.2, 10, 50
    times = Delta * Nsim * np.linspace(0, 1, Nsim + 1)
    par = circular_reference_params(times[:Nsim], Nt, Delta)

    ref = np.zeros((Nsim, Nt, 5))
    for t in range(Nsim):
        for k in range(Nt):
            tp = times[t] + times[k]
            ref[t, k] = [np.cos(0.1 * tp), np.sin(0.1 * tp),
                         np.pi / 2 + 0.1 * tp, 1.0, 1.0]
    assert np.allclose(par, ref, atol=1e-12)


def test_synthetic_lane_change_shape():
    p = synthetic_lane_change(n=500)
    assert p["x"].shape == (500,)
    assert abs(p["y"][-1] - 3.0) < 1e-9
    assert p["y"][0] == 0.0
    assert np.all(np.diff(p["x"]) > 0)


def test_courses_are_continuous():
    for course in (extend_lane_change_course(), double_lane_change_course()):
        dx = np.hypot(np.diff(course["x"]), np.diff(course["y"]))
        assert dx.max() < 0.2, "course has a jump"
        assert course["uref"].shape == course["x"].shape


def test_path_heading_unwrap():
    """The reference's +2pi rule maps negative atan2 angles into [0, 2pi),
    keeping loop headings continuous through the pi crossing
    (lane_change.py:59-67)."""
    th = np.linspace(0, 1.5 * np.pi, 150)  # three-quarter loop crosses pi
    x, y = np.cos(th), np.sin(th)
    phi = path_heading(x, y, unwrap=True)
    assert phi.min() >= 0.0
    # headings continuous after the first sample (phi[0] is defined as 0)
    assert np.abs(np.diff(phi[1:])).max() < 0.5


def test_lateral_error_reference_consistency():
    """r_ref/delta_ref from a path with analytically known heading.

    Path with heading phi(s) = 0.3 sin(w t): r_ref must match phi' and
    delta_ref must satisfy br*delta + ar*r = phi'' to finite-difference
    accuracy."""
    dt = 0.05
    t = np.arange(400) * dt
    w = 0.7
    phi_true = 0.3 * np.sin(w * t)
    v = 1.0
    x = np.concatenate([[0.0], np.cumsum(v * np.cos(phi_true[:-1]) * dt)])
    y = np.concatenate([[0.0], np.cumsum(v * np.sin(phi_true[:-1]) * dt)])
    refs = lateral_error_references({"x": x, "y": y}, dt)
    _, phi, r, delta = refs.T
    ar, br = -23.55, 61.99
    # interior samples: r == phi' and the model identity holds
    rd_true = 0.3 * w * np.cos(w * t)
    assert np.abs(r[5:-5] - rd_true[5:-5]).max() < 2e-2
    recon = ar * r + br * delta
    phidd_true = -0.3 * w * w * np.sin(w * t)
    assert np.abs(recon[5:-5] - phidd_true[5:-5]).max() < 5e-2


def test_stage_param_tensor_clamps():
    refs = np.arange(10)[:, None].astype(float)
    t = stage_param_tensor(refs, Nt=4)
    assert t.shape == (10, 4, 1)
    assert t[0, 0, 0] == 0 and t[0, 3, 0] == 3
    assert t[8, 3, 0] == 9 and t[9, 3, 0] == 9
