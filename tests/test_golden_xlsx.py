"""Parity against the reference's *committed IPOPT trajectories*.

``Casadi/1exemplo.xlsx`` (multiple shooting) and ``2exemplo.xlsx`` (single
shooting RK4) are closed-loop runs produced by CasADi+IPOPT and committed to
the reference repo (written at ``multiple_shooting_casadi.py:334`` and
``single_shooting_v2.py:301``).  Both use the RK4(M=4) transcription with the
Lagrange cost integrated by the same RK4 stages, plant = controller model.

Our box-DDP solver in the same transcription must reproduce those IPOPT
closed loops.  Observed agreement: states < 1e-6, controls < 1e-5 across the
whole 84-step run — three orders tighter than the 1e-3 acceptance bound.

Golden layout note: the xlsx state columns carry a duplicated initial row
(frame 0 is the pre-loop ``repmat(state_init)`` — ``multiple_shooting_casadi
.py:217``), so golden row k+1 equals closed-loop state k.
"""
from pathlib import Path

import numpy as np
import pytest

GOLD_DIR = Path("/root/reference/Casadi")
PEND = Path("/root/reference/Inverted_pendulum/Pend_data.xlsx")

pytestmark = pytest.mark.skipif(
    not GOLD_DIR.is_dir(), reason="reference checkout not available")


@pytest.fixture(scope="module")
def golden_run():
    from mpc_verde_tpu.refgen.xlsx import read_xlsx
    from mpc_verde_tpu.scenarios.diffdrive import build_diffdrive, run_diffdrive

    g1 = read_xlsx(str(GOLD_DIR / "1exemplo.xlsx"))
    n = len(g1["x"])
    b = build_diffdrive(cost="quadrature", plant="rk4", M=4,
                        n_steps=n - 1, max_iters=80)
    m = run_diffdrive(b)
    return g1, m


@pytest.mark.slow
def test_closed_loop_states_match_ipopt_multiple_shooting(golden_run):
    g, m = golden_run
    xs = np.array(m["result"].xs)
    n = len(g["x"])
    for k, col in [("x", 0), ("y", 1), ("theta", 2)]:
        d = np.abs(xs[: n - 1, col] - g[k][1:n])
        assert d.max() < 1e-5, (k, d.max())


@pytest.mark.slow
def test_closed_loop_controls_match_ipopt(golden_run):
    g, m = golden_run
    us = np.array(m["result"].us)
    for k, col in [("v", 0), ("w", 1)]:
        gold = g[k][: len(us)]
        d = np.abs(us[: len(gold), col] - gold)
        assert d.max() < 1e-3, (k, d.max())       # BASELINE acceptance
        assert d.max() < 1e-4, (k, d.max())       # actual margin is ~3e-6


@pytest.mark.slow
def test_single_vs_multiple_shooting_goldens_agree(golden_run):
    """difference.py's own check, reproduced through our reader: the two
    IPOPT transcriptions agree, and we agree with both."""
    from mpc_verde_tpu.refgen.xlsx import read_xlsx

    g1, m = golden_run
    g2 = read_xlsx(str(GOLD_DIR / "2exemplo.xlsx"))
    us = np.array(m["result"].us)
    assert np.abs(g1["v"] - g2["v"]).max() < 1e-6
    d = np.abs(us[: len(g2["v"]), 0] - g2["v"][: len(us)])
    assert d.max() < 1e-4


@pytest.mark.slow
@pytest.mark.skipif(not PEND.is_file(), reason="pendulum golden missing")
def test_pendulum_matches_matlab_golden_numerically():
    """MATLAB MPC-toolbox golden (Pend_data.xlsx), compared on the exact
    subsampled grid the reference's ploting.py uses (rows 1001:12150:11,
    last 13 dropped — ploting.py:14-21).

    The MATLAB controller is a *different* MPC implementation (MATLAB MPC
    toolbox vs the reference's mpctools QP), so trajectory-level parity is
    not expected — the reference itself only overlays plots.  The asserted
    bounds are the MEASURED agreement of our run with the MATLAB golden
    (2026-08-20, f64 CPU), with ~20% margin:

      state      max|diff|  mean|diff|   (signal scale)
      x          2.085      0.847        9.98
      theta      0.363      0.050        0.68
      final cart position gap: 0.143

    Regressions in our controller (different tuning, broken move blocking)
    move these by integer factors; the margins absorb solver-level noise.
    """
    import numpy as np

    from mpc_verde_tpu.refgen.xlsx import read_xlsx
    from mpc_verde_tpu.scenarios.pendulum import build_pendulum, run_pendulum

    g = read_xlsx(str(PEND))
    assert abs(g["x"][-1] - 10.0) < 1.0  # sanity on the golden itself

    def sub(col):
        v = np.asarray(g[col])[1001:12150:11]
        return v[:-13]

    m = run_pendulum(build_pendulum(n_steps=1000))
    x = m["x"]
    n = min(len(sub("x")), len(x))
    dx = np.abs(x[:n, 0] - sub("x")[:n])
    dth = np.abs(x[:n, 2] - sub("theta")[:n])
    assert dx.max() < 2.5 and dx.mean() < 1.0, (dx.max(), dx.mean())
    assert dth.max() < 0.45 and dth.mean() < 0.08, (dth.max(), dth.mean())
    assert abs(x[-1, 0] - sub("x")[-1]) < 0.25   # settled within 25 cm
    assert m["max_angle"] < 1.0
