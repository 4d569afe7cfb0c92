"""Batched tuning sweep (Phiref harness analogue)."""
import numpy as np
import pytest

from mpc_verde_tpu.sweep import sweep_lane_change


@pytest.mark.slow
def test_sweep_runs_all_configs():
    rows = sweep_lane_change(q_y_values=(0.1, 10.0), horizons=(3, 5),
                             n_steps=120)
    assert len(rows) == 4
    for r in rows:
        assert r["converged_frac"] == 1.0
        assert np.isfinite(r["mean_path_dist"])
    # metrics vary across horizons at least in iteration structure; sanity:
    horizons = sorted({r["horizon"] for r in rows})
    assert horizons == [3, 5]
