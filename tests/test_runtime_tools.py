"""Export/compare/checkpoint runtime tooling."""
import numpy as np
import pytest

from mpc_verde_tpu.runtime.export import (compare_runs, export_diffdrive_run,
                                          export_lane_change_run, load_run)
from mpc_verde_tpu.runtime.checkpoint import (SegmentedRun, load_checkpoint,
                                              save_checkpoint)


def test_export_and_compare_roundtrip(tmp_path, rng):
    xs = rng.normal(size=(21, 3))
    us = rng.normal(size=(20, 2))
    p1 = export_diffdrive_run(str(tmp_path / "a.csv"), xs, us, 0.2)
    p2 = export_diffdrive_run(str(tmp_path / "b.csv"), xs + 1e-12, us, 0.2)
    a, b = load_run(p1), load_run(p2)
    assert list(a.columns) == ["x", "y", "theta", "v", "w", "t"]
    d = compare_runs(a, b)
    assert all(v["rounded_nonzero"] == 0 for v in d.values())
    assert d["x"]["max_abs_diff"] < 1e-9


def test_export_xlsx_roundtrip(tmp_path, rng):
    """VERDICT r3 #9: runs export to .xlsx (the reference's 2exemplo.xlsx
    format, Casadi/single_shooting_v2.py:292-301) and round-trip through the
    stdlib reader, index column and NaN cells included."""
    from mpc_verde_tpu.refgen.xlsx import read_xlsx, write_xlsx

    xs = rng.normal(size=(21, 3))
    us = rng.normal(size=(20, 2))
    p = export_diffdrive_run(str(tmp_path / "2exemplo.xlsx"), xs, us, 0.2)
    df = load_run(p)
    # pandas-to_excel shape: leading unnamed index column, then the data
    assert list(df.columns) == ["", "x", "y", "theta", "v", "w", "t"]
    np.testing.assert_allclose(df["x"], xs[:21, 0], rtol=0, atol=0)
    np.testing.assert_allclose(df["t"], np.arange(21) * 0.2, atol=1e-15)
    np.testing.assert_array_equal(df[""], np.arange(21))

    # direct writer round-trip incl. NaN -> empty cell -> NaN
    cols = {"a": np.array([1.5, np.nan, -3.0]),
            "b": np.array([0.0, 2.0**-30, 1e300])}
    q = write_xlsx(str(tmp_path / "rt.xlsx"), cols, index=False)
    back = read_xlsx(q)
    np.testing.assert_array_equal(np.isnan(back["a"]), [False, True, False])
    np.testing.assert_allclose(back["a"][[0, 2]], [1.5, -3.0], rtol=0)
    np.testing.assert_allclose(back["b"], cols["b"], rtol=0)  # repr exact


def test_export_lane_change_layout(tmp_path, rng):
    xs = rng.normal(size=(31, 3))
    us = rng.normal(size=(30, 1))
    refs = rng.normal(size=(30, 4))
    traj = (rng.normal(size=40), rng.normal(size=40))
    p = export_lane_change_run(str(tmp_path / "dados2.csv"), xs, us, traj, refs)
    df = load_run(p)
    assert list(df.columns) == ["x1", "x2", "x3", "u", "x", "y", "yref",
                                "phiref", "rref", "deltaref"]
    assert len(df) == 30


def test_checkpoint_roundtrip(tmp_path, rng):
    state = {"step": np.int64(7), "x": rng.normal(size=3),
             "warm": rng.normal(size=(5, 2)),
             "hist_xs": rng.normal(size=(7, 3)),
             "hist_us": rng.normal(size=(7, 2)),
             "hist_conv": np.ones(7, bool)}
    p = save_checkpoint(str(tmp_path / "ck.npz"), state)
    back = load_checkpoint(p)
    for k in state:
        assert np.array_equal(back[k], np.asarray(state[k])), k


@pytest.mark.slow
def test_segmented_run_matches_monolithic(tmp_path):
    import jax
    import jax.numpy as jnp

    from mpc_verde_tpu.scenarios.diffdrive import build_diffdrive
    from mpc_verde_tpu.runtime import make_receding_horizon
    from mpc_verde_tpu.models import unicycle
    from mpc_verde_tpu.ops import euler_step

    b = build_diffdrive(n_steps=24)
    plant = euler_step(unicycle.f, 0.2)

    def make_runner(n):
        return jax.jit(make_receding_horizon(
            b["ocp"], b["solve"], lambda x, u, pp: plant(x, u, None), n))

    params = np.broadcast_to(np.array([10.0, 10.0, 0.0]), (24, 11, 3))
    mono = make_runner(24)(jnp.zeros(3), jnp.asarray(params))
    seg = SegmentedRun(make_runner, segment_steps=8,
                       checkpoint_path=str(tmp_path / "run.npz"))
    out = seg.run(np.zeros(3), params, resume=False)
    assert np.allclose(out["xs"], np.array(mono.xs), atol=1e-12)
    assert np.allclose(out["us"], np.array(mono.us), atol=1e-12)
