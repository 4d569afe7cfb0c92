"""Closed-loop run export/import in the reference's table formats.

The reference dumps trajectories for later comparison:
  * diff-drive runs: columns (x, y, theta, v, w, t) to ``1/2/3exemplo.xlsx``
    (``Casadi/single_shooting_v2.py:292-301``,
    ``mpctools/multiple_shooting_mpctools.py:141-150``)
  * pendulum: (x, x_dot, theta, theta_dot, u, t)
    (``Inverted_pendulum/...mpctools.py:80-88``)
  * lane-change closed loops: ``dados2.csv`` = [x1, x2, x3, u, x, y, yref,
    phiref, rref, deltaref] (``Trajectory Tracking/Phiref.py:379-381``)

Paths ending in ``.xlsx`` are written with the stdlib writer
(``refgen.xlsx.write_xlsx``) in the reference's pandas ``to_excel`` shape
(leading unnamed index column); anything else is CSV with the same columns —
``leitordados.py``-style comparison reads either.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from ..refgen.xlsx import read_xlsx, write_xlsx


def _write_table(path: str, cols: dict):
    if str(path).endswith(".xlsx"):
        # index column matches the committed exemplo goldens' layout
        # (Casadi/single_shooting_v2.py:292-301 uses the to_excel default)
        write_xlsx(path, cols, index=True)
    else:
        pd.DataFrame(cols).to_csv(path, index=False)
    return path


def export_run(path: str, xs, us, times, state_names=None, control_names=None):
    """Write a closed-loop run as a flat table (one row per step)."""
    xs = np.asarray(xs)
    us = np.asarray(us)
    times = np.asarray(times)
    n = len(us)
    cols = {}
    snames = state_names or [f"x{i}" for i in range(xs.shape[1])]
    unames = control_names or [f"u{i}" for i in range(us.shape[1] if us.ndim > 1 else 1)]
    us2 = us.reshape(n, -1)
    for i, s in enumerate(snames):
        cols[s] = xs[: n + 1, i]
    for i, c in enumerate(unames):
        cols[c] = np.append(us2[:, i], us2[-1, i])
    cols["t"] = times[: n + 1]
    return _write_table(path, cols)


def export_diffdrive_run(path: str, xs, us, T: float):
    """(x, y, theta, v, w, t) — the exemplo table layout."""
    n = len(np.asarray(us))
    times = np.arange(n + 1) * T
    return export_run(path, xs, us, times,
                      state_names=["x", "y", "theta"], control_names=["v", "w"])


def export_lane_change_run(path: str, xs, us, traj_xy, refs):
    """``dados2.csv`` layout: x1,x2,x3,u,x,y,yref,phiref,rref,deltaref
    (``Phiref.py:379-381``)."""
    xs = np.asarray(xs); us = np.asarray(us).reshape(len(us), -1)
    n = len(us)
    refs = np.asarray(refs)[:n]
    return _write_table(path, {
        "x1": xs[1: n + 1, 0], "x2": xs[1: n + 1, 1], "x3": xs[1: n + 1, 2],
        "u": us[:, 0],
        "x": np.asarray(traj_xy[0])[:n], "y": np.asarray(traj_xy[1])[:n],
        "yref": refs[:, 0], "phiref": refs[:, 1],
        "rref": refs[:, 2], "deltaref": refs[:, 3],
    })


def load_run(path: str) -> pd.DataFrame:
    """Read a run table: csv, .xlsx via the stdlib reader, legacy Excel
    (.xls/.xlsm) via pandas where an engine is available."""
    p = str(path)
    if p.endswith(".xlsx"):
        return pd.DataFrame(read_xlsx(p))
    if p.endswith((".xls", ".xlsm")):
        return pd.read_excel(p)
    if p.endswith(".csv"):
        return pd.read_csv(p)
    raise ValueError(
        f"load_run: unrecognized extension on {p!r}; supported formats are "
        ".csv, .xlsx, .xls, .xlsm")


def compare_runs(run_a: pd.DataFrame, run_b: pd.DataFrame, columns=None,
                 decimals: int = 0):
    """``difference.py``-style agreement check: rounded per-column deltas
    (``Casadi/difference.py:604-619`` prints ``np.around(a1 - a2)``).

    Returns dict column -> (max_abs_diff, rounded_diff_nonzero_count).
    """
    out = {}
    cols = columns or [c for c in run_a.columns if c in run_b.columns]
    for c in cols:
        n = min(len(run_a), len(run_b))
        d = np.asarray(run_a[c])[:n] - np.asarray(run_b[c])[:n]
        out[c] = {
            "max_abs_diff": float(np.abs(d).max()),
            "rounded_nonzero": int(np.count_nonzero(np.around(d, decimals))),
        }
    return out
