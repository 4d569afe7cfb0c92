"""CSV path loading.

The tracking scripts read ``lane_change.csv`` / ``traj*.csv`` / ``out*.csv``
(columns x, y, uref) and the recorded closed-loop runs ``dados*.csv``
(``Trajectory Tracking/Trajectory_tracking_le_LTI.py:12-15``,
``leitura.py:14-20``, ``leitordados.py:14-37``).  The originals live in the
read-only reference checkout; we load them from there when present and fall
back to synthetic generators (``trajectories.py``) otherwise, so the framework
is self-contained.
"""
from __future__ import annotations

import os
from pathlib import Path

import numpy as np

_DEF_DIRS = (
    os.environ.get("MPC_VERDE_REFERENCE_DIR", ""),
    "/root/reference/Trajectory Tracking",
)


def reference_data_dir() -> Path | None:
    for d in _DEF_DIRS:
        if d and Path(d).is_dir():
            return Path(d)
    return None


def load_path_csv(name_or_path: str):
    """Load a path CSV with columns (x, y, uref) as float arrays.

    ``name_or_path`` may be an absolute path or a bare name like
    ``"lane_change.csv"`` resolved against the reference data dir.
    Returns dict with keys x, y, uref.
    """
    p = Path(name_or_path)
    if not p.is_file():
        base = reference_data_dir()
        if base is None:
            raise FileNotFoundError(
                f"{name_or_path} not found and no reference data dir available; "
                "use refgen.synthetic_lane_change() for a self-contained path"
            )
        p = base / name_or_path
    import pandas as pd

    g = pd.read_csv(p)
    cols = {c.lower(): c for c in g.columns}
    x = g[cols.get("x", g.columns[0])].to_numpy(dtype=float)
    y = g[cols.get("y", g.columns[1])].to_numpy(dtype=float)
    if "uref" in cols:
        uref = g[cols["uref"]].to_numpy(dtype=float)
    else:
        uref = np.full_like(x, 0.4)
    return {"x": x, "y": y, "uref": uref}
