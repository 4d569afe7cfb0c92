"""Method-vs-method agreement checks — the ``Casadi/difference.py`` analogue.

The reference validates by running single-shooting-RK4 and multiple-shooting
back-to-back and printing rounded trajectory deltas (``difference.py:604-619``)
and by overlaying the three diff-drive solutions (``plot.py``).  Here the
comparable axes are integrator (Euler vs RK4, matching v1 vs v2) and
formulation (plain vs control-rate lifted), run through one function that
returns the same rounded-delta agreement record.
"""
from __future__ import annotations

import numpy as np

from .diffdrive import build_diffdrive, run_diffdrive


def compare_diffdrive_methods(n_steps: int = 90, decimals: int = 0):
    """Run the diff-drive closed loop under each method pair and diff.

    Returns dict with per-method metrics and pairwise rounded deltas of the
    state/control histories (the reference's ``np.around(a1 - a2)`` check).
    """
    runs = {}
    for name, kw in {
        "euler": dict(integrator="euler"),
        "rk4": dict(integrator="rk4"),
    }.items():
        m = run_diffdrive(build_diffdrive(n_steps=n_steps, **kw))
        runs[name] = {
            "xs": np.asarray(m["result"].xs),
            "us": np.asarray(m["result"].us),
            "steps_to_target": m["steps_to_target"],
            "ss_error": m["ss_error"],
        }

    names = list(runs)
    deltas = {}
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = runs[names[i]], runs[names[j]]
            dx = a["xs"] - b["xs"]
            du = a["us"] - b["us"]
            deltas[f"{names[i]}-{names[j]}"] = {
                "x_max_abs": float(np.abs(dx).max()),
                "u_max_abs": float(np.abs(du).max()),
                "x_rounded_nonzero": int(np.count_nonzero(np.around(dx, decimals))),
                "u_rounded_nonzero": int(np.count_nonzero(np.around(du, decimals))),
            }
    return {"runs": {k: {kk: vv for kk, vv in v.items() if kk not in ("xs", "us")}
                     for k, v in runs.items()},
            "deltas": deltas}
