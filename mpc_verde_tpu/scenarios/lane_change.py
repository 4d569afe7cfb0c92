"""LTI lateral-error lane-change tracking — Trajectory_tracking_le_LTI.py.

Constants (:17-35): Delta=0.05, Nt=5, Ntu=1 (move blocking), 3 states
(y, phi, r), 1 control (delta), Q=diag(10,1,0), R=0.01, R_du=0,
delta_max=0.3491, ar=-23.55, br=61.99, uref = mean path speed.  Stage cost
tracks per-stage params (y_ref, phi_ref, r_ref, delta_ref) synthesized from
the path by finite differences (:104-128).  Plant integrates the *continuous*
model (:44-47, :88) while the controller uses the ZOH-discretized one — the
reference's fidelity split.
"""
from __future__ import annotations

import numpy as np

from ..models.bicycle import AR_DEFAULT, BR_DEFAULT

SPEC = dict(T=0.05, N=5, Ntu=1, Q=(10.0, 1.0, 0.0), R=0.01, R_du=0.0,
            delta_max=0.3491, ar=AR_DEFAULT, br=BR_DEFAULT)


def build_lane_change_lti(path=None, n_steps=None, max_iters: int = 30,
                          N: int = None, Ntu: int = None):
    """``N``/``Ntu`` override the v2 defaults (5/1); the v1 variant
    (``Trajectory_tracking_lateral_error.py:17,61-69``) uses Nt=20, Ntu=3."""
    import jax
    import jax.numpy as jnp

    import mpc_verde_tpu as mv
    from mpc_verde_tpu.ops import c2d
    from mpc_verde_tpu.models import lateral_error_lti
    from mpc_verde_tpu.refgen import (lateral_error_references,
                                      stage_param_tensor, synthetic_lane_change)
    from mpc_verde_tpu.runtime import make_receding_horizon

    s = dict(SPEC)
    if N is not None:
        s["N"] = int(N)
    if Ntu is not None:
        s["Ntu"] = int(Ntu)
    if path is None:
        path = synthetic_lane_change(n=500, dt=s["T"])
    Nsim = len(path["x"]) if n_steps is None else n_steps
    N, T = s["N"], s["T"]

    uref = float(np.mean(path["uref"]))
    model = lateral_error_lti(uref, s["ar"], s["br"])
    Ad, Bd = c2d(model.Ac, model.Bc, T)
    Ad = jnp.asarray(Ad); Bd = jnp.asarray(Bd)

    Q = jnp.diag(jnp.array(s["Q"]))
    R, R_du = s["R"], s["R_du"]

    def l(x, u, p, du):
        e = x - p[:3]
        return e @ Q @ e + R * (u[0] - p[3]) ** 2 + R_du * du[0] ** 2

    du_lb = np.zeros((N, 1)); du_ub = np.zeros((N, 1))
    du_lb[: s["Ntu"]] = -np.inf; du_ub[: s["Ntu"]] = np.inf

    ocp = mv.to_rate_form(
        lambda x, u, p: Ad @ x + Bd @ u, l, N=N, nx=3, nu=1, npar=4,
        u_lb=jnp.array([-s["delta_max"]]), u_ub=jnp.array([s["delta_max"]]),
        du_lb=du_lb, du_ub=du_ub)
    solve = mv.make_ilqr_solver(ocp, mv.ILQROptions(max_iters=max_iters))

    # plant: continuous model, ZOH-exact for piecewise-constant steering
    Ap, Bp = Ad, Bd

    def plant(z, w, pp):
        x, u_prev = z[:3], z[3:]
        u = u_prev + w
        return jnp.concatenate([Ap @ x + Bp @ u, u])

    run = jax.jit(make_receding_horizon(
        ocp, solve, lambda z, w, pp: plant(z, w, pp), Nsim))

    refs = lateral_error_references(path, T, s["ar"], s["br"])  # (Nsim0, 4)
    par = stage_param_tensor(refs, N + 1, Nsim)                 # (Nsim, N+1, 4)
    return {"ocp": ocp, "solve": solve, "run": run, "spec": s, "path": path,
            "params_seq": par, "uref": uref, "refs": refs, "n_steps": Nsim}


def run_lane_change_lti(built=None, **kw):
    import jax.numpy as jnp

    if built is None:
        built = build_lane_change_lti(**kw)
    s = built["spec"]
    Nsim = built["n_steps"]
    z0 = jnp.zeros(4)  # x0 = 0, uprev = 0 (:77, uprev=np.array([0]))
    res = built["run"](z0, jnp.asarray(built["params_seq"]))
    zs = np.array(res.xs)
    xs = zs[:, :3]
    dus = np.array(res.us)
    us = zs[:Nsim, 3] + dus[:, 0]  # applied absolute steering

    refs = built["refs"][:Nsim]
    err = xs[:Nsim] - refs[:, :3]
    # reference metrics (:160-163): per-state MSEs and mean path distance
    mean_y = float((err[:, 0] ** 2).mean())
    mean_phi = float((err[:, 1] ** 2).mean())
    mean_r = float((err[:, 2] ** 2).mean())
    mean_delta = float(((us - refs[:, 3]) ** 2).mean())

    # actual trajectory reconstruction (:201-206)
    uref = built["uref"]
    xz = np.concatenate([[0.0], np.cumsum(uref * np.cos(xs[:-1, 1]) * s["T"])])
    yz = xs[:, 0]
    traj = np.stack([xz[:Nsim], yz[:Nsim]])
    traje = np.stack([built["path"]["x"][:Nsim], built["path"]["y"][:Nsim]])
    mean_t = float(np.linalg.norm(traj - traje, axis=0).mean())
    return {
        "result": res, "u": us, "x": xs,
        "mean_y": mean_y, "mean_phi": mean_phi, "mean_r": mean_r,
        "mean_delta": mean_delta, "mean_path_dist": mean_t,
        "converged_frac": float(np.array(res.converged).mean()),
    }
