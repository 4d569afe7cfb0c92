"""Dynamic bicycle LTV tracking — Trajectory_tracking_dynamic_model.py.

Constants (:18-45): Delta=0.05, Nt=10, Ntu=10, 4 states (y, phi, v_lat, r),
1 control (steering), Q=eye(4), R=1, delta bounds +-20, physical parameters
m=1200, a=1.5, b=2, Ca=55000, Jz=1350.  The A/B coefficients are rebuilt from
the time-varying speed vref[t] each step (:119-128).

The committed reference has an ordering bug — the reference-synthesis loop
uses A33/A34/B31 before their first assignment (:107,110,115 vs :119-123), so
the script raises NameError when run fresh (SURVEY.md §2.1).  Here the
coefficients are computed *before* synthesizing delta_ref, which is the only
ordering under which the program is well-defined.
"""
from __future__ import annotations

import numpy as np

SPEC = dict(T=0.05, N=10, Ntu=10, Q=(1.0, 1.0, 1.0, 1.0), R=1.0,
            delta_max=20.0, m=1200.0, a=1.5, b=2.0, Ca=55000.0, Jz=1350.0)


def build_dynamic_bicycle(path=None, n_steps=None, max_iters: int = 30,
                          corrected: bool = False):
    """``corrected=True`` replaces the reference's reference-synthesis quirks
    (phi_ref = atan2(y, x) position angle :97-99; forward speed tracked as
    the lateral-velocity state) with consistent references: path-heading
    phi_ref, v_lat_ref = 0, r_ref = dphi/dt — the controller then tracks the
    lane change cleanly, isolating the reference script's synthesis bug from
    the solver."""
    import jax
    import jax.numpy as jnp

    import mpc_verde_tpu as mv
    from mpc_verde_tpu.models import dynamic_bicycle_coeffs
    from mpc_verde_tpu.ops import c2d
    from mpc_verde_tpu.refgen import (path_heading, stage_param_tensor,
                                      synthetic_lane_change)
    from mpc_verde_tpu.runtime import make_receding_horizon

    s = dict(SPEC)
    if path is None:
        path = synthetic_lane_change(n=500, dt=s["T"])
    Nsim = len(path["x"]) if n_steps is None else n_steps
    N, T = s["N"], s["T"]

    xr = np.asarray(path["x"], float)
    yr = np.asarray(path["y"], float)
    vr = np.asarray(path["uref"], float)
    Nfull = len(xr)

    # coefficients first (bug fix), vectorized over the run
    A33 = -4 * s["Ca"] / (s["m"] * vr)
    A34 = (2 * s["Ca"] * (s["b"] - s["a"]) / s["m"] * vr) - vr
    B31 = 2 * s["Ca"] / s["m"]

    # reference synthesis: y_ref, phi_ref = atan2(y, x) (the reference's
    # literal position-angle form :97-99), v_ref, then r_ref / delta_ref by
    # finite differences inverted through the model (:100-115)
    if corrected:
        from mpc_verde_tpu.refgen import path_heading as _heading

        phi_r = _heading(xr, yr)
    else:
        phi_r = np.arctan2(yr, xr)
        phi_r[0] = 0.0
    r_r = np.zeros(Nfull)
    r_r[1:-1] = (phi_r[2:] - phi_r[:-2]) / (2 * T)
    r_r[0] = (phi_r[1] - phi_r[0]) / T
    r_r[-1] = (phi_r[-1] - phi_r[-2]) / T
    v_dot = np.gradient(vr, T)
    if corrected:
        # lateral velocity reference is 0 (path-frame consistency); steering
        # reference from the yaw-rate channel steady state
        vlat_r = np.zeros(Nfull)
        delta_r = np.zeros(Nfull)
    else:
        vlat_r = vr  # the reference tracks forward speed in the v_lat slot
        delta_r = (v_dot - A33 * vr - A34 * r_r) / B31

    # full-path table so the horizon peeks past Nsim (see frenet.py)
    refs_full = np.stack([yr, phi_r, vlat_r, r_r, delta_r], axis=-1)  # (Nfull, 5)
    refs = refs_full[:Nsim]

    # per-step (Ad, Bd) from the LTV coefficients, one vectorized c2d
    Acs, Bcs = dynamic_bicycle_coeffs(jnp.asarray(vr[:Nsim]), s["m"], s["a"],
                                      s["b"], s["Ca"], s["Jz"])
    Acs = jnp.moveaxis(Acs, -1, 0)                      # (Nsim, 4, 4)
    Bcs = jnp.moveaxis(Bcs, -1, 0) if Bcs.ndim == 3 else Bcs
    Bcs = jnp.reshape(Bcs, (Nsim, 4, 1))
    Ads, Bds = jax.vmap(lambda A, B: c2d(A, B, T))(Acs, Bcs)

    Q = jnp.diag(jnp.array(s["Q"]))
    R = s["R"]

    # params: [y_ref, phi_ref, v_ref, r_ref, delta_ref, vec(Ad) 16, Bd 4]
    def dyn(x, u, p):
        A = p[5:21].reshape(4, 4)
        B = p[21:25]
        return A @ x + B * u[0]

    def l(x, u, p, du):
        e = x - p[:4]
        return e @ Q @ e + R * (u[0] - p[4]) ** 2

    ocp = mv.to_rate_form(
        dyn, l, N=N, nx=4, nu=1, npar=25,
        u_lb=jnp.array([-s["delta_max"]]), u_ub=jnp.array([s["delta_max"]]))
    solve = mv.make_ilqr_solver(ocp, mv.ILQROptions(max_iters=max_iters))

    ref_par = stage_param_tensor(refs_full, N + 1, Nsim)
    mats = np.concatenate([np.asarray(Ads).reshape(Nsim, 16),
                           np.asarray(Bds).reshape(Nsim, 4)], axis=1)
    par = np.concatenate([
        ref_par, np.broadcast_to(mats[:, None, :], (Nsim, N + 1, 20))], axis=2)

    def plant(z, w, pp):
        x, u_prev = z[:4], z[4:]
        u = u_prev + w
        A = pp[:16].reshape(4, 4)
        B = pp[16:20]
        return jnp.concatenate([A @ x + B * u[0], u])

    run = jax.jit(make_receding_horizon(ocp, solve, plant, Nsim))
    return {"ocp": ocp, "solve": solve, "run": run, "spec": s, "path": path,
            "params_seq": par, "plant_params": mats, "refs": refs,
            "n_steps": Nsim}


def run_dynamic_bicycle(built=None, **kw):
    import jax.numpy as jnp

    if built is None:
        built = build_dynamic_bicycle(**kw)
    Nsim = built["n_steps"]
    res = built["run"](jnp.zeros(5), jnp.asarray(built["params_seq"]),
                       jnp.asarray(built["plant_params"]))
    zs = np.array(res.xs)
    xs = zs[:, :4]
    refs = built["refs"][:Nsim]
    err_y = xs[:Nsim, 0] - refs[:, 0]
    return {
        "result": res, "x": xs,
        "mse_y": float((err_y ** 2).mean()),
        "max_err_y": float(np.abs(err_y).max()),
        "converged_frac": float(np.array(res.converged).mean()),
    }
