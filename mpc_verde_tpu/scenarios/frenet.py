"""Nonlinear path-frame (Frenet) MPC — Trajectory Tracking/test2.py.

Constants (:19-59): L=3.5, Delta=0.05, Nt=20, states (y, phi, v), controls
(delta, a), params (y_t, phi_t, kappa_t, v_des); cost weights lambda1=2.5
(speed), lambda2=1.75 (lateral), lambda3=2.5 (yaw), lambda4=0.4 (accel),
lambda5=10 with z = tan(delta) - L*kappa, all divided by (Nt+1); bounds
delta in +-0.384, a in +-2, steering rate Du in +-0.1225 (a free).

Curvature reference: the script stores ||(x'', y'')|| in p[k,3] and v_des in
p[k,2] (:116-119 — note the reference's own column swap vs the ode's reading
of kappa from p[2]; we keep the ode's convention: params ordered
(y_t, phi_t, kappa_t, v_des) as consumed at :103-112).
"""
from __future__ import annotations

import numpy as np

SPEC = dict(T=0.05, N=20, L=3.5,
            lambda1=2.5, lambda2=1.75, lambda3=2.5, lambda4=0.4, lambda5=10.0,
            delta_max=0.384, a_max=2.0, delta_dot_max=0.1225)


def build_frenet(path=None, n_steps=None, max_iters: int = 40):
    import jax
    import jax.numpy as jnp

    import mpc_verde_tpu as mv
    from mpc_verde_tpu.models import frenet_path_frame
    from mpc_verde_tpu.ops import DiscreteSimulator
    from mpc_verde_tpu.refgen import (path_heading, stage_param_tensor,
                                      synthetic_lane_change)
    from mpc_verde_tpu.runtime import make_receding_horizon

    s = dict(SPEC)
    if path is None:
        path = synthetic_lane_change(n=500, dt=s["T"])
    Nsim = len(path["x"]) if n_steps is None else n_steps
    N, T, L = s["N"], s["T"], s["L"]

    xr = np.asarray(path["x"], float)
    yr = np.asarray(path["y"], float)
    vdes = np.asarray(path["uref"], float)

    phi_r = path_heading(xr, yr)
    # curvature magnitude from second differences (:101-103); clamp the first
    # two samples to the reference's literal 1.0 fallback (:105-106)
    ddx = np.zeros_like(xr); ddy = np.zeros_like(yr)
    ddx[1:-1] = (xr[:-2] - 2 * xr[1:-1] + xr[2:]) / T**2
    ddy[1:-1] = (yr[:-2] - 2 * yr[1:-1] + yr[2:]) / T**2
    kappa = np.hypot(ddx, ddy)
    kappa[:2] = 1.0
    kappa[-1] = kappa[-2]

    # full-path reference table: the horizon window peeks beyond Nsim into
    # the remaining course (clamping only at the true course end), matching
    # the lane-change scenarios' semantics
    refs_full = np.stack([yr, phi_r, kappa, vdes], axis=-1)
    refs = refs_full[:Nsim]

    model = frenet_path_frame(L)

    lam1, lam2, lam3 = s["lambda1"], s["lambda2"], s["lambda3"]
    lam4, lam5 = s["lambda4"], s["lambda5"]

    def l(x, u, p, du):
        y, phi, v = x[0], x[1], x[2]
        delta, a = u[0], u[1]
        yt, phit, kappat, vdes_k = p[0], p[1], p[2], p[3]
        z = jnp.tan(delta) - L * kappat
        return (lam1 * (v - vdes_k) ** 2 + lam2 * (y - yt) ** 2
                + lam3 * (phi - phit) ** 2 + lam4 * a ** 2
                + lam5 * z ** 2) / (N + 1)

    from mpc_verde_tpu.ops import rk4_step

    F = rk4_step(model.f, T, M=1)

    du_lb = np.array([-s["delta_dot_max"], -np.inf])
    du_ub = np.array([s["delta_dot_max"], np.inf])

    ocp = mv.to_rate_form(
        lambda x, u, p: F(x, u, p), l, N=N, nx=3, nu=2, npar=4,
        u_lb=jnp.array([-s["delta_max"], -s["a_max"]]),
        u_ub=jnp.array([s["delta_max"], s["a_max"]]),
        du_lb=du_lb, du_ub=du_ub)
    solve = mv.make_ilqr_solver(ocp, mv.ILQROptions(max_iters=max_iters))

    plant = DiscreteSimulator(model, T, M=10)  # separate plant (:115)

    def plant_step(z, w, pp):
        x, u_prev = z[:3], z[3:]
        u = u_prev + w
        return jnp.concatenate([plant.sim(x, u, pp), u])

    run = jax.jit(make_receding_horizon(ocp, solve, plant_step, Nsim))
    par = stage_param_tensor(refs_full, N + 1, Nsim)
    return {"ocp": ocp, "solve": solve, "run": run, "spec": s, "path": path,
            "params_seq": par, "plant_params": np.asarray(par[:, 0, :]),
            "refs": refs, "n_steps": Nsim}


def run_frenet(built=None, **kw):
    import jax.numpy as jnp

    if built is None:
        built = build_frenet(**kw)
    s = built["spec"]
    Nsim = built["n_steps"]
    res = built["run"](jnp.zeros(5), jnp.asarray(built["params_seq"]),
                       jnp.asarray(built["plant_params"]))
    zs = np.array(res.xs)
    xs = zs[:, :3]
    refs = built["refs"]
    err_y = xs[:Nsim, 0] - refs[:, 0]
    err_v = xs[:Nsim, 2] - refs[:, 3]
    dus = np.array(res.us)
    deltas = zs[:Nsim, 3] + dus[:, 0]
    return {
        "result": res, "x": xs,
        "mse_y": float((err_y ** 2).mean()),
        "mse_v": float((err_v ** 2).mean()),
        "max_delta": float(np.abs(deltas).max()),
        "max_delta_rate": float(np.abs(dus[:, 0]).max()),
        "converged_frac": float(np.array(res.converged).mean()),
    }
