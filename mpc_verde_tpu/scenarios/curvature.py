"""Curvature-cost LTV tracker — Trajectory Tracking/test.py.

Constants (:19-30): L=3.5, Delta=0.05, Nt=20, Ntu=3 (move blocking), LTV
lateral-error model (y, phi, r) rebuilt from the path speed c[t]
(ar=-23.55, br=61.99), steering bounds +-20 (inactive), uprev=0.  Stage cost
(:46-54):

    lambda2 (y - y_t)^2 + lambda3 (phi - phi_t)^2
      + lambda1 (r * Rt - v_des)^2 + Rt * z^2,   z = tan(delta) - L kappa_t

with Rt = 1/kappa_t (the script *shadows* the weight ``R = 10`` with the turn
radius inside ``lfunc`` — reproduced faithfully).  Reference-synthesis quirk:
the script writes v_des into p[:,2] and curvature into p[:,3] while the cost
reads (kappa, vdes) in the opposite order (:48-50 vs :96-103); we use the
cost's ordering (y_t, phi_t, kappa_t, v_des) with correctly-routed data, which
is the only self-consistent reading.
"""
from __future__ import annotations

import numpy as np

SPEC = dict(T=0.05, N=20, Ntu=3, L=3.5, lambda1=2.5, lambda2=1.75,
            lambda3=2.5, delta_max=20.0, ar=-23.55, br=61.99)


def build_curvature_ltv(path=None, n_steps=None, max_iters: int = 30):
    import jax
    import jax.numpy as jnp

    import mpc_verde_tpu as mv
    from mpc_verde_tpu.models import lateral_error_ltv_coeffs
    from mpc_verde_tpu.ops import c2d
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
    c = np.asarray(path["uref"], float)

    phi_r = path_heading(xr, yr)
    ddx = np.zeros_like(xr); ddy = np.zeros_like(yr)
    ddx[1:-1] = (xr[:-2] - 2 * xr[1:-1] + xr[2:]) / T**2
    ddy[1:-1] = (yr[:-2] - 2 * yr[1:-1] + yr[2:]) / T**2
    kappa = np.hypot(ddx, ddy)
    kappa[:2] = 1.0
    kappa[-1] = kappa[-2]
    # guard: the cost divides by kappa (turn radius); keep it bounded away
    # from zero exactly as the reference's fallback value 1.0 does
    kappa = np.maximum(kappa, 1e-3)

    # full-path table so the horizon peeks past Nsim (see frenet.py)
    refs_full = np.stack([yr, phi_r, kappa, c], axis=-1)  # (y, phi, kappa, vdes)
    refs = refs_full[:Nsim]

    speeds = c[:Nsim]
    Acs, Bc = lateral_error_ltv_coeffs(jnp.asarray(speeds), s["ar"], s["br"])
    Acs = jnp.moveaxis(Acs, -1, 0)
    Bcs = jnp.broadcast_to(jnp.asarray(Bc), (Nsim, 3, 1))
    Ads, Bds = jax.vmap(lambda A, B: c2d(A, B, T))(Acs, Bcs)

    lam1, lam2, lam3 = s["lambda1"], s["lambda2"], s["lambda3"]

    # params: [y_t, phi_t, kappa_t, v_des, vec(Ad) 9, Bd 3]
    def dyn(x, u, p):
        A = p[4:13].reshape(3, 3)
        B = p[13:16]
        return A @ x + B * u[0]

    def l(x, u, p, du):
        y, phi, r = x[0], x[1], x[2]
        yt, phit, kappat, vdes = p[0], p[1], p[2], p[3]
        Rt = 1.0 / kappat
        z = jnp.tan(u[0]) - L * kappat
        return (lam2 * (y - yt) ** 2 + lam3 * (phi - phit) ** 2
                + lam1 * (r * Rt - vdes) ** 2 + Rt * z * z)

    du_lb = np.zeros((N, 1)); du_ub = np.zeros((N, 1))
    du_lb[: s["Ntu"]] = -np.inf; du_ub[: s["Ntu"]] = np.inf

    ocp = mv.to_rate_form(
        dyn, l, N=N, nx=3, nu=1, npar=16,
        u_lb=jnp.array([-s["delta_max"]]), u_ub=jnp.array([s["delta_max"]]),
        du_lb=du_lb, du_ub=du_ub)
    solve = mv.make_ilqr_solver(ocp, mv.ILQROptions(max_iters=max_iters))

    ref_par = stage_param_tensor(refs_full, N + 1, Nsim)
    mats = np.concatenate([np.asarray(Ads).reshape(Nsim, 9),
                           np.asarray(Bds).reshape(Nsim, 3)], axis=1)
    par = np.concatenate([
        ref_par, np.broadcast_to(mats[:, None, :], (Nsim, N + 1, 12))], axis=2)

    def plant(z, w, pp):
        x, u_prev = z[:3], z[3:]
        u = u_prev + w
        A = pp[:9].reshape(3, 3)
        B = pp[9:12]
        return jnp.concatenate([A @ x + B * u[0], u])

    run = jax.jit(make_receding_horizon(ocp, solve, plant, Nsim))
    return {"ocp": ocp, "solve": solve, "run": run, "spec": s, "path": path,
            "params_seq": par, "plant_params": mats, "refs": refs,
            "n_steps": Nsim}


def run_curvature_ltv(built=None, **kw):
    import jax.numpy as jnp

    if built is None:
        built = build_curvature_ltv(**kw)
    Nsim = built["n_steps"]
    res = built["run"](jnp.zeros(4), jnp.asarray(built["params_seq"]),
                       jnp.asarray(built["plant_params"]))
    zs = np.array(res.xs)
    xs = zs[:, :3]
    refs = built["refs"]
    err_y = xs[:Nsim, 0] - refs[:, 0]
    err_phi = xs[:Nsim, 1] - refs[:, 1]
    return {
        "result": res, "x": xs,
        "mse_y": float((err_y ** 2).mean()),
        "mse_phi": float((err_phi ** 2).mean()),
        "converged_frac": float(np.array(res.converged).mean()),
    }
