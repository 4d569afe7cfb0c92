"""Circular-track kinematic tracking — Trajectory_tracking.py family.

Constants from ``Trajectory Tracking/Trajectory_tracking.py:15-97``:
Delta=0.2, Nt=10, Q=diag(1,1,0.1), R=diag(0.5,0.05), v/omega bounds as the
diff-drive, state box x in [-20,20], y in [-2,2], reference
(cos .1t, sin .1t, pi/2+.1t, 1, 1), Nsim=500, plant = DiscreteSimulator on
the continuous model.
"""
from __future__ import annotations

import numpy as np

SPEC = dict(T=0.2, N=10, Q=(1.0, 1.0, 0.1), R=(0.5, 0.05),
            v_max=1.0, omega_max=np.pi / 4,
            x_lb=(-20.0, -2.0, -np.inf), x_ub=(20.0, 2.0, np.inf),
            x0=(0.0, 0.0, 0.0), n_steps=500)


def build_circular_tracking(n_steps: int = None, use_state_bounds: bool = True,
                            max_iters: int = 40):
    import jax
    import jax.numpy as jnp

    import mpc_verde_tpu as mv
    from mpc_verde_tpu.models import unicycle
    from mpc_verde_tpu.ops import rk4_step, DiscreteSimulator
    from mpc_verde_tpu.refgen import circular_reference_params
    from mpc_verde_tpu.runtime import make_receding_horizon

    s = dict(SPEC)
    if n_steps is not None:
        s["n_steps"] = n_steps
    Nsim, N, T = s["n_steps"], s["N"], s["T"]

    F = rk4_step(unicycle.f, T, M=1)  # getCasadiFunc(..., rk4=True, M=1) (:51)
    Q = jnp.diag(jnp.array(s["Q"]))
    R = jnp.diag(jnp.array(s["R"]))

    def l(x, u, p):
        # stage cost tracks (x_ref, u_ref) via per-stage params (:57-61)
        ex = x - p[:3]
        eu = u - p[3:5]
        return ex @ Q @ ex + eu @ R @ eu

    ocp = mv.OCP(
        dynamics=lambda x, u, p: F(x, u, p), stage_cost=l,
        N=N, nx=3, nu=2, npar=5,
        control_bounds=mv.box_bounds(
            jnp.array([-s["v_max"], -s["omega_max"]]),
            jnp.array([s["v_max"], s["omega_max"]])),
        x_lb=jnp.array(s["x_lb"]) if use_state_bounds else None,
        x_ub=jnp.array(s["x_ub"]) if use_state_bounds else None,
    )
    opts = mv.ILQROptions(max_iters=max_iters,
                          al_iters=2 if use_state_bounds else 0)
    solve = mv.make_ilqr_solver(ocp, opts)
    plant = DiscreteSimulator(unicycle, T, M=10)  # continuous-model plant (:45)
    run = jax.jit(make_receding_horizon(
        ocp, solve, lambda x, u, pp: plant.sim(x, u), Nsim))

    times = T * Nsim * np.linspace(0, 1, Nsim + 1)
    par = circular_reference_params(times[:Nsim], N, T)       # (Nsim, N, 5)
    par_full = np.concatenate([par, par[:, -1:, :]], axis=1)   # terminal row
    return {"ocp": ocp, "solve": solve, "run": run, "spec": s,
            "params_seq": par_full, "times": times}


def run_circular_tracking(built=None, **kw):
    import jax.numpy as jnp

    if built is None:
        built = build_circular_tracking(**kw)
    s = built["spec"]
    res = built["run"](jnp.array(s["x0"]), jnp.asarray(built["params_seq"]))
    xs = np.array(res.xs)
    par = built["params_seq"]
    ref0 = par[:, 0, :3]  # reference at each applied step
    err = xs[:-1] - ref0
    # transient excluded: the robot starts at the circle's interior
    settle = len(err) // 5
    return {
        "result": res,
        "rmse_xy": float(np.sqrt((err[settle:, :2] ** 2).mean())),
        "max_err_xy": float(np.abs(err[settle:, :2]).max()),
        "mean_path_dist": float(np.linalg.norm(err[settle:, :2], axis=1).mean()),
        "converged_frac": float(np.array(res.converged).mean()),
    }
