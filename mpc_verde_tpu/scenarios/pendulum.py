"""Inverted pendulum on a cart — Inverted_pendulum/ family.

Constants from ``inverted_pendulum_single_shooting_mpctools.py:15-64``:
T=0.01, Nt=50, 4 states (x, xdot, theta, thetadot), force input bounded
+-200, move blocking (Du free for 5 stages, pinned after), stage cost
(1.2 (x1-10))^2 + theta^2 + (0.01 du)^2, QP problem, exact linear plant.

This scenario uses the native OCP/runtime path (the compat API covers the
script-shaped version in tests/test_compat.py); the closed loop is one
compiled scan rather than 1000 Python iterations.
"""
from __future__ import annotations

import numpy as np

SPEC = dict(T=0.01, N=50, Ntu=5, u_max=200.0, x_target=10.0,
            q_x=1.2, q_theta=1.0, r_du=0.01, n_steps=1000)


def build_pendulum(n_steps: int = None, max_iters: int = 25):
    import jax
    import jax.numpy as jnp

    import mpc_verde_tpu as mv
    from mpc_verde_tpu.models import cart_pendulum_linear
    from mpc_verde_tpu.ops import c2d
    from mpc_verde_tpu.runtime import make_receding_horizon

    s = dict(SPEC)
    if n_steps is not None:
        s["n_steps"] = n_steps
    N, T = s["N"], s["T"]

    m = cart_pendulum_linear()
    Ad, Bd = c2d(m.Ac, m.Bc, T)
    Ad = jnp.asarray(Ad); Bd = jnp.asarray(Bd)

    def l(x, u, p, du):
        return ((s["q_x"] * (x[0] - s["x_target"])) ** 2
                + (s["q_theta"] * x[2]) ** 2 + (s["r_du"] * du[0]) ** 2)

    du_lb = np.zeros((N, 1)); du_ub = np.zeros((N, 1))
    du_lb[: s["Ntu"]] = -np.inf; du_ub[: s["Ntu"]] = np.inf

    ocp = mv.to_rate_form(
        lambda x, u, p: Ad @ x + Bd @ u, l, N=N, nx=4, nu=1, npar=0,
        u_lb=jnp.array([-s["u_max"]]), u_ub=jnp.array([s["u_max"]]),
        du_lb=du_lb, du_ub=du_ub)
    solve = mv.make_ilqr_solver(ocp, mv.ILQROptions(max_iters=max_iters))

    def plant(z, w, pp):
        # exact linear update, as the reference's ffunc plant (:78)
        x, u_prev = z[:4], z[4:]
        u = u_prev + w
        return jnp.concatenate([Ad @ x + Bd @ u, u])

    run = jax.jit(make_receding_horizon(ocp, solve, plant, s["n_steps"]))
    return {"ocp": ocp, "solve": solve, "run": run, "spec": s}


def run_pendulum(built=None, **kw):
    import jax.numpy as jnp

    if built is None:
        built = build_pendulum(**kw)
    s = built["spec"]
    res = built["run"](jnp.zeros(5))
    zs = np.array(res.xs)
    xs = zs[:, :4]
    dus = np.array(res.us)
    us = zs[:-1, 4] + dus[:, 0]
    return {
        "result": res, "x": xs, "u": us,
        "final_pos_error": float(abs(xs[-1, 0] - s["x_target"])),
        "max_angle": float(np.abs(xs[:, 2]).max()),
        "max_force": float(np.abs(us).max()),
        "converged_frac": float(np.array(res.converged).mean()),
    }
