"""Differential-drive point stabilization — the Casadi/ family.

Constants from ``Casadi/single_shooting_v1.py:29-47``: T=0.2, N=10,
Q=diag(1,5,0.1), R=diag(0.5,0.05), v in [-1,1], omega in [-pi/4, pi/4],
start (0,0,0) -> target (10,10,0); the closed loop runs until
||x-target|| < 0.1 (84 steps in the reference, :232-235) with an Euler plant
shift (:17-27).  The v2/multiple-shooting variants use RK4; our solver is a
lifted (multiple-shooting-like) method with RK4 by construction, and the
``integrator`` knob reproduces the Euler variant.
"""
from __future__ import annotations

import numpy as np

SPEC = dict(T=0.2, N=10, Q=(1.0, 5.0, 0.1), R=(0.5, 0.05),
            v_max=1.0, omega_max=np.pi / 4,
            x0=(0.0, 0.0, 0.0), target=(10.0, 10.0, 0.0), sim_time=20.0)


def build_diffdrive(integrator: str = "rk4", max_iters: int = 40,
                    n_steps: int = 100, cost: str = "discrete",
                    plant: str = "euler", M: int = 1):
    """Configurable across the Casadi/ family variants.

    cost="discrete": per-stage sum (single_shooting_v1.py:97-105).
    cost="quadrature": the Lagrange term integrated with the same RK4 stages
      (single_shooting_v2.py:100-113, multiple_shooting_casadi.py:95-113 use
      M=4) — the transcription behind the committed 1/2exemplo.xlsx goldens.
    plant="euler": the v1 Euler shift (:17-27); plant="rk4": controller model
      reused as plant (multiple_shooting_casadi.py:273).
    """
    import jax
    import jax.numpy as jnp

    import mpc_verde_tpu as mv
    from mpc_verde_tpu.models import unicycle
    from mpc_verde_tpu.ops import (discretize, euler_step, rk4_step,
                                   rk4_step_with_quadrature)
    from mpc_verde_tpu.runtime import make_receding_horizon

    s = SPEC
    F = discretize(unicycle, s["T"], method=integrator, M=M)
    Q = jnp.diag(jnp.array(s["Q"]))
    R = jnp.diag(jnp.array(s["R"]))

    def L(x, u, p):
        e = x - p[:3]
        return e @ Q @ e + u @ R @ u

    if cost == "discrete":
        l = L
    else:
        quad = rk4_step_with_quadrature(unicycle.f, L, s["T"], M=M)

        def l(x, u, p):
            return quad(x, u, p)[1]

    ocp = mv.OCP(
        dynamics=lambda x, u, p: F(x, u, p), stage_cost=l,
        N=s["N"], nx=3, nu=2, npar=3,
        control_bounds=mv.box_bounds(
            jnp.array([-s["v_max"], -s["omega_max"]]),
            jnp.array([s["v_max"], s["omega_max"]])),
    )
    solve = mv.make_ilqr_solver(ocp, mv.ILQROptions(max_iters=max_iters))
    if plant == "euler":
        pstep = euler_step(unicycle.f, s["T"])
    else:
        pstep = rk4_step(unicycle.f, s["T"], M=M)
    run = jax.jit(make_receding_horizon(
        ocp, solve, lambda x, u, pp: pstep(x, u, None), n_steps))
    return {"ocp": ocp, "solve": solve, "run": run, "spec": s, "n_steps": n_steps}


def run_diffdrive(built=None, **kw):
    import jax.numpy as jnp

    if built is None:
        built = build_diffdrive(**kw)
    s = built["spec"]
    n = built["n_steps"]
    params = jnp.broadcast_to(jnp.array(s["target"]), (n, s["N"] + 1, 3))
    res = built["run"](jnp.array(s["x0"]), params)
    xs = np.array(res.xs)
    errs = np.linalg.norm(xs[:, :2] - np.array(s["target"])[:2], axis=1)
    reached = errs < 0.1
    steps_to_target = int(np.argmax(reached)) if reached.any() else -1
    return {
        "result": res,
        "steps_to_target": steps_to_target,
        "final_error": float(np.linalg.norm(xs[-1] - np.array(s["target"]))),
        "ss_error": float(errs[-1]),
        "converged_all": bool(np.array(res.converged).all()),
    }
