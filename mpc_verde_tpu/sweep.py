"""Tuning sweeps as a batch axis — the Phiref.py harness, parallelized.

The reference sweeps horizon lists and weight lists by re-running the whole
closed loop serially per config (``Trajectory Tracking/Phiref.py:22-28``,
loop at :27-355).  Here weight configs become a *batch dimension*: the stage
cost reads its weights from the parameter vector, so one compiled closed-loop
program evaluates every weight config simultaneously under ``vmap`` (and
across chips with ``parallel.make_sharded_solver``).  Horizons change array
shapes, so they remain an outer (compile-per-N) loop.
"""
from __future__ import annotations

import numpy as np


def sweep_lane_change(q_y_values=(0.01, 0.1, 1.0, 10.0, 100.0),
                      horizons=(3, 5, 8, 10, 15, 20),
                      path=None, n_steps: int = 300, max_iters: int = 30):
    """Sweep lateral-error lane-change tuning: Q_y batch x horizon loop.

    Returns a list of dicts (one per (horizon, q_y)) with the reference's
    metrics (mean path distance / per-state MSEs — ``Phiref.py:315``,
    ``Trajectory_tracking_le_LTI.py:160-163``).
    """
    import jax
    import jax.numpy as jnp

    import mpc_verde_tpu as mv
    from mpc_verde_tpu.models import lateral_error_lti
    from mpc_verde_tpu.ops import c2d
    from mpc_verde_tpu.refgen import (lateral_error_references,
                                      stage_param_tensor, synthetic_lane_change)
    from mpc_verde_tpu.runtime import make_receding_horizon
    from mpc_verde_tpu.scenarios.lane_change import SPEC

    s = dict(SPEC)
    if path is None:
        path = synthetic_lane_change(n=max(n_steps, 500), dt=s["T"])
    Nsim = n_steps
    T = s["T"]

    uref = float(np.mean(path["uref"]))
    model = lateral_error_lti(uref, s["ar"], s["br"])
    refs = lateral_error_references(path, T, s["ar"], s["br"])

    results = []
    qys = np.asarray(q_y_values, dtype=float)
    B = len(qys)

    for N in horizons:
        Ad, Bd = c2d(model.Ac, model.Bc, T)
        Ad = jnp.asarray(Ad); Bd = jnp.asarray(Bd)

        # params: [y_ref, phi_ref, r_ref, delta_ref, q_y]
        def l(x, u, p, du):
            e = x - p[:3]
            Q = jnp.diag(jnp.stack([p[4], jnp.asarray(s["Q"][1], e.dtype),
                                    jnp.asarray(s["Q"][2], e.dtype)]))
            return e @ Q @ e + s["R"] * (u[0] - p[3]) ** 2

        du_lb = np.zeros((N, 1)); du_ub = np.zeros((N, 1))
        du_lb[: s["Ntu"]] = -np.inf; du_ub[: s["Ntu"]] = np.inf

        ocp = mv.to_rate_form(
            lambda x, u, p: Ad @ x + Bd @ u, l, N=N, nx=3, nu=1, npar=5,
            u_lb=jnp.array([-s["delta_max"]]), u_ub=jnp.array([s["delta_max"]]),
            du_lb=du_lb, du_ub=du_ub)
        solve = mv.make_ilqr_solver(ocp, mv.ILQROptions(max_iters=max_iters))

        def plant(z, w, pp):
            x, u_prev = z[:3], z[3:]
            u = u_prev + w
            return jnp.concatenate([Ad @ x + Bd @ u, u])

        run = make_receding_horizon(ocp, solve, plant, Nsim)

        ref_par = stage_param_tensor(refs, N + 1, Nsim)             # (Nsim, N+1, 4)
        base = np.concatenate([ref_par, np.zeros((Nsim, N + 1, 1))], axis=2)
        batch_par = np.broadcast_to(base, (B,) + base.shape).copy()
        batch_par[..., 4] = qys[:, None, None]

        vrun = jax.jit(jax.vmap(lambda par: run(jnp.zeros(4), par)))
        res = vrun(jnp.asarray(batch_par))

        zs = np.array(res.xs)            # (B, Nsim+1, 4)
        xs = zs[:, :, :3]
        err = xs[:, :Nsim] - refs[None, :Nsim, :3]
        xz = np.concatenate([
            np.zeros((B, 1)),
            np.cumsum(uref * np.cos(xs[:, :-1, 1]) * T, axis=1)], axis=1)
        traj = np.stack([xz[:, :Nsim], xs[:, :Nsim, 0]], axis=1)     # (B,2,Nsim)
        traje = np.stack([path["x"][:Nsim], path["y"][:Nsim]])       # (2,Nsim)
        dist = np.linalg.norm(traj - traje[None], axis=1)            # (B,Nsim)

        for i, qy in enumerate(qys):
            results.append({
                "horizon": int(N), "q_y": float(qy),
                "mean_y": float((err[i, :, 0] ** 2).mean()),
                "mean_phi": float((err[i, :, 1] ** 2).mean()),
                "mean_path_dist": float(dist[i].mean()),
                "converged_frac": float(np.array(res.converged)[i].mean()),
            })
    return results
