"""Control-sequence parity vs IPOPT-class goldens (BASELINE.md acceptance).

The acceptance metric is max control-sequence error < 1e-3 against the
reference solver stack on the double-lane-change benchmark.  IPOPT itself is
not in this image; goldens come from scipy (SLSQP / bounded L-BFGS-B) solving
the *identical* transcription in float64 numpy — the same role IPOPT plays in
``mpc.nmpc`` (SURVEY.md §4).

Sampled closed-loop steps from our own run provide the OCP instances
(x0, params), so parity is checked at realistic states, not just the origin.
"""
import numpy as np
import pytest
import scipy.optimize as so

from mpc_verde_tpu import scenarios as sc
from mpc_verde_tpu.refgen import double_lane_change_course

TOL = 1e-3


def _lti_golden_u0(Ad, Bd, Q, R, z0, params, N):
    """LTI lane change with Ntu=1 move blocking: the whole plan is one scalar
    u; golden by bounded scalar minimization."""
    x0 = z0[:3]

    def cost(u):
        u = float(u)
        x = x0.copy()
        c = 0.0
        for k in range(N):
            p = params[k]
            e = x - p[:3]
            c += e @ Q @ e + R * (u - p[3]) ** 2
            x = Ad @ x + (Bd[:, 0] * u)
        return c

    r = so.minimize_scalar(cost, bounds=(-0.3491, 0.3491), method="bounded",
                           options={"xatol": 1e-12})
    return r.x


@pytest.mark.slow
def test_lane_change_lti_parity_double_lane_change():
    """Every sampled closed-loop step's applied control matches the golden
    within 1e-3 on the double-lane-change course."""
    course = double_lane_change_course()
    built = sc.build_lane_change_lti(path=course, n_steps=400)
    m = sc.run_lane_change_lti(built)
    assert m["converged_frac"] == 1.0

    import jax.numpy as jnp

    zs = np.array(m["result"].xs)
    us = m["u"]
    par = built["params_seq"]
    s = built["spec"]

    from mpc_verde_tpu.models import lateral_error_lti
    from mpc_verde_tpu.ops import c2d

    model = lateral_error_lti(built["uref"], s["ar"], s["br"])
    Ad, Bd = c2d(model.Ac, model.Bc, s["T"])
    Ad, Bd = np.array(Ad), np.array(Bd)
    Q = np.diag(s["Q"])

    worst = 0.0
    for t in range(0, 400, 40):
        u_gold = _lti_golden_u0(Ad, Bd, Q, s["R"], zs[t], par[t], s["N"])
        worst = max(worst, abs(us[t] - u_gold))
    assert worst < TOL, f"max |u - golden| = {worst}"


@pytest.mark.slow
def test_frenet_parity_slsqp():
    """Nonlinear Frenet OCP: full control sequence vs SLSQP with magnitude
    and rate constraints."""
    course = double_lane_change_course()
    built = sc.build_frenet(path=course, n_steps=60, max_iters=80)
    m = sc.run_frenet(built)
    assert m["converged_frac"] == 1.0

    s = built["spec"]
    N, T, L = s["N"], s["T"], s["L"]
    par = built["params_seq"]
    zs = np.array(m["result"].xs)

    def rhs(x, u, p):
        y, phi, v = x
        delta, a = u
        yt, phit, kappat = p[0], p[1], p[2]
        ce = np.cos(phi - phit)
        return np.array([
            v * np.sin(phi - phit),
            v * (np.tan(delta / L) - (kappat / (1 - (y - yt) * kappat)) * ce),
            a,
        ])

    def step_np(x, u, p):
        h = T
        k1 = rhs(x, u, p); k2 = rhs(x + 0.5 * h * k1, u, p)
        k3 = rhs(x + 0.5 * h * k2, u, p); k4 = rhs(x + h * k3, u, p)
        return x + (h / 6) * (k1 + 2 * k2 + 2 * k3 + k4)

    lam1, lam2, lam3 = s["lambda1"], s["lambda2"], s["lambda3"]
    lam4, lam5 = s["lambda4"], s["lambda5"]

    worst = 0.0
    for t in (10, 30, 50):
        z0 = zs[t]
        x0, uprev = z0[:3], z0[3:]
        P = par[t]

        def cost(zv):
            us = zv.reshape(N, 2)
            x = x0.copy()
            c = 0.0
            for k in range(N):
                p = P[k]
                zt = np.tan(us[k, 0]) - L * p[2]
                c += (lam1 * (x[2] - p[3]) ** 2 + lam2 * (x[0] - p[0]) ** 2
                      + lam3 * (x[1] - p[1]) ** 2 + lam4 * us[k, 1] ** 2
                      + lam5 * zt ** 2) / (N + 1)
                x = step_np(x, us[k], p)
            return c

        dmax, amax, rmax = s["delta_max"], s["a_max"], s["delta_dot_max"]
        bounds = [(-dmax, dmax), (-amax, amax)] * N

        def rate_cons(zv):
            us = zv.reshape(N, 2)
            d = np.diff(np.concatenate([[uprev[0]], us[:, 0]]))
            return np.concatenate([rmax - d, rmax + d])

        # our solution as the starting point would bias the check; start from
        # a neutral guess
        z0_guess = np.zeros(2 * N)
        r = so.minimize(cost, z0_guess, method="SLSQP", bounds=bounds,
                        constraints=[{"type": "ineq", "fun": rate_cons}],
                        options={"maxiter": 500, "ftol": 1e-14})
        assert r.success, r.message

        # reconstruct our absolute controls at step t
        res = built["solve"](
            np.asarray(z0), np.asarray(P), np.zeros((N, 2)))
        ours_du = np.array(res.us)
        ours = np.cumsum(np.concatenate([uprev[None], ours_du]), axis=0)[1:]
        gold = r.x.reshape(N, 2)
        err = np.abs(ours - gold).max()
        # compare costs too: ours must not be worse
        c_ours, c_gold = cost(ours.ravel()), r.fun
        assert c_ours <= c_gold + 1e-9 * (1 + abs(c_gold)) or err < TOL, (
            f"step {t}: cost ours {c_ours} vs gold {c_gold}, err {err}")
        if c_ours <= c_gold - 1e-10:
            continue  # we found a better optimum than SLSQP; parity moot
        worst = max(worst, err)
    assert worst < TOL, f"max control-seq error vs SLSQP = {worst}"
