"""CasADi-compat layer: reference-script program shapes run verbatim.

Exercises the §2.2 CasADi contract (SX.sym/vertcat/horzcat/reshape/repmat/
diagcat/Function/nlpsol/DM/.full()/norm_2/inf) by re-building the reference's
hand-rolled programs at small horizon:

  * ``Casadi/single_shooting_v1.py`` — Euler rollout built by symbolic matrix
    assignment, controls-only NLP, closed loop with warm-start shift.
  * ``Casadi/single_shooting_v2.py`` — RK4-with-quadrature ``F(x0,p)->(xf,qf)``
    via named Function I/O, stage-wise NLP assembly.
  * ``Casadi/multiple_shooting_casadi.py`` — lifted variables with defect
    equality constraints (lbg=ubg=0).
"""
import numpy as np
import pytest

import mpc_verde_tpu.compat.casadi as ca
from mpc_verde_tpu.compat.casadi import SX, DM, cos, sin


T_STEP = 0.2
N = 8
V_MAX, V_MIN = 0.6, -0.6
W_MAX, W_MIN = np.pi / 4, -np.pi / 4
Q_DIAG = (1.0, 5.0, 0.1)
R_DIAG = (0.5, 0.05)


def _diffdrive_symbols():
    x = SX.sym("x")
    y = SX.sym("y")
    theta = SX.sym("theta")
    states = ca.vertcat(x, y, theta)
    v = SX.sym("v")
    omega = SX.sym("omega")
    controls = ca.vertcat(v, omega)
    rhs = ca.vertcat(v * cos(theta), v * sin(theta), omega)
    return states, controls, rhs


def test_column_major_semantics():
    # CasADi reshape is column-major; DM 1-D indexing follows the flat
    # column-major view (the lbx striding of single_shooting_v1.py:134-139)
    d = DM(np.array([[1.0, 3.0], [2.0, 4.0]]))
    r = ca.reshape(d, 4, 1)
    np.testing.assert_allclose(r.full().ravel(), [1, 2, 3, 4])
    r2 = ca.reshape(r, -1, 2)
    np.testing.assert_allclose(r2.full(), [[1, 3], [2, 4]])

    lbx = DM.zeros((6, 1))
    lbx[0:6:2] = -1.5
    lbx[1:6:2] = -0.5
    np.testing.assert_allclose(lbx.full().ravel(), [-1.5, -0.5] * 3)

    u = DM(np.arange(6.0).reshape(2, 3))
    np.testing.assert_allclose(u[:, -1].full().ravel(), [2.0, 5.0])
    np.testing.assert_allclose(
        ca.horzcat(u[:, 1:], ca.reshape(u[:, -1], -1, 1)).full(),
        np.c_[u.full()[:, 1:], u.full()[:, -1]])

    assert float(ca.norm_2(DM([3.0, 4.0]))) == pytest.approx(5.0)
    np.testing.assert_allclose(
        ca.repmat(DM([1.0, 2.0]), 1, 3).full(), [[1, 1, 1], [2, 2, 2]])
    np.testing.assert_allclose(
        ca.diagcat(1.0, 5.0, 0.1).full(), np.diag([1.0, 5.0, 0.1]))


def test_function_numeric_and_symbolic_paths():
    states, controls, rhs = _diffdrive_symbols()
    f = ca.Function("f", [states, controls], [rhs], ["x", "u"], ["rhs"])

    out = f(DM([1.0, 2.0, 0.0]), DM([0.5, 0.1]))
    np.testing.assert_allclose(out.full().ravel(), [0.5, 0.0, 0.1])

    # symbolic substitution: f applied to expressions returns SX
    st2 = states + DM([0.0, 0.0, np.pi / 2])
    sym_out = f(st2, controls)
    assert isinstance(sym_out, SX)
    f2 = ca.Function("f2", [states, controls], [sym_out])
    val = f2(DM([0.0, 0.0, 0.0]), DM([1.0, 0.0])).full().ravel()
    np.testing.assert_allclose(val, [0.0, 1.0, 0.0], atol=1e-12)

    # named-output dict call (single_shooting_v2.py F(x0=..., p=...))
    d = f(x=DM([1.0, 2.0, 0.0]), u=DM([0.5, 0.1]))
    np.testing.assert_allclose(d["rhs"].full().ravel(), [0.5, 0.0, 0.1])


def _build_ss_v1_solver():
    """single_shooting_v1.py program shape (:50-147) at small N."""
    states, controls, rhs = _diffdrive_symbols()
    n_states, n_controls = 3, 2

    f = ca.Function("f", [states, controls], [rhs], ["x", "u"], ["rhs"])
    P = ca.SX.sym("P", 2 * n_states)
    U = ca.SX.sym("U", n_controls, N)
    X = ca.SX.sym("X", n_states, N + 1)

    X[:, 0] = P[:n_states]
    for k in range(N):
        st, con = X[:, k], U[:, k]
        X[:, k + 1] = st + f(st, con) * T_STEP

    ff = ca.Function("ff", [U, P], [X])

    Q = ca.diagcat(*Q_DIAG)
    R = ca.diagcat(*R_DIAG)
    obj = 0
    for k in range(N):
        st, con = X[:, k], U[:, k]
        e = st - P[n_states:]
        obj = obj + (e.T @ Q @ e + con.T @ R @ con)

    g = ca.reshape(X, (N + 1) * n_states, 1)
    OPT_variables = ca.vertcat(U.reshape((-1, 1)))
    nlp_prob = {"f": obj[0, 0], "x": OPT_variables, "g": g, "p": P}
    solver = ca.nlpsol("solver", "ipopt", nlp_prob,
                       {"ipopt": {"acceptable_tol": 1e-8}})

    lbx = DM.zeros((n_controls * N, 1))
    ubx = DM.zeros((n_controls * N, 1))
    lbx[0: n_controls * N: n_controls] = V_MIN
    ubx[0: n_controls * N: n_controls] = V_MAX
    lbx[1: n_controls * N: n_controls] = W_MIN
    ubx[1: n_controls * N: n_controls] = W_MAX
    return f, ff, solver, lbx, ubx


def test_single_shooting_v1_closed_loop():
    f, ff, solver, lbx, ubx = _build_ss_v1_solver()
    state_init = ca.DM([0.0, 0.0, 0.0])
    state_target = ca.DM([1.5, 1.5, 0.0])
    u0 = ca.DM.zeros((2, N))

    errs = [ca.norm_2(state_init - state_target)]
    for _ in range(25):
        if ca.norm_2(state_init - state_target) <= 1e-1:
            break
        p = ca.vertcat(state_init, state_target)
        sol = solver(x0=ca.reshape(u0, 2 * N, 1), lbx=lbx, ubx=ubx,
                     lbg=-ca.inf, ubg=ca.inf, p=p)
        assert solver.stats()["success"]
        u = ca.reshape(sol["x"], 2, N)
        # bounds respected
        uf = u.full()
        assert (uf[0] >= V_MIN - 1e-9).all() and (uf[0] <= V_MAX + 1e-9).all()
        assert (uf[1] >= W_MIN - 1e-9).all() and (uf[1] <= W_MAX + 1e-9).all()
        # predicted horizon from ff matches plant model one step ahead
        Xpred = ff(u, p)
        f_value = f(state_init, u[:, 0])
        state_init = ca.DM.full(state_init + (T_STEP * f_value))
        np.testing.assert_allclose(
            Xpred.full()[:, 1], np.ravel(state_init), atol=1e-8)
        # warm-start shift (single_shooting_v1.py:22-27)
        u0 = ca.horzcat(u[:, 1:], ca.reshape(u[:, -1], -1, 1))
        errs.append(ca.norm_2(state_init - state_target))

    assert errs[-1] <= 1e-1, f"closed loop did not reach target: {errs}"
    assert errs[-1] < errs[0] / 10


def test_single_shooting_matches_structured_ilqr():
    """The generic-NLP path and the structured box-DDP solver agree."""
    import jax.numpy as jnp

    import mpc_verde_tpu as mv
    from mpc_verde_tpu.models import unicycle
    from mpc_verde_tpu.ops import euler_step

    f, ff, solver, lbx, ubx = _build_ss_v1_solver()
    x0 = np.array([0.3, -0.4, 0.5])
    tgt = np.array([1.5, 1.5, 0.0])
    sol = solver(x0=DM.zeros((2 * N, 1)), lbx=lbx, ubx=ubx,
                 lbg=-ca.inf, ubg=ca.inf,
                 p=ca.vertcat(ca.DM(x0), ca.DM(tgt)))
    u_nlp = ca.reshape(sol["x"], 2, N).full().T          # (N, 2)

    F = euler_step(unicycle.f, T_STEP)
    Q = jnp.diag(jnp.asarray(Q_DIAG))
    R = jnp.diag(jnp.asarray(R_DIAG))

    def l(x, u, p):
        e = x - p[:3]
        return e @ Q @ e + u @ R @ u

    ocp = mv.OCP(dynamics=lambda x, u, p: F(x, u, p), stage_cost=l,
                 N=N, nx=3, nu=2, npar=3,
                 control_bounds=mv.box_bounds(
                     jnp.array([V_MIN, W_MIN]), jnp.array([V_MAX, W_MAX])))
    solve = mv.make_ilqr_solver(ocp, mv.ILQROptions(max_iters=100))
    res = solve(jnp.asarray(x0), jnp.broadcast_to(jnp.asarray(tgt), (N + 1, 3)))
    assert bool(res.converged)
    np.testing.assert_allclose(u_nlp, np.asarray(res.us), atol=1e-4)
    np.testing.assert_allclose(float(sol["f"]), float(res.cost), rtol=1e-6)


@pytest.mark.slow
def test_multiple_shooting_defect_constraints():
    """multiple_shooting_casadi.py shape: lifted vars, defect equalities."""
    states, controls, rhs = _diffdrive_symbols()
    n_states = 3
    f = ca.Function("f", [states, controls], [rhs])

    P = ca.SX.sym("P", 2 * n_states)
    w, w0, lbw, ubw, g = [], [], [], [], []
    J = 0

    Xk = ca.SX.sym("X0", n_states)
    w += [Xk]
    lbw += [-ca.inf] * 3
    ubw += [ca.inf] * 3
    w0 += [0.0] * 3
    g += [Xk - P[:n_states]]          # pin initial state

    Q = ca.diagcat(*Q_DIAG)
    R = ca.diagcat(*R_DIAG)
    for k in range(N):
        Uk = ca.SX.sym(f"U_{k}", 2)
        w += [Uk]
        lbw += [V_MIN, W_MIN]
        ubw += [V_MAX, W_MAX]
        w0 += [0.0, 0.0]

        e = Xk - P[n_states:]
        J = J + (e.T @ Q @ e + Uk.T @ R @ Uk)[0, 0]
        Xk_end = Xk + f(Xk, Uk) * T_STEP

        Xk = ca.SX.sym(f"X_{k + 1}", n_states)
        w += [Xk]
        lbw += [-ca.inf] * 3
        ubw += [ca.inf] * 3
        w0 += [0.0] * 3
        g += [Xk_end - Xk]            # defect equality

    prob = {"f": J, "x": ca.vertcat(*w), "g": ca.vertcat(*g), "p": P}
    solver = ca.nlpsol("solver", "ipopt", prob)

    x0 = np.array([0.3, -0.4, 0.5])
    tgt = np.array([1.5, 1.5, 0.0])
    sol = solver(x0=np.asarray(w0), lbx=np.asarray(lbw), ubx=np.asarray(ubw),
                 lbg=0, ubg=0, p=ca.vertcat(ca.DM(x0), ca.DM(tgt)))
    assert solver.stats()["success"]
    assert solver.stats()["viol"] < 1e-7

    # unpack interleaved [x0(3), u0(2), x1(3), ...] (stride 5)
    wv = sol["x"].full().ravel()
    us_ms = np.stack([wv[3 + 5 * k: 5 + 5 * k] for k in range(N)])

    # must agree with the single-shooting solve of the same problem
    _, _, ss_solver, lbx, ubx = _build_ss_v1_solver()
    ss = ss_solver(x0=DM.zeros((2 * N, 1)), lbx=lbx, ubx=ubx,
                   lbg=-ca.inf, ubg=ca.inf,
                   p=ca.vertcat(ca.DM(x0), ca.DM(tgt)))
    us_ss = ca.reshape(ss["x"], 2, N).full().T
    np.testing.assert_allclose(us_ms, us_ss, atol=2e-4)


def test_rk4_quadrature_function_composition():
    """single_shooting_v2.py:95-113: RK4 integrating state + cost quadrature."""
    states, controls, rhs = _diffdrive_symbols()
    n_states = 3
    P = ca.SX.sym("P", 2 * n_states)
    U = ca.SX.sym("U", 2)          # the outer horizon-stage control symbol
    Q = ca.diagcat(*Q_DIAG)
    R = ca.diagcat(*R_DIAG)
    e = states - P[n_states:]
    L = (e.T @ Q @ e + controls.T @ R @ controls)[0, 0]
    f = ca.Function("f", [states, controls, P], [rhs, L])

    X = P[:n_states]
    Qacc = 0
    M = 4
    DT = T_STEP / M
    for _ in range(M):
        k1, k1_q = f(X, U, P)
        k2, k2_q = f(X + DT / 2 * k1, U, P)
        k3, k3_q = f(X + DT / 2 * k2, U, P)
        k4, k4_q = f(X + DT * k3, U, P)
        X = X + DT / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        Qacc = Qacc + DT / 6 * (k1_q + 2 * k2_q + 2 * k3_q + k4_q)
    F = ca.Function("F", [P, U], [X, Qacc], ["x0", "p"], ["xf", "qf"])

    Fk = F(x0=ca.DM([0.0, 0.0, 0.0, 1.0, 1.0, 0.0]), p=ca.DM([0.5, 0.1]))
    xf = Fk["xf"].full().ravel()
    qf = float(Fk["qf"])

    # cross-check against the framework's RK4-with-quadrature integrator
    import jax.numpy as jnp

    from mpc_verde_tpu.models import unicycle
    from mpc_verde_tpu.ops import rk4_step_with_quadrature

    Qj = jnp.diag(jnp.asarray(Q_DIAG))
    Rj = jnp.diag(jnp.asarray(R_DIAG))

    def lj(x, u, p):
        ee = x - p[:3]
        return ee @ Qj @ ee + u @ Rj @ u

    step = rk4_step_with_quadrature(unicycle.f, lj, T_STEP, M=M)
    xf_ref, qf_ref = step(jnp.zeros(3), jnp.array([0.5, 0.1]),
                          jnp.array([1.0, 1.0, 0.0]))
    np.testing.assert_allclose(xf, np.asarray(xf_ref), atol=1e-10)
    assert qf == pytest.approx(float(qf_ref), rel=1e-10)


@pytest.mark.slow
def test_nlpsol_batch_solve():
    """batch_solve: one device call solves many instances (vmapped IPOPT)."""
    f, ff, solver, lbx, ubx = _build_ss_v1_solver()
    rng = np.random.default_rng(7)
    B = 12
    x0s = np.zeros((B, 2 * N))
    tgts = np.tile([1.5, 1.5, 0.0], (B, 1))
    inits = rng.uniform(-0.5, 0.5, (B, 3))
    ps = np.concatenate([inits, tgts], axis=1)
    res = solver.batch_solve(x0s, ps, lbx=lbx, ubx=ubx,
                             lbg=-ca.inf, ubg=ca.inf)
    assert bool(res.converged.all())
    # each batch member must match its serial solve
    for b in (0, 5, 11):
        sol = solver(x0=x0s[b], lbx=lbx, ubx=ubx, lbg=-ca.inf, ubg=ca.inf,
                     p=ps[b])
        np.testing.assert_allclose(np.asarray(res.x)[b],
                                   sol["x"].full().ravel(), atol=1e-7)
