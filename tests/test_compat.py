"""mpctools-compat layer: the reference scripts' call shapes must work.

The pendulum test reproduces
``Inverted_pendulum/inverted_pendulum_single_shooting_mpctools.py`` verbatim
through the compat API (c2d discretization, move blocking via Du bounds,
isQP, fixvar/callSolver loop, exact linear plant update).
"""
import numpy as np
import pytest

import mpc_verde_tpu.compat as mpc
from mpc_verde_tpu.models import cart_pendulum_linear


def test_getcasadifunc_rk4_matches_ops():
    import jax.numpy as jnp
    from mpc_verde_tpu.ops import rk4_step
    from mpc_verde_tpu.models import unicycle

    def ode(x, u):
        return jnp.stack([u[0] * jnp.cos(x[2]), u[0] * jnp.sin(x[2]), u[1]])

    F = mpc.getCasadiFunc(ode, [3, 2], ["x", "u"], "F", rk4=True, Delta=0.2, M=1)
    ref = rk4_step(unicycle.f, 0.2, M=1)
    x = jnp.array([0.1, 0.2, 0.3]); u = jnp.array([0.5, -0.2])
    assert np.allclose(np.array(F(x, u)), np.array(ref(x, u)), atol=1e-12)


def test_c2d_namespace():
    m = cart_pendulum_linear()
    A, B = mpc.util.c2d(m.Ac, m.Bc, 0.01)
    assert A.shape == (4, 4) and B.shape == (4, 1)


@pytest.mark.slow
def test_pendulum_reference_scenario():
    """Pendulum swing regulation with move blocking, verbatim constants from
    the reference script (:15-64); closed loop must drive the cart to x=10
    with the pendulum upright."""
    Nx, Nu = 4, 1
    T, Nt = 0.01, 50

    Ac = np.array([[0, 0, 0, 0], [1, -10, 0, -20],
                   [0, 9.81, 0, 39.24], [0, 0, 1, 0]]).T
    Bc = np.array([[0.0], [1.0], [0.0], [2.0]])
    A, B = mpc.util.c2d(Ac, Bc, T)
    A, B = np.asarray(A), np.asarray(B)

    def ffunc(x, u):
        return mpc.mtimes(A, x) + mpc.mtimes(B, u)

    f = mpc.getCasadiFunc(ffunc, [Nx, Nu], ["x", "u"], "f")

    umax = 200
    Dulb = np.tile(-np.inf, (5, 1))
    Duub = np.tile(np.inf, (5, 1))
    Dub = np.tile(0, (45, 1))
    lb = {"u": np.array([-umax]), "Du": np.vstack((Dulb, Dub))}
    ub = {"u": np.array([umax]), "Du": np.vstack((Duub, Dub))}

    xt = np.array([10, 0, 0, 0])
    Q = np.diag([1.2, 0, 1, 0])
    R1 = 0.01

    def lfunc(x, u, du):
        return (Q[0, 0] * (x[0] - xt[0])) ** 2 + (Q[2, 2] * x[2]) ** 2 + (R1 * du[0]) ** 2

    l = mpc.getCasadiFunc(lfunc, [Nx, Nu, Nu], ["x", "u", "Du"])

    x0 = np.array([0.0, 0, 0, 0])
    N = {"x": Nx, "u": Nu, "t": Nt}
    solver = mpc.nmpc(f, l, N, x0, lb, ub, isQP=True, verbosity=0,
                      uprev=np.array([0.0]), funcargs={"l": ["x", "u", "Du"]})

    nsim = 400
    xcl = np.zeros((Nx, nsim + 1)); xcl[:, 0] = x0
    ucl = np.zeros((Nu, nsim))
    for k in range(nsim):
        solver.fixvar("x", 0, x0)
        sol = mpc.callSolver(solver)
        assert sol["status"] == "Solve_Succeeded", f"step {k}: {sol['status']}"
        xcl[:, k] = sol["x"][0, :]
        ucl[:, k] = sol["u"][0, :]
        x0 = ffunc(x0, ucl[:, k])
    xcl[:, nsim] = x0

    # controls respect the move-blocked magnitude bound
    assert np.abs(ucl).max() <= umax + 1e-6
    # the cart heads to 10 and the pendulum stays upright-ish
    assert xcl[0, -1] > 3.0, "cart barely moved"
    assert np.abs(xcl[2]).max() < 1.2, "pendulum swung wildly"
    # position error decreasing over the run
    assert abs(xcl[0, -1] - 10) < abs(xcl[0, nsim // 4] - 10)


def test_var_and_par_views():
    import jax.numpy as jnp

    def ode(x, u):
        return jnp.stack([u[0] * jnp.cos(x[2]), u[0] * jnp.sin(x[2]), u[1]])

    F = mpc.getCasadiFunc(ode, [3, 2], ["x", "u"], "F", rk4=True, Delta=0.2)
    Q = np.diag([1.0, 1.0, 0.1]); R = np.diag([0.5, 0.05])

    def lfunc(x, u, p):
        return (x - p[:3]) @ Q @ (x - p[:3]) + (u - p[3:5]) @ R @ (u - p[3:5])

    l = mpc.getCasadiFunc(lfunc, [3, 2, 5], ["x", "u", "p"], "l")
    N = {"x": 3, "u": 2, "t": 8, "p": 5}
    p = np.zeros((8, 5))
    solver = mpc.nmpc(f=F, l=l, N=N, x0=np.zeros(3),
                      lb={"u": np.array([-1, -np.pi / 4])},
                      ub={"u": np.array([1, np.pi / 4])},
                      p=p, funcargs={"l": ["x", "u", "p"]}, inferargs=True)
    for k in range(8):
        solver.par["p", k] = np.array([1.0, 0.0, 0.0, 0.5, 0.0])
    solver.solve()
    assert solver.stats["status"] == "Solve_Succeeded"
    u0 = np.array(solver.var["u", 0, :]).flatten()
    assert u0.shape == (2,)
    xs = np.array(solver.var["x", :, :])
    assert xs.shape == (9, 3)
    solver.saveguess()
    solver.fixvar("x", 0, solver.var["x", 1])
    solver.solve()
    assert solver.stats["status"] == "Solve_Succeeded"


def test_varsym_descriptors():
    # varsym mirrors mpctools' symbol struct keys and shapes
    # (Trajectory_tracking_lateral_error.py:76-77)
    import mpc_verde_tpu.compat as mpc

    def ode(x, u):
        return np.array([u[0], x[0]])

    F = mpc.getCasadiFunc(ode, [2, 1], ["x", "u"], "F", rk4=True, Delta=0.1)

    def lfunc(x, u):
        return float(np.sum(x**2) + np.sum(u**2))

    l = mpc.getCasadiFunc(lfunc, [2, 1], ["x", "u"], "l")
    solver = mpc.nmpc(f=F, l=l, N={"x": 2, "u": 1, "t": 5}, x0=np.zeros(2),
                      lb={"u": np.array([-1.0])}, ub={"u": np.array([1.0])},
                      uprev=np.array([0.0]))
    vs = solver.varsym
    assert len(vs["x"]) == 6 and vs["x"][0].shape == (2,)
    assert len(vs["u"]) == 5 and vs["u"][0].shape == (1,)
    assert "Du" in vs and vs["Du"][0].shape == (1,)
