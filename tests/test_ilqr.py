"""Solver tests: LQR closed form, scipy goldens, diff-drive reference problem.

Mirrors SURVEY.md §4's prescription: (b) solver unit tests on LQR problems
with closed-form Riccati answers, (c) integration tests vs golden data on the
reference scenarios.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mpc_verde_tpu as mv
from mpc_verde_tpu.models import unicycle
from mpc_verde_tpu.ops import rk4_step

from golden import rk4_np, single_shooting_golden

# ---- shared problem definitions -------------------------------------------

T, N = 0.2, 10
Qm = np.diag([1.0, 5.0, 0.1])
Rm = np.diag([0.5, 0.05])
TARGET = np.array([10.0, 10.0, 0.0])
V_MAX, W_MAX = 1.0, np.pi / 4


def _unicycle_ocp(bounded=True):
    F = rk4_step(unicycle.f, T)
    Q, R = jnp.array(Qm), jnp.array(Rm)

    def l(x, u, p):
        e = x - p[:3]
        return e @ Q @ e + u @ R @ u

    cb = mv.box_bounds(jnp.array([-V_MAX, -W_MAX]), jnp.array([V_MAX, W_MAX])) if bounded else None
    return mv.OCP(dynamics=lambda x, u, p: F(x, u, p), stage_cost=l,
                  N=N, nx=3, nu=2, npar=3, control_bounds=cb)


@pytest.fixture(scope="module")
def unicycle_solver():
    opts = mv.ILQROptions(max_iters=200, tol_grad=1e-9, tol_cost=1e-14)
    return jax.jit(mv.make_ilqr_solver(_unicycle_ocp(), opts))


# ---- tests ----------------------------------------------------------------

def test_lqr_matches_dynamic_riccati():
    """Unconstrained LTI problem: iLQR must reproduce the exact finite-horizon
    Riccati solution in one backward pass."""
    dt = 0.1
    Ad = np.array([[1.0, dt], [0.0, 1.0]])
    Bd = np.array([[0.5 * dt * dt], [dt]])
    Q = np.diag([1.0, 0.1])
    R = np.array([[0.01]])
    Nh = 30

    ocp = mv.OCP(
        dynamics=lambda x, u, p: jnp.array(Ad) @ x + jnp.array(Bd) @ u,
        stage_cost=lambda x, u, p: x @ jnp.array(Q) @ x + u @ jnp.array(R) @ u,
        terminal_cost=lambda x, p: x @ jnp.array(Q) @ x,
        N=Nh, nx=2, nu=1,
    )
    res = jax.jit(mv.make_ilqr_solver(ocp, mv.ILQROptions(tol_grad=1e-12)))(
        jnp.array([1.0, -0.5]))

    # Closed-form: backward Riccati recursion (cost uses x'Qx + u'Ru, so the
    # standard recursion with P_N = Q).
    P = Q.copy()
    Ks = []
    for _ in range(Nh):
        K = np.linalg.solve(R + Bd.T @ P @ Bd, Bd.T @ P @ Ad)
        P = Q + Ad.T @ P @ (Ad - Bd @ K)
        Ks.append(K)
    Ks = Ks[::-1]
    x = np.array([1.0, -0.5])
    us_ref = []
    for k in range(Nh):
        u = -Ks[k] @ x
        us_ref.append(u)
        x = Ad @ x + Bd @ u
    us_ref = np.array(us_ref)
    assert np.abs(np.array(res.us) - us_ref).max() < 1e-8


def test_unicycle_matches_scipy_golden(unicycle_solver):
    """The reference diff-drive problem (single_shooting_v1 constants): cost
    must match a scipy L-BFGS-B solve of the same transcription."""
    res = unicycle_solver(jnp.zeros(3), jnp.broadcast_to(jnp.array(TARGET), (N + 1, 3)))
    step = rk4_np(lambda x, u: np.array(
        [u[0] * np.cos(x[2]), u[0] * np.sin(x[2]), u[1]]), T)
    us_g, cost_g = single_shooting_golden(
        step,
        lambda x, u, k: (x - TARGET) @ Qm @ (x - TARGET) + u @ Rm @ u,
        lambda x: 0.0,
        np.zeros(3), N, 2,
        u_lb=[-V_MAX, -W_MAX], u_ub=[V_MAX, W_MAX])
    assert float(res.cost) <= cost_g + 1e-6 * (1 + abs(cost_g))
    assert abs(float(res.cost) - cost_g) < 1e-5 * (1 + abs(cost_g))
    assert bool(res.converged)


def test_warm_start_converges_faster(unicycle_solver):
    params = jnp.broadcast_to(jnp.array(TARGET), (N + 1, 3))
    cold = unicycle_solver(jnp.zeros(3), params)
    warm = unicycle_solver(jnp.zeros(3), params, cold.us)
    assert int(warm.iterations) <= int(cold.iterations)
    assert float(warm.cost) <= float(cold.cost) + 1e-10 * (1 + abs(float(cold.cost)))


def test_batch_vmap_matches_single(unicycle_solver):
    params = jnp.broadcast_to(jnp.array(TARGET), (N + 1, 3))
    x0s = jnp.array([[0.0, 0.0, 0.0], [1.0, -1.0, 0.3], [5.0, 2.0, -0.5]])
    batched = jax.jit(jax.vmap(lambda x: unicycle_solver(x, params)))
    rb = batched(x0s)
    for i in range(3):
        ri = unicycle_solver(x0s[i], params)
        assert np.allclose(np.array(rb.us[i]), np.array(ri.us), atol=1e-10)


def test_state_bounds_augmented_lagrangian():
    """Box on the state enforced by AL: drive a double integrator with the
    position capped below the unconstrained optimum's peak."""
    dt = 0.1
    Ad = jnp.array([[1.0, dt], [0.0, 1.0]])
    Bd = jnp.array([[0.5 * dt * dt], [dt]])
    Nh = 25
    x_ub = 0.6

    def dyn(x, u, p):
        return Ad @ x + Bd @ u

    def cost(x, u, p):
        # reward being at position 1 -> wants to overshoot the cap
        return (x[0] - 1.0) ** 2 + 0.01 * u[0] ** 2

    ocp = mv.OCP(dynamics=dyn, stage_cost=cost, N=Nh, nx=2, nu=1,
                 x_ub=jnp.array([x_ub, jnp.inf]))
    opts = mv.ILQROptions(al_iters=6, al_mu0=10.0, al_mu_factor=8.0,
                          max_iters=80, tol_grad=1e-10)
    res = jax.jit(mv.make_ilqr_solver(ocp, opts))(jnp.array([0.0, 0.0]))
    assert float(res.max_violation) < 1e-4
    # and it should actually ride the bound, not just stay away from it
    assert float(np.array(res.xs)[:, 0].max()) > x_ub - 5e-3
