"""Rate-form (Delta-u) OCP semantics: move blocking, rate bounds, uprev."""
import jax
import jax.numpy as jnp
import numpy as np

import mpc_verde_tpu as mv
from mpc_verde_tpu.models import unicycle
from mpc_verde_tpu.ops import rk4_step

from golden import rk4_np, single_shooting_golden

T, N = 0.2, 8
TARGET = np.array([5.0, 5.0, 0.0])
Qm = np.diag([1.0, 5.0, 0.1])
Rm = np.diag([0.5, 0.05])


def _mk(du_lb=None, du_ub=None, u_lb=(-1.0, -np.pi / 4), u_ub=(1.0, np.pi / 4),
        du_cost=0.0):
    F = rk4_step(unicycle.f, T)

    def l(x, u, p, du):
        e = x - p[:3]
        return e @ jnp.array(Qm) @ e + u @ jnp.array(Rm) @ u + du_cost * du @ du

    return mv.to_rate_form(lambda x, u, p: F(x, u, p), l, N=N, nx=3, nu=2, npar=3,
                           u_lb=jnp.array(u_lb), u_ub=jnp.array(u_ub),
                           du_lb=du_lb, du_ub=du_ub)


def test_move_blocking_freezes_tail():
    Ntu = 2
    du_lb = np.zeros((N, 2)); du_ub = np.zeros((N, 2))
    du_lb[:Ntu] = -np.inf; du_ub[:Ntu] = np.inf
    ocp = _mk(du_lb=du_lb, du_ub=du_ub)
    res = jax.jit(mv.make_ilqr_solver(ocp))(
        jnp.zeros(5), jnp.broadcast_to(jnp.array(TARGET), (N + 1, 3)))
    u_act = np.cumsum(np.array(res.us), axis=0)
    assert np.allclose(u_act[Ntu:], u_act[Ntu], atol=1e-9)


def test_rate_bounds_respected():
    du_max = 0.1
    ocp = _mk(du_lb=jnp.full((2,), -du_max), du_ub=jnp.full((2,), du_max))
    res = jax.jit(mv.make_ilqr_solver(ocp))(
        jnp.zeros(5), jnp.broadcast_to(jnp.array(TARGET), (N + 1, 3)))
    us = np.array(res.us)
    assert us.max() <= du_max + 1e-9
    assert us.min() >= -du_max - 1e-9
    # magnitude bounds on the reconstructed control hold too
    u_act = np.cumsum(us, axis=0)
    assert u_act[:, 0].max() <= 1.0 + 1e-7


def test_uprev_enters_via_initial_state():
    """z0 = [x0; uprev]: with a tight rate bound the first control must stay
    near uprev, matching mpc.nmpc(..., uprev=...) semantics."""
    du_max = 0.05
    ocp = _mk(du_lb=jnp.full((2,), -du_max), du_ub=jnp.full((2,), du_max))
    uprev = jnp.array([0.5, 0.1])
    z0 = jnp.concatenate([jnp.zeros(3), uprev])
    res = jax.jit(mv.make_ilqr_solver(ocp))(
        z0, jnp.broadcast_to(jnp.array(TARGET), (N + 1, 3)))
    u0 = np.array(uprev) + np.array(res.us[0])
    assert np.abs(u0 - np.array(uprev)).max() <= du_max + 1e-9


def test_rate_form_equals_plain_when_unconstrained_rates():
    """With free Du and no Du cost the rate form must reach the same optimum
    as the plain formulation (same feasible set)."""
    ocp_rate = _mk()
    F = rk4_step(unicycle.f, T)

    def l(x, u, p):
        e = x - p[:3]
        return e @ jnp.array(Qm) @ e + u @ jnp.array(Rm) @ u

    ocp_plain = mv.OCP(dynamics=lambda x, u, p: F(x, u, p), stage_cost=l,
                       N=N, nx=3, nu=2, npar=3,
                       control_bounds=mv.box_bounds(
                           jnp.array([-1.0, -np.pi / 4]), jnp.array([1.0, np.pi / 4])))
    opts = mv.ILQROptions(max_iters=300, tol_grad=1e-10, tol_cost=1e-15)
    params = jnp.broadcast_to(jnp.array(TARGET), (N + 1, 3))
    r_rate = jax.jit(mv.make_ilqr_solver(ocp_rate, opts))(jnp.zeros(5), params)
    r_plain = jax.jit(mv.make_ilqr_solver(ocp_plain, opts))(jnp.zeros(3), params)
    assert abs(float(r_rate.cost) - float(r_plain.cost)) < 1e-6 * (1 + abs(float(r_plain.cost)))
