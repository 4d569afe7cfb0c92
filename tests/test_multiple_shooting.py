"""Multiple-shooting (FDDP) solver: agreement with single shooting + lifting
behavior — the difference.py check as a real test."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mpc_verde_tpu as mv
from mpc_verde_tpu.models import unicycle
from mpc_verde_tpu.ops import rk4_step
from mpc_verde_tpu.solver.multiple_shooting import make_ms_solver

T, N = 0.2, 10
TARGET = np.array([10.0, 10.0, 0.0])


def _ocp():
    F = rk4_step(unicycle.f, T)
    Q = jnp.diag(jnp.array([1.0, 5.0, 0.1]))
    R = jnp.diag(jnp.array([0.5, 0.05]))

    def l(x, u, p):
        e = x - p[:3]
        return e @ Q @ e + u @ R @ u

    return mv.OCP(dynamics=lambda x, u, p: F(x, u, p), stage_cost=l,
                  N=N, nx=3, nu=2, npar=3,
                  control_bounds=mv.box_bounds(
                      jnp.array([-1.0, -np.pi / 4]), jnp.array([1.0, np.pi / 4])))


@pytest.fixture(scope="module")
def solvers():
    ocp = _ocp()
    opts = mv.ILQROptions(max_iters=150, tol_grad=1e-9, tol_cost=1e-13)
    return (jax.jit(make_ms_solver(ocp, opts)),
            jax.jit(mv.make_ilqr_solver(ocp, opts)))


def test_methods_agree(solvers):
    """single vs multiple shooting solutions agree (difference.py:604-619)."""
    ms, ss = solvers
    params = jnp.broadcast_to(jnp.array(TARGET), (N + 1, 3))
    r_ms = ms(jnp.zeros(3), params)
    r_ss = ss(jnp.zeros(3), params)
    assert bool(r_ms.converged)
    assert float(r_ms.max_violation) < 1e-6, "defects must close"
    assert abs(float(r_ms.cost) - float(r_ss.cost)) < 1e-5 * (
        1 + abs(float(r_ss.cost)))
    assert np.abs(np.array(r_ms.us) - np.array(r_ss.us)).max() < 1e-2


def test_infeasible_start_closes_gaps(solvers):
    """Start from a maximally infeasible lifted guess (constant x0 states,
    nonzero controls): gaps must close and the optimum match."""
    ms, ss = solvers
    params = jnp.broadcast_to(jnp.array(TARGET), (N + 1, 3))
    us0 = jnp.tile(jnp.array([[0.5, -0.3]]), (N, 1))
    xs0 = jnp.broadcast_to(jnp.array([2.0, -1.0, 0.5]), (N + 1, 3))
    r = ms(jnp.zeros(3), params, us0, xs0)
    assert bool(r.converged)
    assert float(r.max_violation) < 1e-6
    r_ss = ss(jnp.zeros(3), params)
    assert abs(float(r.cost) - float(r_ss.cost)) < 1e-5 * (1 + abs(float(r_ss.cost)))
