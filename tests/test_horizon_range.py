"""Horizon-range validation: N = 10..100 matched at tolerance (BASELINE.md).

The acceptance table asks for golden agreement across the horizon range the
reference benchmarks (Nt in {3..50}, target range 10-100).  Each horizon
solves the diff-drive problem and compares against a scipy L-BFGS-B golden on
the identical transcription.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mpc_verde_tpu as mv
from mpc_verde_tpu.models import unicycle
from mpc_verde_tpu.ops import rk4_step

from golden import rk4_np, single_shooting_golden

T = 0.2
Qm = np.diag([1.0, 5.0, 0.1])
Rm = np.diag([0.5, 0.05])
TARGET = np.array([8.0, 8.0, 0.0])


@pytest.mark.slow
@pytest.mark.parametrize("N", [10, 25, 50, 100])
def test_horizon_matches_golden(N):
    F = rk4_step(unicycle.f, T)

    def l(x, u, p):
        e = x - p[:3]
        return e @ jnp.array(Qm) @ e + u @ jnp.array(Rm) @ u

    ocp = mv.OCP(dynamics=lambda x, u, p: F(x, u, p), stage_cost=l,
                 N=N, nx=3, nu=2, npar=3,
                 control_bounds=mv.box_bounds(
                     jnp.array([-1.0, -np.pi / 4]), jnp.array([1.0, np.pi / 4])))
    # the Gauss-Newton tail converges linearly; 1e-12 relative-cost tolerance
    # is where x64 improvements become noise for these problem scales
    opts = mv.ILQROptions(max_iters=500, tol_grad=1e-8, tol_cost=1e-12)
    res = jax.jit(mv.make_ilqr_solver(ocp, opts))(
        jnp.zeros(3), jnp.broadcast_to(jnp.array(TARGET), (N + 1, 3)))
    assert bool(res.converged), f"N={N} did not converge"

    step = rk4_np(lambda x, u: np.array(
        [u[0] * np.cos(x[2]), u[0] * np.sin(x[2]), u[1]]), T)
    # golden starts from our solution, so it can only polish; large horizons
    # cap scipy's effort (each cost eval is an N-step python rollout)
    us_g, cost_g = single_shooting_golden(
        step,
        lambda x, u, k: (x - TARGET) @ Qm @ (x - TARGET) + u @ Rm @ u,
        lambda x: 0.0,
        np.zeros(3), N, 2,
        u_lb=[-1.0, -np.pi / 4], u_ub=[1.0, np.pi / 4],
        u0=np.array(res.us).ravel(),
        maxiter=2000 if N <= 25 else 300)
    # ours must be at least as good as the golden (we hand scipy our
    # solution as a start, so it can only polish)
    assert float(res.cost) <= cost_g + 1e-6 * (1 + abs(cost_g)), (
        f"N={N}: cost {float(res.cost)} vs golden {cost_g}")
    assert abs(float(res.cost) - cost_g) < 1e-5 * (1 + abs(cost_g))
