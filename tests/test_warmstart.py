"""LQR warm start (`solver/warmstart.py`).

The round-5 study (docs/design.md "Warm-start study") found policy warm
starts HURT on the nonconvex diff-drive problem — these tests pin the case
the tool is actually for: (near-)linear problems, where the LQR policy about
the reference is essentially the optimum and the solver only polishes.
"""
import jax
import jax.numpy as jnp
import numpy as np

import mpc_verde_tpu as mv
from mpc_verde_tpu.solver.batched import make_batched_ilqr_solver
from mpc_verde_tpu.solver.warmstart import make_lqr_warm_start


def _double_integrator_ocp(N=20, dt=0.1):
    A = jnp.array([[1.0, dt], [0.0, 1.0]])
    Bm = jnp.array([[0.5 * dt * dt], [dt]])
    Q = jnp.diag(jnp.array([10.0, 1.0]))
    R = 0.1 * jnp.eye(1)

    def l(x, u, p):
        e = x - p[:2]
        return e @ Q @ e + u @ R @ u

    return mv.OCP(dynamics=lambda x, u, p: A @ x + Bm @ u, stage_cost=l,
                  N=N, nx=2, nu=1, npar=2)


def test_lqr_warm_start_is_near_optimal_on_linear_problem():
    ocp = _double_integrator_ocp()
    warm = jax.jit(make_lqr_warm_start(ocp, xref_fn=lambda p: p[:2]))
    solve = jax.jit(make_batched_ilqr_solver(
        ocp, mv.ILQROptions(max_iters=60), backend="xla"))
    B = 8
    rng = np.random.default_rng(3)
    x0s = jnp.array(rng.uniform(-1, 1, (B, 2)))
    ps = jnp.broadcast_to(jnp.array([1.0, 0.0]), (B, ocp.N + 1, 2))

    us_w = warm(x0s, ps)
    r_cold = solve(x0s, ps, None)
    r_warm = solve(x0s, ps, us_w)
    assert bool(r_cold.converged.all()) and bool(r_warm.converged.all())
    # LQ problem: the LQR policy IS the unconstrained optimum -> the warm
    # solve terminates almost immediately and at the same cost
    assert float(r_warm.iterations.mean()) <= float(r_cold.iterations.mean())
    assert float(r_warm.iterations.max()) <= 3
    np.testing.assert_allclose(np.array(r_warm.cost), np.array(r_cold.cost),
                               rtol=1e-6)


def test_lqr_warm_start_respects_control_box():
    ocp = _double_integrator_ocp()
    import dataclasses
    ocp = dataclasses.replace(
        ocp, control_bounds=mv.box_bounds(jnp.array([-0.4]),
                                          jnp.array([0.4])))
    warm = jax.jit(make_lqr_warm_start(ocp, xref_fn=lambda p: p[:2]))
    B = 4
    rng = np.random.default_rng(4)
    x0s = jnp.array(rng.uniform(-3, 3, (B, 2)))  # far: gains saturate
    ps = jnp.broadcast_to(jnp.array([1.0, 0.0]), (B, ocp.N + 1, 2))
    us_w = np.array(warm(x0s, ps))
    assert (us_w >= -0.4 - 1e-12).all() and (us_w <= 0.4 + 1e-12).all()
    # saturation must actually occur for the clip to have been exercised
    assert np.isclose(np.abs(us_w), 0.4, atol=1e-9).any()
