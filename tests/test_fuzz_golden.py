"""Property fuzz: random box-constrained LQ problems vs scipy goldens.

Random linear dynamics (A, B, c) ride the per-stage parameter tensor — the
LTV-as-data pattern — so ONE compiled batched solver instance covers every
random problem.  Box-constrained LQ is convex, so scipy L-BFGS-B on the
condensed rollout cost is a certified global golden; agreement here pins the
whole chain (rollout, linearization, Riccati + exact stage box QPs, line
search, batched iteration control) with none of the local-minimum caveats of
nonlinear fuzzing.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize

import mpc_verde_tpu as mv
from mpc_verde_tpu.solver.batched import make_batched_ilqr_solver
from mpc_verde_tpu.solver.streaming import make_streaming_solver


def _random_problem(rng, nx, nu):
    # spectral radius < 1 keeps rollouts bounded over any horizon
    A = rng.normal(size=(nx, nx))
    A = 0.9 * A / max(np.abs(np.linalg.eigvals(A)).max(), 1e-6)
    B = rng.normal(size=(nx, nu))
    c = 0.3 * rng.normal(size=nx)
    x0 = rng.normal(size=nx)
    return A, B, c, x0


def _make_ocp(nx, nu, N, ub):
    npar = nx * nx + nx * nu + nx

    def unpack(p):
        A = p[: nx * nx].reshape(nx, nx)
        Bm = p[nx * nx: nx * nx + nx * nu].reshape(nx, nu)
        c = p[nx * nx + nx * nu:]
        return A, Bm, c

    def dyn(x, u, p):
        A, Bm, c = unpack(p)
        return A @ x + Bm @ u + c

    def l(x, u, p):
        return x @ x + 0.1 * (u @ u)

    def lf(x, p):
        return 5.0 * (x @ x)

    return mv.OCP(dynamics=dyn, stage_cost=l, terminal_cost=lf,
                  N=N, nx=nx, nu=nu, npar=npar,
                  control_bounds=mv.box_bounds(
                      jnp.full((nu,), -ub), jnp.full((nu,), ub))), unpack


def _scipy_golden(A, B, c, x0, N, nu, ub):
    def cost(uflat):
        us = uflat.reshape(N, nu)
        x = x0.copy()
        J = 0.0
        for k in range(N):
            J += x @ x + 0.1 * (us[k] @ us[k])
            x = A @ x + B @ us[k] + c
        return J + 5.0 * (x @ x)

    g = minimize(cost, np.zeros(N * nu), method="L-BFGS-B",
                 bounds=[(-ub, ub)] * (N * nu),
                 options={"maxiter": 5000, "ftol": 1e-15, "gtol": 1e-12})
    return g.fun, g.x.reshape(N, nu)


@pytest.mark.parametrize("nx,nu,N", [
    (2, 1, 5), (3, 2, 12),
    pytest.param(4, 2, 25, marks=pytest.mark.slow),
])
def test_random_boxed_lq_matches_scipy(nx, nu, N):
    rng = np.random.default_rng(100 * nx + nu + N)
    B_batch = 6
    ub = 0.5  # tight enough that bounds are active in most draws
    ocp, _ = _make_ocp(nx, nu, N, ub)
    probs = [_random_problem(rng, nx, nu) for _ in range(B_batch)]
    ps = np.stack([np.concatenate([A.ravel(), Bm.ravel(), c])
                   for A, Bm, c, _ in probs])
    ps = jnp.broadcast_to(jnp.asarray(ps)[:, None, :],
                          (B_batch, N + 1, ps.shape[-1]))
    x0s = jnp.asarray(np.stack([x0 for *_, x0 in probs]))

    opts = mv.ILQROptions(max_iters=120)
    rb = jax.jit(make_batched_ilqr_solver(ocp, opts, backend="xla"))(
        x0s, ps, jnp.zeros((B_batch, N, nu)))
    rs = jax.jit(make_streaming_solver(ocp, opts, backend="xla",
                                       batch_width=4))(
        x0s, ps, jnp.zeros((B_batch, N, nu)))

    assert bool(rb.converged.all()), "batched solver failed to converge"
    assert bool(rs.converged.all()), "streaming solver failed to converge"
    any_active = False
    for i, (A, Bm, c, x0) in enumerate(probs):
        jg, ug = _scipy_golden(A, Bm, c, x0, N, nu, ub)
        any_active |= bool((np.abs(ug) > ub - 1e-9).any())
        for name, r in (("batched", rb), ("streaming", rs)):
            ji = float(r.cost[i])
            assert abs(ji - jg) <= 1e-8 * (1 + abs(jg)), (
                f"{name} prob {i}: cost {ji} vs scipy {jg}")
            assert np.abs(np.array(r.us[i]) - ug).max() < 1e-5, (
                f"{name} prob {i}: control mismatch")
    assert any_active, "fuzz draw never activated a bound; tighten ub"
