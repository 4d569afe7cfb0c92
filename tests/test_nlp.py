"""General AL/projected-Newton NLP solver vs closed-form and scipy answers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_verde_tpu.solver.nlp import NLPOptions, make_nlpsol


def test_unconstrained_quadratic():
    rng = np.random.default_rng(0)
    n = 7
    M = rng.normal(size=(n, n))
    Q = M @ M.T + n * np.eye(n)
    c = rng.normal(size=n)
    f = lambda x, p: 0.5 * x @ jnp.asarray(Q) @ x + jnp.asarray(c) @ x
    solve = jax.jit(make_nlpsol(f, None, n, 0))
    res = solve(jnp.zeros(n))
    assert bool(res.converged)
    np.testing.assert_allclose(np.array(res.x), np.linalg.solve(Q, -c),
                               atol=1e-7)


def test_box_constrained_quadratic_matches_scipy():
    from scipy.optimize import minimize

    rng = np.random.default_rng(1)
    n = 6
    M = rng.normal(size=(n, n))
    Q = M @ M.T + n * np.eye(n)
    c = 3.0 * rng.normal(size=n)
    lb, ub = -0.3 * np.ones(n), 0.4 * np.ones(n)
    fnp = lambda x: 0.5 * x @ Q @ x + c @ x
    ref = minimize(fnp, np.zeros(n), jac=lambda x: Q @ x + c,
                   bounds=list(zip(lb, ub)), method="L-BFGS-B",
                   options={"ftol": 1e-15, "gtol": 1e-12})
    f = lambda x, p: 0.5 * x @ jnp.asarray(Q) @ x + jnp.asarray(c) @ x
    solve = jax.jit(make_nlpsol(f, None, n, 0))
    res = solve(jnp.zeros(n), lbx=lb, ubx=ub)
    assert bool(res.converged)
    np.testing.assert_allclose(np.array(res.x), ref.x, atol=1e-6)


def test_equality_constrained_qp_kkt():
    rng = np.random.default_rng(2)
    n, m = 8, 3
    M = rng.normal(size=(n, n))
    Q = M @ M.T + n * np.eye(n)
    c = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    b = rng.normal(size=m)
    KKT = np.block([[Q, A.T], [A, np.zeros((m, m))]])
    sol = np.linalg.solve(KKT, np.concatenate([-c, b]))
    x_star, lam_star = sol[:n], sol[n:]

    f = lambda x, p: 0.5 * x @ jnp.asarray(Q) @ x + jnp.asarray(c) @ x
    g = lambda x, p: jnp.asarray(A) @ x - jnp.asarray(b)
    solve = jax.jit(make_nlpsol(f, g, n, m))
    res = solve(jnp.zeros(n), lbg=np.zeros(m), ubg=np.zeros(m))
    assert bool(res.converged)
    np.testing.assert_allclose(np.array(res.x), x_star, atol=1e-6)
    np.testing.assert_allclose(np.array(res.lam_g), lam_star, atol=1e-4)


def test_active_inequality():
    # min (x0-2)^2 + (x1+1)^2  s.t.  x0 + x1 <= 0.5  ->  active
    f = lambda x, p: (x[0] - 2.0) ** 2 + (x[1] + 1.0) ** 2
    g = lambda x, p: jnp.array([x[0] + x[1]])
    solve = jax.jit(make_nlpsol(f, g, 2, 1))
    res = solve(jnp.zeros(2), ubg=np.array([0.5]))
    assert bool(res.converged)
    # analytic: project (2,-1) onto halfspace x0+x1<=0.5
    t = (2.0 - 1.0 - 0.5) / 2.0
    np.testing.assert_allclose(np.array(res.x), [2.0 - t, -1.0 - t],
                               atol=1e-6)
    assert float(res.lam_g[0]) > 0  # multiplier sign for an active <= row


def test_rosenbrock_with_bounds():
    from scipy.optimize import minimize, rosen, rosen_der

    n = 4
    lb, ub = np.full(n, -0.5), np.full(n, 0.8)
    ref = minimize(rosen, np.zeros(n), jac=rosen_der,
                   bounds=list(zip(lb, ub)), method="L-BFGS-B",
                   options={"ftol": 1e-15, "gtol": 1e-12})

    def f(x, p):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1.0 - x[:-1]) ** 2)

    solve = jax.jit(make_nlpsol(f, None, n, 0))
    res = solve(jnp.zeros(n), lbx=lb, ubx=ub)
    assert bool(res.converged)
    np.testing.assert_allclose(np.array(res.x), ref.x, atol=1e-6)


def test_vmapped_batch_of_nlps():
    # one solver instance, a batch of shifted problems
    f = lambda x, p: jnp.sum((x - p) ** 2)
    g = lambda x, p: jnp.array([jnp.sum(x)])
    solve = make_nlpsol(f, g, 3, 1)
    targets = jnp.asarray(np.random.default_rng(3).normal(size=(16, 3)))
    vsolve = jax.jit(jax.vmap(
        lambda p: solve(jnp.zeros(3), p=p, lbg=jnp.zeros(1),
                        ubg=jnp.zeros(1))))
    res = vsolve(targets)
    assert bool(jnp.all(res.converged))
    # analytic: projection of target onto sum(x)=0
    t = np.asarray(targets)
    expect = t - t.mean(axis=1, keepdims=True)
    np.testing.assert_allclose(np.array(res.x), expect, atol=1e-6)


def test_nlp_nonlinear_constraint():
    # min -x0-x1 s.t. x0^2+x1^2 = 1  ->  x = (1,1)/sqrt(2)
    f = lambda x, p: -(x[0] + x[1])
    g = lambda x, p: jnp.array([x[0] ** 2 + x[1] ** 2])
    solve = jax.jit(make_nlpsol(f, g, 2, 1))
    res = solve(jnp.array([0.5, 0.1]), lbg=jnp.ones(1), ubg=jnp.ones(1))
    assert bool(res.converged)
    np.testing.assert_allclose(np.array(res.x),
                               np.ones(2) / np.sqrt(2), atol=1e-6)
