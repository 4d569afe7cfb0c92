"""Exact stage box-QP vs scipy on random problems."""
import jax.numpy as jnp
import numpy as np
import scipy.optimize as so

from mpc_verde_tpu.solver import solve_boxqp
from mpc_verde_tpu.ops.smallmat import small_inv, small_solve


def test_smallmat_inverse_matches_numpy(rng):
    for n in (1, 2, 3):
        A = rng.normal(size=(n, n))
        A = A @ A.T + n * np.eye(n)
        assert np.allclose(np.array(small_inv(jnp.array(A))), np.linalg.inv(A), atol=1e-10)
        b = rng.normal(size=n)
        assert np.allclose(np.array(small_solve(jnp.array(A), jnp.array(b))),
                           np.linalg.solve(A, b), atol=1e-10)


def _golden(H, g, lb, ub):
    bounds = [(lo if np.isfinite(lo) else None, hi if np.isfinite(hi) else None)
              for lo, hi in zip(lb, ub)]
    r = so.minimize(lambda x: 0.5 * x @ H @ x + g @ x, np.zeros(len(g)),
                    jac=lambda x: H @ x + g, bounds=bounds,
                    method="L-BFGS-B", options={"ftol": 1e-16, "gtol": 1e-12})
    return r.x


def test_boxqp_random_2d(rng):
    for _ in range(50):
        A = rng.normal(size=(2, 2))
        H = A @ A.T + 0.3 * np.eye(2)
        g = 3.0 * rng.normal(size=2)
        lb = np.array([-0.5, -np.inf])
        ub = np.array([0.4, 0.2])
        v, m = solve_boxqp(jnp.array(H), jnp.array(g), jnp.array(lb), jnp.array(ub))
        assert np.abs(np.array(v) - _golden(H, g, lb, ub)).max() < 1e-7


def test_boxqp_degenerate_equality():
    H = jnp.eye(2) * 2.0
    g = jnp.array([1.0, -3.0])
    v, m = solve_boxqp(H, g, jnp.array([0.7, 0.7]), jnp.array([0.7, 0.7]))
    assert np.allclose(np.array(v), 0.7)
    assert np.allclose(np.array(m), 0.0)


def test_boxqp_unconstrained():
    H = jnp.array([[2.0, 0.4], [0.4, 1.0]])
    g = jnp.array([1.0, -1.0])
    v, m = solve_boxqp(H, g, jnp.array([-jnp.inf, -jnp.inf]), jnp.array([jnp.inf, jnp.inf]))
    assert np.allclose(np.array(v), -np.linalg.solve(np.array(H), np.array(g)), atol=1e-10)
    assert np.allclose(np.array(m), 1.0)
