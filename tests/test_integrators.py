"""Integrator/discretization unit tests (SURVEY.md §4: validate dynamics
against analytic/scipy solutions)."""
import jax.numpy as jnp
import numpy as np
import scipy.linalg
import scipy.integrate

from mpc_verde_tpu.models import unicycle, cart_pendulum_linear
from mpc_verde_tpu.ops import c2d, euler_step, rk4_step, rk4_step_with_quadrature, DiscreteSimulator


def test_rk4_matches_scipy_on_unicycle():
    x0 = np.array([0.1, -0.2, 0.5])
    u = np.array([0.8, 0.3])
    dt = 0.2
    step = rk4_step(unicycle.f, dt, M=4)
    ours = np.array(step(jnp.array(x0), jnp.array(u)))
    sol = scipy.integrate.solve_ivp(
        lambda t, x: np.array([u[0] * np.cos(x[2]), u[0] * np.sin(x[2]), u[1]]),
        (0, dt), x0, rtol=1e-12, atol=1e-12)
    assert np.allclose(ours, sol.y[:, -1], atol=1e-8)


def test_euler_is_first_order():
    x0 = jnp.array([0.0, 0.0, 0.3])
    u = jnp.array([1.0, 0.5])
    e1 = euler_step(unicycle.f, 0.1)(x0, u)
    exact = rk4_step(unicycle.f, 0.1, M=16)(x0, u)
    e2 = euler_step(unicycle.f, 0.05)(x0, u)  # only for shape sanity
    assert e1.shape == exact.shape == e2.shape
    assert np.abs(np.array(e1 - exact)).max() < 5e-3


def test_c2d_matches_scipy_expm():
    m = cart_pendulum_linear()
    dt = 0.01
    Ad, Bd = c2d(m.Ac, m.Bc, dt)
    nx, nu = 4, 1
    blk = np.zeros((nx + nu, nx + nu))
    blk[:nx, :nx] = np.array(m.Ac)
    blk[:nx, nx:] = np.array(m.Bc)
    M = scipy.linalg.expm(blk * dt)
    assert np.allclose(np.array(Ad), M[:nx, :nx], atol=1e-12)
    assert np.allclose(np.array(Bd), M[:nx, nx:], atol=1e-12)


def test_rk4_quadrature_integrates_cost():
    # For xdot = u (scalar), l = x^2, starting at x=0, u=1:
    # q(T) = int_0^T t^2 dt = T^3/3 exactly (RK4 is exact for cubics).
    f = lambda x, u, p: u
    l = lambda x, u, p: x[0] ** 2
    step = rk4_step_with_quadrature(f, l, dt=0.3, M=1)
    xf, q = step(jnp.array([0.0]), jnp.array([1.0]))
    assert np.allclose(np.array(xf), 0.3)
    assert np.allclose(np.array(q), 0.3 ** 3 / 3.0, atol=1e-12)


def test_discrete_simulator_substep_accuracy():
    sim = DiscreteSimulator(unicycle, 0.2, M=10)
    x0 = np.array([0.0, 0.0, 0.0])
    u = np.array([1.0, 0.7])
    got = np.array(sim.sim(x0, u))
    sol = scipy.integrate.solve_ivp(
        lambda t, x: np.array([u[0] * np.cos(x[2]), u[0] * np.sin(x[2]), u[1]]),
        (0, 0.2), x0, rtol=1e-12, atol=1e-12)
    assert np.allclose(got, sol.y[:, -1], atol=1e-10)
