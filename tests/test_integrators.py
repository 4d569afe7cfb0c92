"""Integrator/discretization unit tests (SURVEY.md §4: validate dynamics
against analytic/scipy solutions)."""
import jax
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


def test_rk45_matches_scipy_solve_ivp():
    # adaptive embedded RK5(4) vs scipy's RK45 at matching tolerances on the
    # unicycle (smooth) over a long-ish interval where fixed RK4(M=1) drifts
    from scipy.integrate import solve_ivp

    from mpc_verde_tpu.models import unicycle
    from mpc_verde_tpu.ops import rk4_step, rk45_step

    u = jnp.array([0.9, 0.7])
    x0 = jnp.array([0.1, -0.2, 0.3])
    dt = 2.5

    def np_rhs(t, y):
        return np.asarray(unicycle.f(jnp.asarray(y), u, None))

    ref = solve_ivp(np_rhs, (0.0, dt), np.asarray(x0), method="RK45",
                    rtol=1e-10, atol=1e-12).y[:, -1]
    ada = rk45_step(unicycle.f, dt, rtol=1e-9, atol=1e-11)(x0, u)
    assert np.abs(np.asarray(ada) - ref).max() < 1e-7
    # and it must beat single-step RK4 over this interval
    fixed = rk4_step(unicycle.f, dt, M=1)(x0, u)
    assert (np.abs(np.asarray(ada) - ref).max()
            < np.abs(np.asarray(fixed) - ref).max() / 10)


def test_rk45_is_jittable_and_vmappable():
    from mpc_verde_tpu.models import unicycle
    from mpc_verde_tpu.ops import rk45_step

    step = jax.jit(jax.vmap(rk45_step(unicycle.f, 0.5), in_axes=(0, 0)))
    B = 7
    rng = np.random.default_rng(2)
    xs = jnp.array(rng.normal(size=(B, 3)))
    us = jnp.array(rng.uniform(-1, 1, (B, 2)))
    out = step(xs, us)
    assert out.shape == (B, 3)
    # batch results equal per-item results (lockstep adaptation is per-member)
    one = rk45_step(unicycle.f, 0.5)
    for b in range(B):
        np.testing.assert_allclose(np.asarray(out[b]),
                                   np.asarray(one(xs[b], us[b])),
                                   rtol=1e-12, atol=1e-12)


def test_discrete_simulator_rk45_method():
    from mpc_verde_tpu.models import unicycle
    from mpc_verde_tpu.ops import DiscreteSimulator

    sim4 = DiscreteSimulator(unicycle.f, 0.2, M=50)
    sim45 = DiscreteSimulator(unicycle.f, 0.2, method="rk45",
                              rtol=1e-10, atol=1e-12)
    x = jnp.array([0.0, 0.0, 0.4])
    u = jnp.array([1.0, -0.5])
    np.testing.assert_allclose(np.asarray(sim45.sim(x, u)),
                               np.asarray(sim4.sim(x, u)), atol=1e-8)
