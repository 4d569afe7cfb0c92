"""Pallas line-search forward kernel vs the XLA scan path (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import mpc_verde_tpu as mv
from mpc_verde_tpu.models import unicycle
from mpc_verde_tpu.ops import rk4_step
from mpc_verde_tpu.ops.pallas.rollout import linesearch_forward_pallas
from mpc_verde_tpu.solver.batched import make_batched_ilqr_solver

NX, NU, NPAR, N, B = 3, 2, 3, 5, 3
T = 0.2


def _problem():
    F = rk4_step(unicycle.f, T)
    Q = jnp.diag(jnp.array([1.0, 5.0, 0.1]))
    R = jnp.diag(jnp.array([0.5, 0.05]))

    def l(x, u, p):
        e = x - p[:3]
        return e @ Q @ e + u @ R @ u

    def lf(x, p):
        e = x - p[:3]
        return 2.0 * (e @ Q @ e)

    cb = mv.box_bounds(jnp.array([-1.0, -np.pi / 4]),
                       jnp.array([1.0, np.pi / 4]))
    return (lambda x, u, p: F(x, u, p)), l, lf, cb


def _xla_linesearch(F, l, lf, cb, x0s, xs, us, ps, kffs, Ks, alphas):
    """Reference: the solver's XLA forward path (vmapped scan + argmin)."""
    ks = jnp.arange(N)

    def forward1(x0, xs, us, ps, kffs, Ks, alpha):
        def step(x, inp):
            x_nom, u_nom, k_ff, K, p, k = inp
            u = u_nom + alpha * k_ff + K @ (x - x_nom)
            lb, ub = cb(x, p, k)
            u = jnp.clip(u, lb, ub)
            return F(x, u, p), (x, u, l(x, u, p))

        xN, (xs_n, us_n, cs) = jax.lax.scan(
            step, x0, (xs[:N], us, kffs, Ks, ps[:N], ks))
        xs_n = jnp.concatenate([xs_n, xN[None]], axis=0)
        return xs_n, us_n, jnp.sum(cs) + lf(xN, ps[N])

    fwd = jax.vmap(forward1, in_axes=(0, 0, 0, 0, 0, 0, None))
    xs_c, us_c, costs = jax.vmap(
        lambda a: fwd(x0s, xs, us, ps, kffs, Ks, a))(jnp.asarray(alphas))
    best = jnp.argmin(costs, axis=0)
    ar = jnp.arange(x0s.shape[0])
    return xs_c[best, ar], us_c[best, ar], costs[best, ar]


@pytest.fixture
def data():
    rng = np.random.default_rng(3)
    x0s = jnp.asarray(rng.uniform(-2, 2, (B, NX)), jnp.float32)
    xs = jnp.asarray(rng.uniform(-2, 2, (B, N + 1, NX)), jnp.float32)
    us = jnp.asarray(rng.uniform(-0.8, 0.8, (B, N, NU)), jnp.float32)
    ps = jnp.broadcast_to(
        jnp.array([10.0, 10.0, 0.0], jnp.float32), (B, N + 1, NPAR))
    kffs = jnp.asarray(0.3 * rng.normal(size=(B, N, NU)), jnp.float32)
    Ks = jnp.asarray(0.2 * rng.normal(size=(B, N, NU, NX)), jnp.float32)
    return x0s, xs, us, ps, kffs, Ks


def test_cse_distinguishes_hash_colliding_params():
    """Regression (ADVICE r3): the CSE memo must key on param VALUES, not
    their hashes.  hash(-1) == hash(-2) in CPython, so integer_pow[y=-1]
    and integer_pow[y=-2] on the same operand would merge under pre-hashed
    keys — and jacfwd of any 1/x term emits both."""
    from mpc_verde_tpu.ops.pallas.rollout import _hoist_consts

    def f(x):
        return jnp.reciprocal(x[0]) + x[0] ** -2

    pure, consts = _hoist_consts(f, jnp.array([2.0]))
    val = float(pure(jnp.array([2.0]), *consts))
    assert np.isclose(val, 0.75), val  # 1/2 + 1/4; the bug returned 1.0

    # derivative chain (the real-world trigger): d/dx (1/x + x^-2) at x=2
    # = -1/4 - 2/8 = -0.5
    g = jax.grad(lambda x: jnp.reciprocal(x) + x ** -2)
    pure_g, consts_g = _hoist_consts(g, jnp.array(2.0))
    assert np.isclose(float(pure_g(jnp.array(2.0), *consts_g)), -0.5)


def test_cse_distinguishes_hash_colliding_literals():
    """Literal operands -1.0 and -2.0 (or any hash-colliding pair) must not
    share a memo entry."""
    from mpc_verde_tpu.ops.pallas.rollout import _hoist_consts

    def f(x):
        return x[0] * (-1.0) + x[0] * (-2.0)

    pure, consts = _hoist_consts(f, jnp.array([3.0]))
    assert np.isclose(float(pure(jnp.array([3.0]), *consts)), -9.0)


def test_kernel_matches_xla_linesearch(data):
    F, l, lf, cb = _problem()
    x0s, xs, us, ps, kffs, Ks = data
    alphas = tuple(0.4 ** i for i in range(6))

    f64 = lambda t: jnp.asarray(t, jnp.float64)
    xs_r, us_r, c_r = _xla_linesearch(
        F, l, lf, cb, f64(x0s), f64(xs), f64(us), f64(ps), f64(kffs),
        f64(Ks), alphas)

    with pltpu.force_tpu_interpret_mode():
        xs_p, us_p, c_p = linesearch_forward_pallas(
            x0s, xs, us, ps, kffs, Ks, alphas=alphas,
            dynamics=F, stage_cost=l, terminal_cost=lf,
            control_bounds=cb, nx=NX, nu=NU)

    # XLA reference runs in x64 under the test config; kernel is f32
    assert np.allclose(np.array(us_p), np.array(us_r, np.float32), atol=5e-5)
    assert np.allclose(np.array(xs_p), np.array(xs_r, np.float32), atol=5e-4)
    assert np.allclose(np.array(c_p), np.array(c_r, np.float32), rtol=5e-5)


def test_removed_layouts_raise():
    """The alpha-layout study is closed (RESULTS_r04): the deleted modes
    must fail loudly, not fall back silently."""
    F, l, lf, cb = _problem()
    z = jnp.zeros((2, NX))
    for mode in ("vector", "unrolled", "sublane"):
        with pytest.raises(ValueError):
            linesearch_forward_pallas(
                z, jnp.zeros((2, N + 1, NX)), jnp.zeros((2, N, NU)),
                jnp.zeros((2, N + 1, NPAR)), jnp.zeros((2, N, NU)),
                jnp.zeros((2, N, NU, NX)), alphas=(1.0, 0.5),
                dynamics=F, stage_cost=l, terminal_cost=lf,
                control_bounds=cb, nx=NX, nu=NU, mode=mode)


def test_kernel_handles_unbounded_controls(data):
    F, l, lf, _ = _problem()
    x0s, xs, us, ps, kffs, Ks = data

    def cb_free(x, p, k):
        return jnp.full((NU,), -jnp.inf), jnp.full((NU,), jnp.inf)

    alphas = (1.0, 0.5)
    f64 = lambda t: jnp.asarray(t, jnp.float64)
    xs_r, us_r, c_r = _xla_linesearch(
        F, l, lf, cb_free, f64(x0s), f64(xs), f64(us), f64(ps), f64(kffs),
        f64(Ks), alphas)
    with pltpu.force_tpu_interpret_mode():
        xs_p, us_p, c_p = linesearch_forward_pallas(
            x0s, xs, us, ps, kffs, Ks, alphas=alphas,
            dynamics=F, stage_cost=l, terminal_cost=lf,
            control_bounds=cb_free, nx=NX, nu=NU)
    assert np.allclose(np.array(us_p), np.array(us_r, np.float32), atol=5e-5)
    assert np.allclose(np.array(c_p), np.array(c_r, np.float32), rtol=5e-5)


@pytest.mark.slow
def test_full_pallas_solver_matches_xla_backend():
    """End-to-end: backend="pallas" (both kernels, interpret) vs "xla"."""
    F, l, lf, cb = _problem()
    ocp = mv.OCP(dynamics=F, stage_cost=l, terminal_cost=lf,
                 N=N, nx=NX, nu=NU, npar=NPAR, control_bounds=cb)
    opts = mv.ILQROptions(max_iters=25, tol_grad=1e-4, tol_cost=1e-7,
                          n_alphas=6, alpha_decay=0.4)

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-1, 1, (B, NX)), jnp.float32)
    ps = jnp.broadcast_to(
        jnp.array([10.0, 10.0, 0.0], jnp.float32), (B, N + 1, NPAR))
    us0 = jnp.zeros((B, N, NU), jnp.float32)

    r_x = make_batched_ilqr_solver(ocp, opts, backend="xla")(x0s, ps, us0)
    with pltpu.force_tpu_interpret_mode():
        r_p = make_batched_ilqr_solver(ocp, opts, backend="pallas")(
            x0s, ps, us0)

    # iterates can diverge slightly between f32 kernels and the x64 XLA
    # path; final costs must agree to solver tolerance
    assert np.allclose(np.array(r_p.cost), np.array(r_x.cost), rtol=1e-3)
    assert bool(jnp.all(r_p.converged))
    assert np.allclose(np.array(r_p.us), np.array(r_x.us), atol=2e-2)


@pytest.mark.slow
def test_full_pallas_solver_al_state_bounds():
    """backend="pallas" on a state-bounded OCP: the AL multipliers ride the
    param tensor straight through both kernels (interpret mode)."""
    F, l, lf, cb = _problem()
    ocp = mv.OCP(dynamics=F, stage_cost=l, terminal_cost=lf,
                 N=N, nx=NX, nu=NU, npar=NPAR, control_bounds=cb,
                 x_lb=jnp.array([-20.0, -0.6, -np.inf]),
                 x_ub=jnp.array([20.0, 0.6, np.inf]))
    opts = mv.ILQROptions(max_iters=25, tol_grad=1e-4, tol_cost=1e-7,
                          n_alphas=6, alpha_decay=0.4, al_iters=2)

    rng = np.random.default_rng(5)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, NX)), jnp.float32)
    ps = jnp.broadcast_to(
        jnp.array([2.0, 2.0, 0.0], jnp.float32), (B, N + 1, NPAR))
    us0 = jnp.zeros((B, N, NU), jnp.float32)

    r_x = make_batched_ilqr_solver(ocp, opts, backend="xla")(x0s, ps, us0)
    with pltpu.force_tpu_interpret_mode():
        r_p = make_batched_ilqr_solver(ocp, opts, backend="pallas")(
            x0s, ps, us0)

    assert bool(jnp.all(r_p.converged))
    # the y box is active and enforced
    assert float(jnp.max(jnp.abs(r_p.xs[:, :, 1]))) <= 0.6 + 1e-2
    assert np.allclose(np.array(r_p.cost), np.array(r_x.cost), rtol=1e-3)
    assert np.allclose(np.array(r_p.max_violation),
                       np.array(r_x.max_violation), atol=1e-3)
