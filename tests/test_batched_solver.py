"""Batch-major solver (xla backend) vs the vmapped per-problem solver."""
import jax
import jax.numpy as jnp
import numpy as np

import mpc_verde_tpu as mv
from mpc_verde_tpu.models import unicycle
from mpc_verde_tpu.ops import rk4_step
from mpc_verde_tpu.solver.batched import make_batched_ilqr_solver

T, N = 0.2, 8


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


def test_batched_xla_matches_vmap():
    ocp = _ocp()
    opts = mv.ILQROptions(max_iters=60)
    B = 8
    rng = np.random.default_rng(11)
    x0s = jnp.array(rng.uniform(-1, 1, (B, 3)), jnp.float32)
    params = jnp.broadcast_to(jnp.array([5.0, 5.0, 0.0], jnp.float32),
                              (B, N + 1, 3))
    us0 = jnp.zeros((B, N, 2), jnp.float32)

    rb = jax.jit(make_batched_ilqr_solver(ocp, opts, backend="xla"))(
        x0s, params, us0)
    rv = jax.jit(jax.vmap(mv.make_ilqr_solver(ocp, opts)))(x0s, params, us0)

    # identical math modulo f32/f64 promotion differences: costs must agree
    # closely and both fully converge
    assert bool(rb.converged.all()) and bool(rv.converged.all())
    assert np.allclose(np.array(rb.cost), np.array(rv.cost), rtol=1e-4)
    assert np.abs(np.array(rb.us) - np.array(rv.us)).max() < 5e-3
