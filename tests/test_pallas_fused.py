"""Fused derivs+backward kernel vs the XLA derivs -> backward path.

The fused kernel (``ops/pallas/fused.py``) computes the stage derivatives
in-VMEM from the trajectory and shares the per-stage recursion with the
HBM-derivative kernel, so agreement with the XLA two-phase path validates
both the in-kernel linearization and the plumbing.  Runs in TPU interpret
mode on CPU (same harness as test_pallas_riccati / test_pallas_rollout).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import mpc_verde_tpu as mv
from mpc_verde_tpu.models import unicycle
from mpc_verde_tpu.ops import rk4_step
from mpc_verde_tpu.solver.batched import _make_parts

NX, NU, NPAR, N, B = 3, 2, 3, 5, 3
T = 0.2


def _ocp(bounded=True, use_terminal=True):
    F = rk4_step(unicycle.f, T)
    Q = np.diag(np.array([1.0, 5.0, 0.1], np.float32))
    R = np.diag(np.array([0.5, 0.05], np.float32))

    def l(x, u, p):
        e = x - p[:3]
        return e @ Q @ e + u @ R @ u

    def lf(x, p):
        e = x - p[:3]
        return 2.0 * (e @ Q @ e)

    cb = mv.box_bounds(np.array([-1.0, -np.pi / 4], np.float32),
                       np.array([1.0, np.pi / 4], np.float32)) if bounded \
        else None
    return mv.OCP(dynamics=lambda x, u, p: F(x, u, p), stage_cost=l,
                  terminal_cost=lf if use_terminal else None,
                  N=N, nx=NX, nu=NU, npar=NPAR, control_bounds=cb)


@pytest.mark.parametrize("bounded,use_ddp,use_terminal", [
    (True, True, True),
    pytest.param(True, False, True, marks=pytest.mark.slow),
    pytest.param(False, True, False, marks=pytest.mark.slow),
])
def test_fused_matches_xla_backward(rng, bounded, use_ddp, use_terminal):
    ocp = _ocp(bounded, use_terminal)
    opt = mv.ILQROptions(use_ddp=use_ddp)
    xla = _make_parts(ocp, opt, "xla", "materialize")

    x0s = jnp.array(rng.uniform(-2, 2, (B, NX)))
    ps = jnp.broadcast_to(jnp.array([10.0, 10.0, 0.0]),
                          (B, N + 1, NPAR))
    us = jnp.array(0.2 * rng.standard_normal((B, N, NU)))
    xs, us_c, _ = jax.jit(xla.rollout)(x0s, us, ps)
    reg = jnp.full((B,), 1e-5)
    ddp = jnp.ones((B,))

    d, gN, HN, dlb, dub = jax.jit(xla.derivs)(xs, us_c, ps)
    kff_r, K_r, dV1_r, dV2_r, gmax_r = jax.jit(xla.backward)(
        d, gN, HN, dlb, dub, reg, ddp)

    fused_parts = _make_parts(ocp, opt, "pallas_fused", "materialize")
    with pltpu.force_tpu_interpret_mode():
        kff, K, dV1, dV2, gmax = fused_parts.fused(xs, us_c, ps, reg, ddp)

    # f32 kernel vs (x64-config) XLA reference: agreement to f32 round-off
    np.testing.assert_allclose(kff, kff_r, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(K, K_r, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(dV1, dV1_r, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(dV2, dV2_r, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(gmax, gmax_r, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_fused_full_solve_matches_pallas_bw(rng):
    """End-to-end batched solve: pallas_fused == xla backend trajectories."""
    ocp = _ocp(True, True)
    opt = mv.ILQROptions(max_iters=12, tol_grad=1e-4, tol_cost=1e-6)
    from mpc_verde_tpu.solver.batched import make_batched_ilqr_solver

    x0s = jnp.array(rng.uniform(-1, 1, (B, NX)))
    ps = jnp.broadcast_to(jnp.array([3.0, 3.0, 0.0]),
                          (B, N + 1, NPAR))
    us0 = jnp.zeros((B, N, NU))

    r_x = jax.jit(make_batched_ilqr_solver(ocp, opt, backend="xla"))(
        x0s, ps, us0)
    with pltpu.force_tpu_interpret_mode():
        solve_f = make_batched_ilqr_solver(ocp, opt, backend="pallas_fused")
        r_f = solve_f(x0s, ps, us0)
    np.testing.assert_allclose(r_f.us, r_x.us, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(r_f.cost, r_x.cost, rtol=1e-3)
