"""Batch-major solver (xla backend) vs the vmapped per-problem solver."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_quorum_exit_caps_straggler_tail():
    # half the batch starts at the target (converges in ~1 iteration), half
    # starts far away (many iterations); quorum=0.5 must stop as soon as the
    # easy half is done and flag the stragglers unconverged
    ocp = _ocp()
    B = 8
    target = jnp.array([5.0, 5.0, 0.0], jnp.float32)
    x0s = jnp.concatenate([
        jnp.broadcast_to(target, (B // 2, 3)),
        jnp.broadcast_to(jnp.array([-8.0, 7.0, 2.0], jnp.float32), (B // 2, 3)),
    ])
    params = jnp.broadcast_to(target, (B, N + 1, 3))
    us0 = jnp.zeros((B, N, 2), jnp.float32)

    r_full = jax.jit(make_batched_ilqr_solver(
        ocp, mv.ILQROptions(max_iters=60), backend="xla"))(x0s, params, us0)
    r_q = jax.jit(make_batched_ilqr_solver(
        ocp, mv.ILQROptions(max_iters=60, quorum=0.5), backend="xla"))(
        x0s, params, us0)

    its_full = np.array(r_full.iterations)
    its_q = np.array(r_q.iterations)
    assert bool(r_full.converged.all())
    # quorum run: the easy half converged, the hard half was cut off early
    conv_q = np.array(r_q.converged)
    assert conv_q[: B // 2].all()
    assert float(conv_q.mean()) >= 0.5
    assert its_q.max() < its_full.max()
    # converged members' solutions are identical between the two runs
    assert np.abs(np.array(r_q.us[: B // 2]) -
                  np.array(r_full.us[: B // 2])).max() < 1e-6


@pytest.mark.slow
def test_drained_solver_finishes_stragglers():
    # same easy/hard split; the drained solver must (a) exit the main batch
    # at quorum, (b) re-solve the hard members in the drain batch, and
    # (c) scatter fully-converged results back — matching the strict
    # (quorum=1.0) solve member-for-member
    from mpc_verde_tpu.solver.batched import make_drained_solver

    ocp = _ocp()
    B = 8
    target = jnp.array([5.0, 5.0, 0.0], jnp.float32)
    x0s = jnp.concatenate([
        jnp.broadcast_to(target, (B // 2, 3)),
        jnp.broadcast_to(jnp.array([-8.0, 7.0, 2.0], jnp.float32), (B // 2, 3)),
    ])
    params = jnp.broadcast_to(target, (B, N + 1, 3))
    us0 = jnp.zeros((B, N, 2), jnp.float32)

    opts = mv.ILQROptions(max_iters=60)
    r_strict = jax.jit(make_batched_ilqr_solver(ocp, opts, backend="xla"))(
        x0s, params, us0)
    # drain_capacity=3 < 4 stragglers forces the chunked (2-pass) drain path
    solve_d = make_drained_solver(ocp, opts, backend="xla", quorum=0.5,
                                  drain_capacity=3)
    r_d = solve_d(x0s, params, us0)

    assert bool(r_strict.converged.all())
    assert bool(r_d.converged.all())
    # every member lands at the same cost as the strict solve
    assert np.allclose(np.array(r_d.cost), np.array(r_strict.cost), rtol=1e-4)
    # easy members pass through phase 1 untouched
    assert np.abs(np.array(r_d.us[: B // 2]) -
                  np.array(r_strict.us[: B // 2])).max() < 1e-6
    # drained members reach the same controls (warm-started continuation of
    # the identical iteration, so agreement is tight)
    assert np.abs(np.array(r_d.us[B // 2:]) -
                  np.array(r_strict.us[B // 2:])).max() < 5e-3


def test_drained_solver_noop_when_all_converge():
    from mpc_verde_tpu.solver.batched import make_drained_solver

    ocp = _ocp()
    B = 4
    rng = np.random.default_rng(3)
    x0s = jnp.array(rng.uniform(-1, 1, (B, 3)), jnp.float32)
    params = jnp.broadcast_to(jnp.array([5.0, 5.0, 0.0], jnp.float32),
                              (B, N + 1, 3))
    solve_d = make_drained_solver(ocp, mv.ILQROptions(max_iters=60),
                                  backend="xla", quorum=0.99)
    r = solve_d(x0s, params, jnp.zeros((B, N, 2), jnp.float32))
    assert bool(r.converged.all())


def _ocp_xbounds():
    """Circular-tracking-style problem: unicycle with a y state box."""
    F = rk4_step(unicycle.f, T)
    Q = jnp.diag(jnp.array([1.0, 1.0, 0.1]))
    R = jnp.diag(jnp.array([0.1, 0.1]))

    def l(x, u, p):
        e = x - p[:3]
        return e @ Q @ e + u @ R @ u

    return mv.OCP(dynamics=lambda x, u, p: F(x, u, p), stage_cost=l,
                  N=N, nx=3, nu=2, npar=3,
                  control_bounds=mv.box_bounds(
                      jnp.array([-1.0, -np.pi / 4]), jnp.array([1.0, np.pi / 4])),
                  x_lb=jnp.array([-20.0, -0.4, -np.inf]),
                  x_ub=jnp.array([20.0, 0.4, np.inf]))


def test_batched_al_state_bounds_matches_vmap():
    """Batched AL fast path == per-problem AL solver on a state-bounded OCP."""
    ocp = _ocp_xbounds()
    opts = mv.ILQROptions(max_iters=60, al_iters=3)
    B = 8
    rng = np.random.default_rng(3)
    x0s = jnp.array(rng.uniform(-0.3, 0.3, (B, 3)))
    # target beyond the y box: the bound must become active
    params = jnp.broadcast_to(jnp.array([2.0, 1.5, 0.0]), (B, N + 1, 3))
    us0 = jnp.zeros((B, N, 2))

    rb = jax.jit(make_batched_ilqr_solver(ocp, opts, backend="xla"))(
        x0s, params, us0)
    rv = jax.jit(jax.vmap(mv.make_ilqr_solver(ocp, opts)))(x0s, params, us0)

    assert bool(rb.converged.all()) and bool(rv.converged.all())
    # the y bound is genuinely active (trajectory pushes into it) ...
    assert float(np.array(rb.xs)[:, :, 1].max()) > 0.35
    # ... and respected to AL tolerance
    assert float(rb.max_violation.max()) < 1e-2
    assert np.allclose(np.array(rb.cost), np.array(rv.cost), rtol=1e-5)
    assert np.abs(np.array(rb.us) - np.array(rv.us)).max() < 1e-4
    assert np.allclose(np.array(rb.max_violation),
                       np.array(rv.max_violation), atol=1e-6)


def test_batched_al_requires_al_iters():
    import pytest

    with pytest.raises(ValueError):
        make_batched_ilqr_solver(_ocp_xbounds(), mv.ILQROptions(al_iters=0),
                                 backend="xla")
