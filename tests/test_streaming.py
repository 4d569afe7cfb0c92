"""Streaming (persistent-batch) solver vs the strict batched solver.

The streaming solver must be a pure throughput optimization: per-problem
results (iterates, costs, iteration counts, convergence flags) match the
batched solver exactly — on one backend the shared iteration body makes the
trajectories bitwise identical.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mpc_verde_tpu as mv
from mpc_verde_tpu.models import unicycle
from mpc_verde_tpu.ops import rk4_step
from mpc_verde_tpu.solver.batched import make_batched_ilqr_solver
from mpc_verde_tpu.solver.streaming import make_streaming_solver

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


def _queue(M, seed=11):
    rng = np.random.default_rng(seed)
    x0s = jnp.array(rng.uniform(-1, 1, (M, 3)), jnp.float32)
    params = jnp.broadcast_to(jnp.array([5.0, 5.0, 0.0], jnp.float32),
                              (M, N + 1, 3))
    us0 = jnp.zeros((M, N, 2), jnp.float32)
    return x0s, params, us0


def test_streaming_matches_batched_exactly():
    ocp = _ocp()
    opts = mv.ILQROptions(max_iters=60)
    M = 24
    x0s, params, us0 = _queue(M)
    rb = jax.jit(make_batched_ilqr_solver(ocp, opts, backend="xla"))(
        x0s, params, us0)
    # B < M forces multiple refill generations through every slot
    rs = jax.jit(make_streaming_solver(ocp, opts, backend="xla",
                                       batch_width=5))(x0s, params, us0)
    assert bool(rs.converged.all())
    np.testing.assert_array_equal(np.array(rb.iterations),
                                  np.array(rs.iterations))
    np.testing.assert_array_equal(np.array(rb.cost), np.array(rs.cost))
    # trajectories agree to compile-level rounding (the two programs fuse
    # slightly differently; observed drift is ~1 ulp)
    np.testing.assert_allclose(np.array(rb.us), np.array(rs.us),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.array(rb.xs), np.array(rs.xs),
                               rtol=0, atol=1e-12)


def test_streaming_refill_cadence_matches_strict_schedule():
    """refill_every=R is a pure scheduling change: per-problem results
    (cost, iterations, convergence, trajectories) must match the strict
    refill-every-iteration schedule exactly — a finished slot just idles
    up to R-1 iterations before its result is scattered."""
    ocp = _ocp()
    opts = mv.ILQROptions(max_iters=60)
    M = 24
    x0s, params, us0 = _queue(M, seed=7)
    r1 = jax.jit(make_streaming_solver(ocp, opts, backend="xla",
                                       batch_width=5))(x0s, params, us0)
    r3 = jax.jit(make_streaming_solver(ocp, opts, backend="xla",
                                       batch_width=5, refill_every=3))(
        x0s, params, us0)
    assert bool(r3.converged.all())
    np.testing.assert_array_equal(np.array(r1.iterations),
                                  np.array(r3.iterations))
    np.testing.assert_array_equal(np.array(r1.cost), np.array(r3.cost))
    # trajectories agree to compile-level rounding (the fori_loop body
    # fuses slightly differently; observed drift is ~1 ulp)
    np.testing.assert_allclose(np.array(r1.us), np.array(r3.us),
                               rtol=0, atol=1e-12)


def test_streaming_queue_shorter_than_batch():
    ocp = _ocp()
    opts = mv.ILQROptions(max_iters=60)
    M = 3
    x0s, params, us0 = _queue(M, seed=3)
    rb = jax.jit(make_batched_ilqr_solver(ocp, opts, backend="xla"))(
        x0s, params, us0)
    rs = jax.jit(make_streaming_solver(ocp, opts, backend="xla",
                                       batch_width=8))(x0s, params, us0)
    assert rs.us.shape == (M, N, 2)
    assert bool(rs.converged.all())
    np.testing.assert_array_equal(np.array(rb.cost), np.array(rs.cost))
    np.testing.assert_array_equal(np.array(rb.us), np.array(rs.us))


def test_streaming_iteration_cap_flags_unconverged():
    # a 2-iteration budget cannot solve the far-away problems: they must
    # come back converged=False (capped), near ones converged=True, and the
    # loop must still terminate (slot freed after the budget)
    ocp = _ocp()
    opts = mv.ILQROptions(max_iters=2)
    target = jnp.array([5.0, 5.0, 0.0], jnp.float32)
    x0s = jnp.stack([
        target,
        jnp.array([-8.0, 7.0, 2.0], jnp.float32),
        target,
        jnp.array([-9.0, 6.0, -2.0], jnp.float32),
    ])
    params = jnp.broadcast_to(target, (4, N + 1, 3))
    us0 = jnp.zeros((4, N, 2), jnp.float32)
    rs = jax.jit(make_streaming_solver(ocp, opts, backend="xla",
                                       batch_width=2))(x0s, params, us0)
    conv = np.array(rs.converged)
    assert conv[0] and conv[2]
    assert not conv[1] and not conv[3]
    # capped members still report their best iterate, not garbage
    assert np.isfinite(np.array(rs.cost)).all()
    assert int(np.array(rs.iterations)[1]) == 2


def test_streaming_restarts_recover_budget_capped_problems():
    # a budget below a problem's iteration need caps it unconverged; with
    # requeue-in-place restarts (fresh solver state, warm-started at the
    # best iterate — the drain-restart of make_drained_solver) the problem
    # must finish, and reported iterations accumulate across restarts.
    # NB: the per-cycle budget must be realistic (>= the stall window) — a
    # tiny budget resets regularization faster than it can escalate.
    ocp = _ocp()
    M = 6
    x0s, params, us0 = _queue(M, seed=21)
    ref = jax.jit(make_batched_ilqr_solver(ocp, mv.ILQROptions(max_iters=80),
                                           backend="xla"))(x0s, params, us0)
    need = np.array(ref.iterations)
    assert need.max() > need.min()  # heterogeneous difficulty
    budget = int(need.max()) - 1    # hardest problem cannot fit one budget
    opts = mv.ILQROptions(max_iters=budget)
    no_rst = jax.jit(make_streaming_solver(ocp, opts, backend="xla",
                                           batch_width=3))(x0s, params, us0)
    with_rst = jax.jit(make_streaming_solver(ocp, opts, backend="xla",
                                             batch_width=3, restarts=8))(
        x0s, params, us0)
    assert not bool(no_rst.converged.all())
    assert bool(with_rst.converged.all())
    # a problem that needed restarts reports more iterations than one budget
    hard = ~np.array(no_rst.converged)
    assert (np.array(with_rst.iterations)[hard] > budget).all()
    # solutions land at the same optima as the unconstrained-budget solver
    assert np.allclose(np.array(with_rst.cost), np.array(ref.cost), rtol=1e-3)


def test_streaming_warm_start_reduces_iterations():
    ocp = _ocp()
    opts = mv.ILQROptions(max_iters=60)
    M = 12
    x0s, params, us0 = _queue(M, seed=7)
    solve = jax.jit(make_streaming_solver(ocp, opts, backend="xla",
                                          batch_width=4))
    cold = solve(x0s, params, us0)
    warm_guess = jnp.concatenate([cold.us[:, 1:], cold.us[:, -1:]], axis=1)
    warm = solve(x0s + 0.01, params, warm_guess)
    assert bool(warm.converged.all())
    assert float(warm.iterations.mean()) < float(cold.iterations.mean())


def test_streaming_params_broadcast_conveniences():
    ocp = _ocp()
    opts = mv.ILQROptions(max_iters=60)
    M = 6
    x0s, params, us0 = _queue(M, seed=5)
    solve = jax.jit(make_streaming_solver(ocp, opts, backend="xla",
                                          batch_width=4))
    full = solve(x0s, params, us0)
    shared = solve(x0s, jnp.array([5.0, 5.0, 0.0], jnp.float32), us0)
    np.testing.assert_array_equal(np.array(full.us), np.array(shared.us))


def test_costonly_linesearch_converges_to_same_solutions():
    # costonly sweeps alphas without materializing; decisions can differ at
    # f32 round-off, so compare converged optima rather than iterates
    ocp = _ocp()
    opts = mv.ILQROptions(max_iters=60)
    M = 12
    x0s, params, us0 = _queue(M, seed=9)
    ra = jax.jit(make_batched_ilqr_solver(
        ocp, opts, backend="xla", linesearch="materialize"))(x0s, params, us0)
    rc = jax.jit(make_batched_ilqr_solver(
        ocp, opts, backend="xla", linesearch="costonly"))(x0s, params, us0)
    assert bool(ra.converged.all()) and bool(rc.converged.all())
    assert np.allclose(np.array(ra.cost), np.array(rc.cost), rtol=1e-4)
    assert np.abs(np.array(ra.us) - np.array(rc.us)).max() < 5e-3


def test_streaming_isolates_nonfinite_queue_entries():
    # one NaN x0 in the queue must fail ONLY its own problem — the shared
    # varying-zero must not mix problem data across the batch
    ocp = _ocp()
    opts = mv.ILQROptions(max_iters=60)
    M = 6
    x0s, params, us0 = _queue(M, seed=31)
    x0s = x0s.at[2].set(jnp.nan)
    rs = jax.jit(make_streaming_solver(ocp, opts, backend="xla",
                                       batch_width=3))(x0s, params, us0)
    conv = np.array(rs.converged)
    assert not conv[2]
    assert conv[[0, 1, 3, 4, 5]].all()
    assert np.isfinite(np.array(rs.cost)[[0, 1, 3, 4, 5]]).all()


def _ocp_xbounds():
    F = rk4_step(unicycle.f, T)
    Q = jnp.diag(jnp.array([1.0, 1.0, 0.1]))
    R = jnp.diag(jnp.array([0.1, 0.1]))

    def l(x, u, p):
        e = x - p[:3]
        return e @ Q @ e + u @ R @ u

    return mv.OCP(dynamics=lambda x, u, p: F(x, u, p), stage_cost=l,
                  N=N, nx=3, nu=2, npar=3,
                  control_bounds=mv.box_bounds(
                      jnp.array([-1.0, -np.pi / 4]),
                      jnp.array([1.0, np.pi / 4])),
                  x_lb=jnp.array([-20.0, -0.4, -np.inf]),
                  x_ub=jnp.array([20.0, 0.4, np.inf]))


def test_streaming_al_state_bounds_matches_vmap_solver():
    """Streaming AL (multipliers in the slot param tensor, rounds as in-place
    restarts) == the per-problem AL solver, through multiple refill
    generations."""
    ocp = _ocp_xbounds()
    opts = mv.ILQROptions(max_iters=60, al_iters=3)
    M = 12
    rng = np.random.default_rng(7)
    x0s = jnp.array(rng.uniform(-0.3, 0.3, (M, 3)))
    params = jnp.broadcast_to(jnp.array([2.0, 1.5, 0.0]), (M, N + 1, 3))
    us0 = jnp.zeros((M, N, 2))

    rs = jax.jit(make_streaming_solver(ocp, opts, backend="xla",
                                       batch_width=5))(x0s, params, us0)
    rv = jax.jit(jax.vmap(mv.make_ilqr_solver(ocp, opts)))(x0s, params, us0)

    assert bool(rs.converged.all()) and bool(rv.converged.all())
    # bound genuinely active and respected
    assert float(np.array(rs.xs)[:, :, 1].max()) > 0.35
    assert float(rs.max_violation.max()) < 1e-2
    assert np.allclose(np.array(rs.cost), np.array(rv.cost), rtol=1e-5)
    assert np.abs(np.array(rs.us) - np.array(rv.us)).max() < 1e-4
    assert np.allclose(np.array(rs.max_violation),
                       np.array(rv.max_violation), atol=1e-6)


def test_streaming_al_requires_al_iters():
    import pytest

    with pytest.raises(ValueError):
        make_streaming_solver(_ocp_xbounds(), mv.ILQROptions(al_iters=0),
                              backend="xla")


@pytest.mark.slow
def test_streaming_runtime_budget_overrides_match_static():
    """max_iters / restarts passed at call time (traced data) must reproduce
    the build-time-static behavior exactly — one executable, every serving
    mode (VERDICT r2 #2)."""
    ocp = _ocp()
    M = 6
    x0s, params, us0 = _queue(M, seed=21)
    ref = jax.jit(make_batched_ilqr_solver(ocp, mv.ILQROptions(max_iters=80),
                                           backend="xla"))(x0s, params, us0)
    budget = int(np.array(ref.iterations).max()) - 1
    # ONE jitted streaming solver, budgets as runtime scalars
    solve = jax.jit(make_streaming_solver(
        ocp, mv.ILQROptions(max_iters=80), backend="xla", batch_width=3))
    no_rst = solve(x0s, params, us0, budget, 0)
    with_rst = solve(x0s, params, us0, budget, 8)
    # static-built twins
    s_no = jax.jit(make_streaming_solver(
        ocp, mv.ILQROptions(max_iters=budget), backend="xla",
        batch_width=3))(x0s, params, us0)
    s_rst = jax.jit(make_streaming_solver(
        ocp, mv.ILQROptions(max_iters=budget), backend="xla", batch_width=3,
        restarts=8))(x0s, params, us0)
    for got, want in ((no_rst, s_no), (with_rst, s_rst)):
        np.testing.assert_array_equal(np.array(got.converged),
                                      np.array(want.converged))
        np.testing.assert_array_equal(np.array(got.iterations),
                                      np.array(want.iterations))
        np.testing.assert_array_equal(np.array(got.us), np.array(want.us))
    assert not bool(no_rst.converged.all())
    assert bool(with_rst.converged.all())
