"""Associative-scan LQT backward vs the sequential Riccati recursion."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_verde_tpu.ops.parallel_riccati import (lqt_backward_parallel,
                                                lqt_gains, lqt_solve_parallel)


def _sequential_lqt(x0, Fs, cs, Ls, Xs, rs, Us, XN, rN):
    """Textbook backward Riccati for the same LQT problem (numpy, f64)."""
    N, nx = Fs.shape[0], Fs.shape[-1]
    J = XN.copy()
    eta = XN @ rN
    Ks, ks = [], []
    for k in range(N - 1, -1, -1):
        F, c, L, X, r, U = Fs[k], cs[k], Ls[k], Xs[k], rs[k], Us[k]
        S = U + L.T @ J @ L
        K = np.linalg.solve(S, L.T @ J @ F)
        kf = np.linalg.solve(S, L.T @ (eta - J @ c))
        Ks.append(K); ks.append(kf)
        FK = F - L @ K
        # V_k(x) = 1/2 x'Jx - eta'x with stage cost 1/2(x-r)'X(x-r):
        # eta_k = X r + K'U k_ff + (F - LK)'(eta - J(c + L k_ff))
        eta_new = X @ r + K.T @ U @ kf + FK.T @ (eta - J @ (c + L @ kf))
        J = X + F.T @ J @ FK
        J = 0.5 * (J + J.T)
        eta = eta_new
    Ks, ks = Ks[::-1], ks[::-1]
    xs = [x0]
    us = []
    for k in range(N):
        u = ks[k] - Ks[k] @ xs[-1]
        us.append(u)
        xs.append(Fs[k] @ xs[-1] + cs[k] + Ls[k] @ u)
    return np.array(xs), np.array(us)


def _random_lqt(rng, N=40, nx=4, nu=2):
    Fs = np.tile(np.eye(nx), (N, 1, 1)) + 0.05 * rng.normal(size=(N, nx, nx))
    cs = 0.1 * rng.normal(size=(N, nx))
    Ls = 0.3 * rng.normal(size=(N, nx, nu))
    Xs = np.tile(np.eye(nx), (N, 1, 1)) * rng.uniform(0.1, 2.0, (N, 1, 1))
    rs = rng.normal(size=(N, nx))
    Us = np.tile(np.eye(nu), (N, 1, 1)) * rng.uniform(0.5, 2.0, (N, 1, 1))
    XN = 2.0 * np.eye(nx)
    rN = rng.normal(size=nx)
    x0 = rng.normal(size=nx)
    return x0, Fs, cs, Ls, Xs, rs, Us, XN, rN


def test_parallel_matches_sequential(rng):
    prob = _random_lqt(rng)
    xs_seq, us_seq = _sequential_lqt(*prob)
    f = lambda a: jnp.asarray(a)
    xs_par, us_par = jax.jit(lqt_solve_parallel)(*[f(a) for a in prob])
    assert np.abs(np.array(us_par) - us_seq).max() < 1e-8
    assert np.abs(np.array(xs_par) - xs_seq).max() < 1e-8


def test_long_horizon_runs():
    rng = np.random.default_rng(5)
    prob = _random_lqt(rng, N=2048, nx=3, nu=1)
    f = lambda a: jnp.asarray(a)
    xs, us = jax.jit(lqt_solve_parallel)(*[f(a) for a in prob])
    assert np.isfinite(np.array(us)).all()
    assert xs.shape == (2049, 3)


def _sequential_lq_backward(fxs, fus, lxs, lus, lxxs, luus, luxs, gN, HN, reg):
    """Sequential Gauss-Newton backward with the DDP contract (numpy f64)."""
    N, nx = fxs.shape[0], fxs.shape[-1]
    nu = fus.shape[-1]
    Vx, Vxx = gN.copy(), HN.copy()
    kffs, Ks = [], []
    dV1 = dV2 = 0.0
    gmax = 0.0
    for k in range(N - 1, -1, -1):
        fx, fu = fxs[k], fus[k]
        Qx = lxs[k] + fx.T @ Vx
        Qu = lus[k] + fu.T @ Vx
        Qxx = lxxs[k] + fx.T @ Vxx @ fx
        Quu = luus[k] + fu.T @ Vxx @ fu + reg * np.eye(nu)
        Qux = luxs[k] + fu.T @ Vxx @ fx
        kff = -np.linalg.solve(Quu, Qu)
        K = -np.linalg.solve(Quu, Qux)
        dV1 += kff @ Qu
        dV2 += 0.5 * kff @ Quu @ kff
        gmax = max(gmax, np.abs(Qu).max())
        Vx = Qx + K.T @ Quu @ kff + K.T @ Qu + Qux.T @ kff
        Vxx = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
        Vxx = 0.5 * (Vxx + Vxx.T)
        kffs.append(kff); Ks.append(K)
    return (np.array(kffs[::-1]), np.array(Ks[::-1]), dV1, dV2, gmax)


def test_lq_backward_parallel_matches_sequential(rng):
    """lq_backward_parallel (cross terms + linear terms + reg) == the
    sequential Gauss-Newton backward, to f64 round-off."""
    from mpc_verde_tpu.ops.parallel_riccati import lq_backward_parallel

    N, nx, nu = 24, 4, 2
    fxs = np.tile(np.eye(nx), (N, 1, 1)) + 0.05 * rng.normal(size=(N, nx, nx))
    fus = 0.3 * rng.normal(size=(N, nx, nu))
    lxs = rng.normal(size=(N, nx))
    lus = rng.normal(size=(N, nu))
    lxxs = np.tile(2 * np.eye(nx), (N, 1, 1)) \
        + 0.1 * rng.normal(size=(N, nx, nx))
    lxxs = 0.5 * (lxxs + lxxs.transpose(0, 2, 1))
    luus = np.tile(np.eye(nu), (N, 1, 1))
    luxs = 0.2 * rng.normal(size=(N, nu, nx))
    gN = rng.normal(size=nx)
    HN = 1.5 * np.eye(nx)
    reg = 1e-3

    want = _sequential_lq_backward(fxs, fus, lxs, lus, lxxs, luus, luxs,
                                   gN, HN, reg)
    f = lambda a: jnp.asarray(a)
    got = jax.jit(lq_backward_parallel)(
        f(fxs), f(fus), f(lxs), f(lus), f(lxxs), f(luus), f(luxs),
        f(gN), f(HN), jnp.asarray(reg))
    kf_p, K_p, dV1_p, dV2_p, gmax_p = [np.array(g) for g in got]
    assert np.abs(kf_p - want[0]).max() < 1e-8
    assert np.abs(K_p - want[1]).max() < 1e-8
    assert abs(float(dV1_p) - want[2]) < 1e-8 * (1 + abs(want[2]))
    assert abs(float(dV2_p) - want[3]) < 1e-8 * (1 + abs(want[3]))
    assert abs(float(gmax_p) - want[4]) < 1e-9 * (1 + abs(want[4]))


def test_scan_backend_solver_matches_xla(rng):
    """make_batched_ilqr_solver(backend='scan') converges to the same optima
    as the sequential backend on an unbounded nonlinear problem."""
    import mpc_verde_tpu as mv
    from mpc_verde_tpu.models import unicycle
    from mpc_verde_tpu.ops import rk4_step
    from mpc_verde_tpu.solver.batched import make_batched_ilqr_solver

    F = rk4_step(unicycle.f, 0.2)
    Q = jnp.diag(jnp.array([1.0, 5.0, 0.1]))
    R = jnp.diag(jnp.array([0.5, 0.05]))

    def l(x, u, p):
        e = x - p[:3]
        return e @ Q @ e + u @ R @ u

    Nh = 16
    ocp = mv.OCP(dynamics=lambda x, u, p: F(x, u, p), stage_cost=l,
                 N=Nh, nx=3, nu=2, npar=3)  # no control bounds
    opts = mv.ILQROptions(max_iters=150, use_ddp=False)
    B = 6
    x0s = jnp.array(rng.uniform(-1, 1, (B, 3)))
    params = jnp.broadcast_to(jnp.array([3.0, 3.0, 0.0]), (B, Nh + 1, 3))
    us0 = jnp.zeros((B, Nh, 2))

    r_seq = jax.jit(make_batched_ilqr_solver(ocp, opts, backend="xla"))(
        x0s, params, us0)
    r_par = jax.jit(make_batched_ilqr_solver(ocp, opts, backend="scan"))(
        x0s, params, us0)
    assert bool(r_seq.converged.all()) and bool(r_par.converged.all())
    assert np.allclose(np.array(r_par.cost), np.array(r_seq.cost), rtol=1e-8)
    assert np.abs(np.array(r_par.us) - np.array(r_seq.us)).max() < 1e-5


def test_scan_backend_rejects_control_bounds():
    import mpc_verde_tpu as mv
    from mpc_verde_tpu.solver.batched import make_batched_ilqr_solver

    ocp = mv.OCP(dynamics=lambda x, u, p: x + u, stage_cost=lambda x, u, p:
                 x @ x + u @ u, N=4, nx=2, nu=2,
                 control_bounds=mv.box_bounds(jnp.array([-1., -1.]),
                                              jnp.array([1., 1.])))
    with pytest.raises(NotImplementedError):
        make_batched_ilqr_solver(ocp, mv.ILQROptions(), backend="scan")
