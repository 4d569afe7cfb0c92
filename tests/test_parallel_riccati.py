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
