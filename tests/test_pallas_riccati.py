"""Pallas Riccati backward kernel vs the jnp reference (interpret mode on CPU).

Parametrized over nu = 1..4: nu <= 2 exercises the closed-form free-subspace
solves, nu = 3, 4 the unrolled Gaussian-elimination path (3^nu static
active-set patterns — 27 / 81 candidates per stage).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_verde_tpu.ops.smallmat import small_solve
from mpc_verde_tpu.solver.boxqp import _eval_pattern, _patterns

N, B = 6, 4  # tiny shapes; kernel pads batch to 1024 internally


def _reference_backward(d, dlb, dub, gN, HN, reg, nx, nu, use_ddp=True):
    """Same math as solver/ilqr.py backward, per problem."""
    pats = jnp.asarray(_patterns(nu))

    def one(d1, dlb1, dub1, gN1, HN1, reg1):
        def stage(carry, inp):
            Vx, Vxx, dV1, dV2, gmax = carry
            fx, fu, lx, lu, lxx, luu, lux, fxx, fux, fuu, lo, hi = inp
            Qx = lx + fx.T @ Vx
            Qu = lu + fu.T @ Vx
            Qxx = lxx + fx.T @ Vxx @ fx
            Quu = luu + fu.T @ Vxx @ fu + reg1 * jnp.eye(nu, dtype=lu.dtype)
            Qux = lux + fu.T @ Vxx @ fx
            if use_ddp:
                Qxx = Qxx + jnp.einsum("i,ijk->jk", Vx, fxx)
                Qux = Qux + jnp.einsum("i,ijk->jk", Vx, fux)
                Quu = Quu + jnp.einsum("i,ijk->jk", Vx, fuu)
            vs, ms, objs = jax.vmap(
                lambda p: _eval_pattern(p, Quu, Qu, lo, hi, 1e-8))(pats)
            b = jnp.argmin(objs)
            kff, m = vs[b], ms[b]
            A = m[:, None] * Quu * m[None, :] + jnp.diag(1.0 - m)
            K = -small_solve(A, m[:, None] * Qux)
            dV1 = dV1 + kff @ Qu
            dV2 = dV2 + 0.5 * kff @ Quu @ kff
            Vx_n = Qx + K.T @ Quu @ kff + K.T @ Qu + Qux.T @ kff
            Vxx_n = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            pg = -jnp.clip(-Qu, lo, hi)
            gmax = jnp.maximum(gmax, jnp.max(jnp.abs(pg)))
            return (Vx_n, 0.5 * (Vxx_n + Vxx_n.T), dV1, dV2, gmax), (kff, K)

        z = jnp.zeros(())
        init = (gN1, HN1, z, z, z)
        inputs = (d1["fx"], d1["fu"], d1["lx"], d1["lu"], d1["lxx"],
                  d1["luu"], d1["lux"], d1["fxx"], d1["fux"], d1["fuu"],
                  dlb1, dub1)
        (_, _, dV1, dV2, gmax), (kffs, Ks) = jax.lax.scan(
            stage, init, inputs, reverse=True)
        return kffs, Ks, dV1, dV2, gmax

    return jax.vmap(one)(d, dlb, dub, gN, HN, reg)


def _random_problem(rng, nx, nu):
    d = {
        "fx": rng.normal(size=(B, N, nx, nx)) * 0.3 + np.eye(nx),
        "fu": rng.normal(size=(B, N, nx, nu)) * 0.3,
        "lx": rng.normal(size=(B, N, nx)),
        "lu": rng.normal(size=(B, N, nu)),
        "lxx": np.tile(2 * np.eye(nx), (B, N, 1, 1))
               + 0.1 * rng.normal(size=(B, N, nx, nx)),
        "luu": np.tile(np.eye(nu), (B, N, 1, 1)),
        "lux": 0.1 * rng.normal(size=(B, N, nu, nx)),
        "fxx": 0.05 * rng.normal(size=(B, N, nx, nx, nx)),
        "fux": 0.05 * rng.normal(size=(B, N, nx, nu, nx)),
        "fuu": 0.05 * rng.normal(size=(B, N, nx, nu, nu)),
    }
    d["lxx"] = 0.5 * (d["lxx"] + d["lxx"].transpose(0, 1, 3, 2))
    dlb = np.full((B, N, nu), -0.7)
    dub = np.full((B, N, nu), 0.5)
    # a mix of active/inactive boxes and an equality (move-blocked) stage
    dlb[:, -1, :] = 0.0
    dub[:, -1, :] = 0.0
    gN = rng.normal(size=(B, nx))
    HN = np.tile(np.eye(nx), (B, 1, 1))
    reg = np.full((B,), 1e-6)
    return d, dlb, dub, gN, HN, reg


@pytest.mark.parametrize("nx,nu", [
    (3, 1), (3, 2),
    pytest.param(4, 3, marks=pytest.mark.slow),
    pytest.param(5, 4, marks=pytest.mark.slow),
])
def test_kernel_matches_reference_interpret(rng, nx, nu):
    from jax.experimental.pallas import tpu as pltpu
    from mpc_verde_tpu.ops.pallas.riccati import riccati_backward_pallas

    d, dlb, dub, gN, HN, reg = _random_problem(rng, nx, nu)
    f32 = lambda t: jnp.asarray(t, jnp.float32)
    d32 = {k: f32(v) for k, v in d.items()}

    kff_r, K_r, dV1_r, dV2_r, gmax_r = _reference_backward(
        d32, f32(dlb), f32(dub), f32(gN), f32(HN), f32(reg), nx, nu)

    with pltpu.force_tpu_interpret_mode():
        kff_p, K_p, dV1_p, dV2_p, gmax_p = riccati_backward_pallas(
            d32, f32(dlb), f32(dub), f32(gN), f32(HN), f32(reg),
            nx=nx, nu=nu, use_ddp=True)

    assert np.allclose(np.array(kff_p), np.array(kff_r), atol=2e-4), (
        np.abs(np.array(kff_p) - np.array(kff_r)).max())
    assert np.allclose(np.array(K_p), np.array(K_r), atol=2e-3), (
        np.abs(np.array(K_p) - np.array(K_r)).max())
    assert np.allclose(np.array(dV1_p), np.array(dV1_r), atol=1e-3)
    assert np.allclose(np.array(gmax_p), np.array(gmax_r), atol=1e-4)


def test_nu5_rejected():
    from mpc_verde_tpu.ops.pallas.riccati import riccati_backward_pallas

    with pytest.raises(NotImplementedError):
        riccati_backward_pallas({"fx": jnp.zeros((1, 2, 3, 3))}, None, None,
                                None, None, None, nx=3, nu=5)
