"""Pallas Riccati backward kernel vs the jnp reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_verde_tpu.ops.linearize import linearize_trajectory
from mpc_verde_tpu.ops.smallmat import small_solve
from mpc_verde_tpu.solver.boxqp import _eval_pattern, _patterns

NX, NU, N, B = 3, 2, 6, 4  # tiny shapes; kernel pads batch to 1024 internally


def _reference_backward(d, dlb, dub, gN, HN, reg, use_ddp=True):
    """Same math as solver/ilqr.py backward, per problem."""
    pats = jnp.asarray(_patterns(NU))

    def one(d1, dlb1, dub1, gN1, HN1, reg1):
        def stage(carry, inp):
            Vx, Vxx, dV1, dV2, gmax = carry
            fx, fu, lx, lu, lxx, luu, lux, fxx, fux, fuu, lo, hi = inp
            Qx = lx + fx.T @ Vx
            Qu = lu + fu.T @ Vx
            Qxx = lxx + fx.T @ Vxx @ fx
            Quu = luu + fu.T @ Vxx @ fu + reg1 * jnp.eye(NU, dtype=lu.dtype)
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


def _random_problem(rng):
    d = {
        "fx": rng.normal(size=(B, N, NX, NX)) * 0.3 + np.eye(NX),
        "fu": rng.normal(size=(B, N, NX, NU)) * 0.3,
        "lx": rng.normal(size=(B, N, NX)),
        "lu": rng.normal(size=(B, N, NU)),
        "lxx": np.tile(2 * np.eye(NX), (B, N, 1, 1))
               + 0.1 * rng.normal(size=(B, N, NX, NX)),
        "luu": np.tile(np.eye(NU), (B, N, 1, 1)),
        "lux": 0.1 * rng.normal(size=(B, N, NU, NX)),
        "fxx": 0.05 * rng.normal(size=(B, N, NX, NX, NX)),
        "fux": 0.05 * rng.normal(size=(B, N, NX, NU, NX)),
        "fuu": 0.05 * rng.normal(size=(B, N, NX, NU, NU)),
    }
    d["lxx"] = 0.5 * (d["lxx"] + d["lxx"].transpose(0, 1, 3, 2))
    dlb = np.full((B, N, NU), -0.7)
    dub = np.full((B, N, NU), 0.5)
    # a mix of active/inactive boxes and an equality (move-blocked) stage
    dlb[:, -1, :] = 0.0
    dub[:, -1, :] = 0.0
    gN = rng.normal(size=(B, NX))
    HN = np.tile(np.eye(NX), (B, 1, 1))
    reg = np.full((B,), 1e-6)
    return d, dlb, dub, gN, HN, reg


def test_kernel_matches_reference_interpret(rng):
    from jax.experimental.pallas import tpu as pltpu
    from mpc_verde_tpu.ops.pallas.riccati import riccati_backward_pallas

    d, dlb, dub, gN, HN, reg = _random_problem(rng)
    f32 = lambda t: jnp.asarray(t, jnp.float32)
    d32 = {k: f32(v) for k, v in d.items()}

    kff_r, K_r, dV1_r, dV2_r, gmax_r = _reference_backward(
        d32, f32(dlb), f32(dub), f32(gN), f32(HN), f32(reg))

    with pltpu.force_tpu_interpret_mode():
        kff_p, K_p, dV1_p, dV2_p, gmax_p = riccati_backward_pallas(
            d32, f32(dlb), f32(dub), f32(gN), f32(HN), f32(reg),
            nx=NX, nu=NU, use_ddp=True)

    assert np.allclose(np.array(kff_p), np.array(kff_r), atol=2e-4), (
        np.abs(np.array(kff_p) - np.array(kff_r)).max())
    assert np.allclose(np.array(K_p), np.array(K_r), atol=2e-3), (
        np.abs(np.array(K_p) - np.array(K_r)).max())
    assert np.allclose(np.array(dV1_p), np.array(dV1_r), atol=1e-3)
    assert np.allclose(np.array(gmax_p), np.array(gmax_r), atol=1e-4)
