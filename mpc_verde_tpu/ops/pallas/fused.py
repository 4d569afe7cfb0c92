"""Pallas TPU kernel: fused stage linearization + Riccati backward pass.

The roofline model (docs/design.md) shows the derivative tensors dominate
the DDP iteration's HBM traffic: at nx=3/nu=2 with full DDP each stage
produces 96 f32 entries (fx, fu, lx, lu, lxx, luu, lux, fxx, fux, fuu) per
problem, written once by the XLA linearization phase and read exactly once
by the backward kernel — ~75% of the iteration's bytes round-tripping HBM
for a single use.

This kernel removes the round trip: the backward grid step loads only the
*trajectory* slice (x_k, u_k, p_k — 8 floats/stage/problem, 12x less) and
computes the derivatives in VMEM by evaluating the traced derivative
functions of ``ops/linearize.py`` (jacfwd dynamics, forward-over-reverse
cost Hessians, DDP dynamics Hessians) vmapped over the (8, 128) tile axes —
the same inlining technique as the fused line-search kernel
(``rollout.py``): user callables are closure-converted (array constants
hoisted to broadcast tiles) and every ``dot_general`` is decomposed into
Mosaic-friendly broadcast-multiply-reduce.  The per-stage recursion itself
is shared with the HBM-derivative kernel (``riccati._backward_stage``), so
the two backends are numerically identical by construction.

The terminal value (gN, HN) is likewise computed in-kernel from (x_N, p_N)
on the first grid step, and the control-box bounds (dlb, dub) from the
bounds callable — the XLA iteration body shrinks to: [fused kernel] ->
line search -> acceptance.

Replaces the reference's CasADi-VM derivative evaluation + IPOPT iteration
split (``Casadi/single_shooting_v1.py:131,174``) with one kernel launch per
DDP iteration for the entire linearize-and-factor phase.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .riccati import (_CELL, _LANE, _SUB, _backward_stage, _from_tiles,
                      _to_tiles, _to_tiles_static)
from .rollout import _f32_out, _hoist_consts, _tile2


def _make_fused_kernel(nx: int, nu: int, npar: int, N: int, use_ddp: bool,
                       tol: float, dfun_p: Callable, tfun_p: Callable,
                       cb_p: Callable, n_consts, const_shapes):
    """Build the kernel body.

    ``n_consts = (n_d, n_t, n_b)`` counts hoisted constants of the
    derivative / terminal / bounds callables; ``const_shapes`` their original
    shapes, concatenated in that order.
    """
    nxx = nx * nx
    nd, nt, nb = n_consts
    total = nd + nt + nb

    # tile-batched callables (hoisted consts trail as vmapped args)
    dfun2 = _f32_out(_tile2(dfun_p, 3 + nd))
    tfun2 = _f32_out(_tile2(tfun_p, 2 + nt))
    cb2 = _f32_out(_tile2(cb_p, 3 + nb, shared=(2,)))

    shapes = {"fx": (nx, nx), "fu": (nx, nu), "lx": (nx,), "lu": (nu,),
              "lxx": (nx, nx), "luu": (nu, nu), "lux": (nu, nx),
              "fxx": (nx, nx, nx), "fux": (nx, nu, nx), "fuu": (nx, nu, nu),
              "dlb": (nu,), "dub": (nu,)}

    def kernel(*refs):
        (xs_r, us_r, ps_r, xN_r, pN_r, reg_r, ddp_r) = refs[:7]
        const_rs = refs[7:7 + total]
        kff_o, K_o, dV1_o, dV2_o, gmax_o = refs[7 + total:7 + total + 5]
        Vx_s, Vxx_s, acc_s = refs[7 + total + 5:]

        s = pl.program_id(1)            # 0..N-1, stage k = N-1-s
        k = N - 1 - s

        # per-lane views of hoisted constants: (e, 8, 128) -> S + (8, 128)
        cl = [r[0].reshape(tuple(sh) + (_SUB, _LANE))
              for r, sh in zip(const_rs, const_shapes)]
        c_d, c_t, c_b = cl[:nd], cl[nd:nd + nt], cl[nd + nt:]

        # ---- terminal init: gN/HN computed in-VMEM on the first step ------
        @pl.when(s == 0)
        def _():
            gN, HN = tfun2(xN_r[0], pN_r[0], *c_t)   # (nx,.), (nx,nx,.)
            for i in range(nx):
                Vx_s[i] = gN[i]
            for e in range(nxx):
                Vxx_s[e] = HN[e // nx, e % nx]
            for q in range(3):
                acc_s[q] = jnp.zeros((_SUB, _LANE), jnp.float32)

        x, u, p = xs_r[0, 0], us_r[0, 0], ps_r[0, 0]   # (entries, 8, 128)

        # ---- in-VMEM stage linearization ----------------------------------
        d = dfun2(x, u, p, *c_d)                 # dict, shapes S + (8, 128)
        lb, ub = cb2(x, p, k, *c_b)
        d = dict(d)
        d["dlb"], d["dub"] = lb - u, ub - u

        def E(name, e):
            return d[name][np.unravel_index(e, shapes[name])]

        Vx = [Vx_s[i] for i in range(nx)]
        Vxx = [Vxx_s[e] for e in range(nxx)]
        rg = reg_r[0, 0]
        ds = ddp_r[0, 0]

        kff, K, Vx_n, Vxx_n, dV1_inc, dV2_inc, pgmax = _backward_stage(
            nx, nu, use_ddp, tol, E, Vx, Vxx, rg, ds)

        for i in range(nx):
            Vx_s[i] = Vx_n[i]
        for e in range(nxx):
            Vxx_s[e] = Vxx_n[e]
        acc_s[0] = acc_s[0] + dV1_inc
        acc_s[1] = acc_s[1] + dV2_inc
        acc_s[2] = jnp.maximum(acc_s[2], pgmax)

        for a in range(nu):
            kff_o[0, 0, a] = kff[a]
            for i in range(nx):
                K_o[0, 0, a * nx + i] = K[a][i]

        @pl.when(s == N - 1)
        def _():
            dV1_o[0] = acc_s[0]
            dV2_o[0] = acc_s[1]
            gmax_o[0] = acc_s[2]

    return kernel


def make_fused_backward(*, dynamics: Callable, stage_cost: Callable,
                        terminal_cost: Callable, control_bounds: Callable,
                        N: int, nx: int, nu: int, npar: int,
                        use_ddp: bool = True, tol: float = 1e-8):
    """Build ``fused(xs, us, ps, reg, ddp_scale) -> (kff, K, dV1, dV2, gmax)``.

    Shapes: xs (B, N+1, nx), us (B, N, nu), ps (B, N+1, npar), reg (B,),
    ddp_scale (B,); returns match ``riccati_backward_pallas``.  The
    callables are the OCP's single-vector functions (``F(x,u,p)``,
    ``l(x,u,p)``, ``lf(x,p)``, ``cb(x,p,k) -> (lb, ub)``); their exact
    first/second derivatives are traced host-side once and inlined into the
    kernel.  B is padded internally to a multiple of 1024.
    """
    # One nested-jacfwd "pyramid" computes every first- AND second-order
    # stage derivative in a single traced pass over z = [x; u]: J of the
    # stacked [F(z); l(z)] gives (fx, fu, lx, lu); its jacfwd (has_aux
    # returning J itself) gives the full second-order block (lxx, luu, lux,
    # fxx, fux, fuu).  vs. three separate linearize/quadratize/hessian
    # traces this shrinks the tiled kernel body ~2x (1260 -> 681 tile eqns
    # at nx=3/nu=2), which is what keeps the Mosaic compile tractable;
    # numerics match ops/linearize.py exactly (tests/test_pallas_fused.py).
    def dfun(x, u, p):
        z = jnp.concatenate([x, u])

        def Fl(zz):
            return jnp.concatenate([dynamics(zz[:nx], zz[nx:], p),
                                    stage_cost(zz[:nx], zz[nx:], p)[None]])

        def inner(zz):
            J = jax.jacfwd(Fl)(zz)
            return J, J

        if use_ddp:
            dJ, J = jax.jacfwd(inner, has_aux=True)(z)  # (nx+1,nz,nz)
        else:
            def lJ(zz):
                J = jax.jacfwd(Fl)(zz)
                return J[nx], J  # only the cost row needs second order

            dl, J = jax.jacfwd(lJ, has_aux=True)(z)     # (nz, nz)
        out = {"fx": J[:nx, :nx], "fu": J[:nx, nx:],
               "lx": J[nx, :nx], "lu": J[nx, nx:]}
        if use_ddp:
            out.update(lxx=dJ[nx, :nx, :nx], luu=dJ[nx, nx:, nx:],
                       lux=dJ[nx, nx:, :nx],
                       fxx=dJ[:nx, :nx, :nx], fux=dJ[:nx, nx:, :nx],
                       fuu=dJ[:nx, nx:, nx:])
        else:
            out.update(lxx=dl[:nx, :nx], luu=dl[nx:, nx:],
                       lux=dl[nx:, :nx])
        return out

    def tfun(x, p):
        g = jax.grad(lambda xx: terminal_cost(xx, p))(x)
        H = jax.jacfwd(jax.grad(lambda xx: terminal_cost(xx, p)))(x)
        return g, H

    zx = jnp.zeros((nx,), jnp.float32)
    zu = jnp.zeros((nu,), jnp.float32)
    zp = jnp.zeros((max(npar, 1),), jnp.float32)
    zk = jnp.zeros((), jnp.int32)
    dfun_p, d_c = _hoist_consts(dfun, zx, zu, zp)
    tfun_p, t_c = _hoist_consts(tfun, zx, zp)
    cb_p, b_c = _hoist_consts(control_bounds, zx, zp, zk)
    consts = [*d_c, *t_c, *b_c]
    n_consts = (len(d_c), len(t_c), len(b_c))
    const_shapes = [tuple(c.shape) for c in consts]

    kernel = _make_fused_kernel(nx, nu, max(npar, 1), N, use_ddp, tol,
                                dfun_p, tfun_p, cb_p, n_consts, const_shapes)

    def fused(xs, us, ps, reg, ddp_scale):
        B0 = us.shape[0]
        B = ((B0 + _CELL - 1) // _CELL) * _CELL
        G = B // _CELL

        def pad(x):
            if x.shape[0] == B:
                return x
            pw = [(0, B - B0)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pw)

        f32 = lambda x: pad(jnp.asarray(x, jnp.float32))

        args = [
            _to_tiles(f32(xs[:, :N]), B, nx),       # (G, N, nx, 8, 128)
            _to_tiles(f32(us), B, nu),
            _to_tiles(f32(ps[:, :N]), B, max(npar, 1)),
            _to_tiles_static(f32(xs[:, N]), B),     # (G, nx, 8, 128)
            _to_tiles_static(f32(ps[:, N]), B),
            _to_tiles_static(f32(reg[:, None]), B),
            _to_tiles_static(f32(ddp_scale[:, None]), B),
        ]
        for c in consts:
            e = max(int(np.prod(c.shape)), 1)
            args.append(jnp.broadcast_to(
                jnp.asarray(c).reshape(1, e, 1, 1), (G, e, _SUB, _LANE)))

        # stage-walk specs: grid step s touches stage k = N-1-s only
        def stage_spec(entries):
            return pl.BlockSpec((1, 1, entries, _SUB, _LANE),
                                lambda g, s: (g, N - 1 - s, 0, 0, 0),
                                memory_space=pltpu.VMEM)

        def static_spec(entries):
            return pl.BlockSpec((1, entries, _SUB, _LANE),
                                lambda g, s: (g, 0, 0, 0),
                                memory_space=pltpu.VMEM)

        npar_ = max(npar, 1)
        in_specs = [
            stage_spec(nx), stage_spec(nu), stage_spec(npar_),
            static_spec(nx), static_spec(npar_),
            static_spec(1), static_spec(1),
        ] + [static_spec(max(int(np.prod(c.shape)), 1)) for c in consts]
        scalar_spec = pl.BlockSpec((1, _SUB, _LANE), lambda g, s: (g, 0, 0),
                                   memory_space=pltpu.VMEM)
        out_specs = [stage_spec(nu), stage_spec(nu * nx),
                     scalar_spec, scalar_spec, scalar_spec]
        out_shape = [
            jax.ShapeDtypeStruct((G, N, nu, _SUB, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((G, N, nu * nx, _SUB, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((G, _SUB, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((G, _SUB, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((G, _SUB, _LANE), jnp.float32),
        ]

        kff_t, K_t, dV1_t, dV2_t, gmax_t = pl.pallas_call(
            kernel,
            grid=(G, N),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((nx, _SUB, _LANE), jnp.float32),        # Vx
                pltpu.VMEM((nx * nx, _SUB, _LANE), jnp.float32),   # Vxx
                pltpu.VMEM((3, _SUB, _LANE), jnp.float32),         # accs
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(*args)

        kff = _from_tiles(kff_t, B, nu)[:B0]
        K = _from_tiles(K_t, B, nu * nx)[:B0].reshape(B0, N, nu, nx)
        return (kff, K, dV1_t.reshape(B)[:B0], dV2_t.reshape(B)[:B0],
                gmax_t.reshape(B)[:B0])

    return fused
