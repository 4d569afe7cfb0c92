"""Pallas TPU kernel: batched Riccati backward pass with exact box-QP stages.

This is the solver's hot loop (~70% of solve time as vmapped XLA: 40
sequential scan steps, each dispatching dozens of tiny ops).  The kernel
restructures it TPU-natively:

  * **Batch-major structure-of-arrays**: each (8, 128) VPU tile holds one
    matrix *entry* for 1024 independent problems (batch fills sublanes x
    lanes).  Every matrix operation in the recursion becomes a handful of
    fused elementwise tile ops — no tiny matmuls, no per-problem layout.
  * **Stages as a sequential grid dimension**: grid = (batch_cells, N); the
    value function (Vx, Vxx) lives in VMEM scratch carried across the stage
    iterations while Pallas double-buffers each stage's derivative block from
    HBM. One kernel launch replaces the whole lax.scan.
  * **Exact stage box QP by static active-set enumeration**: for nu <= 4 each
    of the 3^nu patterns has *static* structure (which coordinates are
    clamped), so every candidate is closed-form tile arithmetic (division /
    2x2 adjugate for <= 2 free coordinates, unrolled no-pivot Gaussian
    elimination for 3-4) and the feasible-minimum is a chain of selects —
    branch-free, exactly the enumeration of ``solver/boxqp.py``.

Semantics match ``solver/ilqr.py``'s backward pass (including full-DDP
second-order terms and the projected-gradient stationarity measure) to f32
round-off; see tests/test_pallas_riccati.py.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB, _LANE = 8, 128
_CELL = _SUB * _LANE  # problems per grid cell

_BIG = 1e30


def _patterns_static(nu: int):
    """Static active-set patterns: tuples over {0: free, 1: lower, 2: upper}."""
    import itertools

    return list(itertools.product((0, 1, 2), repeat=nu))


def _backward_stage(nx: int, nu: int, use_ddp: bool, tol: float,
                    E, Vx, Vxx, rg, ds):
    """One Riccati stage of the backward recursion on (8, 128) tiles.

    Shared by the HBM-derivative kernel (``_make_kernel``, derivatives
    streamed from HBM) and the fused kernel (``fused.py``, derivatives
    computed in-VMEM from the trajectory).

    Args:
      E: accessor ``E(name, e) -> (8, 128) tile`` for entry ``e`` of stage
        derivative ``name`` (fx, fu, lx, lu, lxx, luu, lux, fxx, fux, fuu,
        dlb, dub — flattened row-major).
      Vx, Vxx: value-function tiles (lists of nx / nx*nx).
      rg: regularization tile; ds: per-problem DDP on/off scale tile.

    Returns ``(kff [nu], K [nu][nx], Vx_n [nx], Vxx_n [nxx, symmetrized],
    dV1_inc, dV2_inc, pgmax_stage)``.
    """
    patterns = _patterns_static(nu)

    # ---- Q expansion ---------------------------------------------
    Qx = [E("lx", i) + sum(E("fx", j * nx + i) * Vx[j] for j in range(nx))
          for i in range(nx)]
    Qu = [E("lu", a) + sum(E("fu", j * nu + a) * Vx[j] for j in range(nx))
          for a in range(nu)]
    VF = [[sum(Vxx[j * nx + k] * E("fx", k * nx + i) for k in range(nx))
           for i in range(nx)] for j in range(nx)]
    VFu = [[sum(Vxx[j * nx + k] * E("fu", k * nu + a) for k in range(nx))
            for a in range(nu)] for j in range(nx)]
    Qxx = [[E("lxx", i * nx + j)
            + sum(E("fx", k * nx + i) * VF[k][j] for k in range(nx))
            for j in range(nx)] for i in range(nx)]
    Quu = [[E("luu", a * nu + b)
            + sum(E("fu", k * nu + a) * VFu[k][b] for k in range(nx))
            for b in range(nu)] for a in range(nu)]
    Qux = [[E("lux", a * nx + i)
            + sum(E("fu", k * nu + a) * VF[k][i] for k in range(nx))
            for i in range(nx)] for a in range(nu)]

    if use_ddp:
        for i in range(nx):
            for j in range(nx):
                Qxx[i][j] = Qxx[i][j] + ds * sum(
                    Vx[m] * E("fxx", (m * nx + i) * nx + j)
                    for m in range(nx))
        for a in range(nu):
            for i in range(nx):
                Qux[a][i] = Qux[a][i] + ds * sum(
                    Vx[m] * E("fux", (m * nu + a) * nx + i)
                    for m in range(nx))
        for a in range(nu):
            for b in range(nu):
                Quu[a][b] = Quu[a][b] + ds * sum(
                    Vx[m] * E("fuu", (m * nu + a) * nu + b)
                    for m in range(nx))

    for a in range(nu):
        Quu[a][a] = Quu[a][a] + rg

    lo = [E("dlb", a) for a in range(nu)]
    hi = [E("dub", a) for a in range(nu)]

    # ---- exact box QP: static active-set enumeration --------------
    def solve_free(free, rhss):
        """Solve Quu[F,F] X = rhs for each rhs, F a static index set.

        k = 1, 2 use the closed forms (division / 2x2 adjugate —
        bit-identical to the original nu <= 2 kernel); k = 3, 4 use
        unrolled no-pivot Gaussian elimination (Quu is SPD + reg, so
        leading pivots are positive).  Everything is elementwise
        (8, 128) tile arithmetic; rhss is a list of k-length lists.
        """
        k = len(free)
        if k == 1:
            d = Quu[free[0]][free[0]]
            return [[r[0] / d] for r in rhss]
        if k == 2:
            f0, f1 = free
            det = Quu[f0][f0] * Quu[f1][f1] - Quu[f0][f1] * Quu[f1][f0]
            return [[(r[0] * Quu[f1][f1] - r[1] * Quu[f0][f1]) / det,
                     (r[1] * Quu[f0][f0] - r[0] * Quu[f1][f0]) / det]
                    for r in rhss]
        A = [[Quu[free[r]][free[c]] for c in range(k)]
             for r in range(k)]
        X = [r[:] for r in rhss]
        for p in range(k):
            ip = 1.0 / A[p][p]
            for r in range(p + 1, k):
                m = A[r][p] * ip
                for c in range(p + 1, k):
                    A[r][c] = A[r][c] - m * A[p][c]
                for x in X:
                    x[r] = x[r] - m * x[p]
        for x in X:
            for r in reversed(range(k)):
                acc = x[r]
                for c in range(r + 1, k):
                    acc = acc - A[r][c] * x[c]
                x[r] = acc / A[r][r]
        return X

    def qp_candidate(pat):
        free = [a for a in range(nu) if pat[a] == 0]
        v = [None] * nu
        feas = None

        def AND(x, y):
            return y if x is None else jnp.logical_and(x, y)

        clamp_val = {}
        for a in range(nu):
            if pat[a] == 1:
                clamp_val[a] = lo[a]
            elif pat[a] == 2:
                clamp_val[a] = hi[a]
        for a, cv in clamp_val.items():
            v[a] = cv
            feas = AND(feas, jnp.isfinite(cv))

        K = [[jnp.zeros((_SUB, _LANE), jnp.float32) for _ in range(nx)]
             for _ in range(nu)]
        if free:
            # kff: Quu_FF v_F = -(Qu_F + Quu_FC v_C);
            # K rows: Quu_FF K_F = -Qux_F (clamped rows stay zero —
            # clamped controls don't react to state perturbations)
            rhs_v = [-(Qu[f] + sum(Quu[f][c] * v[c]
                                   for c in clamp_val))
                     for f in free]
            rhs_K = [[-Qux[f][i] for f in free] for i in range(nx)]
            sols = solve_free(free, [rhs_v] + rhs_K)
            for j, f in enumerate(free):
                v[f] = sols[0][j]
            for i in range(nx):
                for j, f in enumerate(free):
                    K[f][i] = sols[1 + i][j]

        for a in free:
            feas = AND(feas, (v[a] >= lo[a] - tol) & (v[a] <= hi[a] + tol))
        grad = [Qu[a] + sum(Quu[a][b] * v[b] for b in range(nu))
                for a in range(nu)]
        for a in range(nu):
            if pat[a] == 1:
                feas = AND(feas, grad[a] >= -tol)
            elif pat[a] == 2:
                feas = AND(feas, grad[a] <= tol)
        if feas is None:
            feas = jnp.full((_SUB, _LANE), True)

        obj = sum(0.5 * v[a] * Quu[a][b] * v[b]
                  for a in range(nu) for b in range(nu)) \
            + sum(Qu[a] * v[a] for a in range(nu))
        obj = jnp.where(feas, obj, _BIG)
        return v, K, obj

    best_v, best_K, best_obj = qp_candidate(patterns[0])
    for pat in patterns[1:]:
        v, K, obj = qp_candidate(pat)
        better = obj < best_obj
        best_v = [jnp.where(better, v[a], best_v[a]) for a in range(nu)]
        best_K = [[jnp.where(better, K[a][i], best_K[a][i])
                   for i in range(nx)] for a in range(nu)]
        best_obj = jnp.where(better, obj, best_obj)

    kff = best_v
    K = best_K

    # ---- step-quality / stationarity increments -----------------------
    dV1_inc = sum(kff[a] * Qu[a] for a in range(nu))
    dV2_inc = sum(0.5 * kff[a] * Quu[a][b] * kff[b]
                  for a in range(nu) for b in range(nu))
    pgmax = None
    for a in range(nu):
        pg = jnp.abs(-jnp.clip(-Qu[a], lo[a], hi[a]))
        pgmax = pg if pgmax is None else jnp.maximum(pgmax, pg)

    # ---- value function update ----------------------------------------
    Quk = [sum(Quu[a][b] * kff[b] for b in range(nu)) for a in range(nu)]
    Vx_n = [Qx[i]
            + sum(K[a][i] * (Quk[a] + Qu[a]) for a in range(nu))
            + sum(Qux[a][i] * kff[a] for a in range(nu))
            for i in range(nx)]
    Vxx_n = [[Qxx[i][j]
              + sum(K[a][i] * Quu[a][b] * K[b][j]
                    for a in range(nu) for b in range(nu))
              + sum(K[a][i] * Qux[a][j] + Qux[a][i] * K[a][j]
                    for a in range(nu))
              for j in range(nx)] for i in range(nx)]
    nxx = nx * nx
    Vxx_sym = [0.5 * (Vxx_n[e // nx][e % nx] + Vxx_n[e % nx][e // nx])
               for e in range(nxx)]
    return kff, K, Vx_n, Vxx_sym, dV1_inc, dV2_inc, pgmax


def _make_kernel(nx: int, nu: int, N: int, C: int, use_ddp: bool, tol: float):
    """Kernel processing C stages per grid invocation (stage chunking).

    Per-invocation fixed costs (dispatch, pipeline setup) dominated the
    one-stage-per-step version; chunking C stages into each grid step cuts
    the sequential grid length N -> N/C while the per-stage math stays
    identical unrolled tile arithmetic (``_backward_stage``).
    """
    nxx = nx * nx
    n_chunks = N // C

    def kernel(fx, fu, lx, lu, lxx, luu, lux, fxx, fux, fuu, dlb, dub,
               gN, HN, reg, ddpf,
               kff_o, K_o, dV1_o, dV2_o, gmax_o,
               Vx_s, Vxx_s, acc_s):
        s = pl.program_id(1)  # chunk counter 0..n_chunks-1 (last stages first)
        refs = {"fx": fx, "fu": fu, "lx": lx, "lu": lu, "lxx": lxx,
                "luu": luu, "lux": lux, "fxx": fxx, "fux": fux, "fuu": fuu,
                "dlb": dlb, "dub": dub}

        # ---- terminal init on the first chunk -----------------------------
        @pl.when(s == 0)
        def _():
            for i in range(nx):
                Vx_s[i] = gN[0, i]
            for e in range(nxx):
                Vxx_s[e] = HN[0, e]
            for q in range(3):
                acc_s[q] = jnp.zeros((_SUB, _LANE), jnp.float32)

        Vx = [Vx_s[i] for i in range(nx)]
        Vxx = [Vxx_s[e] for e in range(nxx)]
        acc = [acc_s[0], acc_s[1], acc_s[2]]
        rg = reg[0, 0]
        ds = ddpf[0, 0]  # per-problem DDP on/off (Gauss-Newton fallback)

        for cc in reversed(range(C)):
            def E(name, e, _cc=cc):
                return refs[name][0, _cc, e]

            kff, K, Vx, Vxx, dV1_inc, dV2_inc, pgmax = _backward_stage(
                nx, nu, use_ddp, tol, E, Vx, Vxx, rg, ds)
            acc[0] = acc[0] + dV1_inc
            acc[1] = acc[1] + dV2_inc
            acc[2] = jnp.maximum(acc[2], pgmax)

            for a in range(nu):
                kff_o[0, cc, a] = kff[a]
                for i in range(nx):
                    K_o[0, cc, a * nx + i] = K[a][i]

        for i in range(nx):
            Vx_s[i] = Vx[i]
        for e in range(nxx):
            Vxx_s[e] = Vxx[e]
        for q in range(3):
            acc_s[q] = acc[q]

        @pl.when(s == n_chunks - 1)
        def _():
            dV1_o[0] = acc[0]
            dV2_o[0] = acc[1]
            gmax_o[0] = acc[2]

    return kernel

def _to_tiles(x, B, entries):
    """(B, N, ...) -> (G, N, entries, 8, 128) batch-major tiles."""
    G = B // _CELL
    N = x.shape[1]
    flat = x.reshape(B, N, entries)
    t = flat.reshape(G, _SUB, _LANE, N, entries)
    return jnp.transpose(t, (0, 3, 4, 1, 2))


def _to_tiles_static(x, B):
    """(B, ...) per-problem (no stage dim) -> (G, entries, 8, 128)."""
    G = B // _CELL
    flat = x.reshape(B, -1)
    e = flat.shape[-1]
    t = flat.reshape(G, _SUB, _LANE, e)
    return jnp.transpose(t, (0, 3, 1, 2))


def _from_tiles(x, B, entries):
    """(G, N, entries, 8, 128) -> (B, N, entries)."""
    G = B // _CELL
    N = x.shape[1]
    t = jnp.transpose(x, (0, 3, 4, 1, 2))
    return t.reshape(B, N, entries)


@functools.partial(jax.jit, static_argnames=("nx", "nu", "use_ddp", "tol"))
def riccati_backward_pallas(derivs: Dict[str, jnp.ndarray], dlb, dub, gN, HN,
                            reg, ddp_scale=None, *, nx: int, nu: int,
                            use_ddp: bool = True, tol: float = 1e-8):
    """Batched box-constrained Riccati backward pass on TPU.

    Args:
      derivs: dict of (B, N, ...) stage derivatives (fx, fu, lx, lu, lxx,
        luu, lux [, fxx, fux, fuu]).
      dlb, dub: (B, N, nu) delta-control bounds (lb - u_nom, ub - u_nom).
      gN, HN: (B, nx), (B, nx, nx) terminal value gradient/Hessian.
      reg: (B,) per-problem Levenberg regularization added to Quu.
      nx, nu: static dims (nu <= 4).

    Returns (kff (B, N, nu), K (B, N, nu, nx), dV1 (B,), dV2 (B,), gmax (B,)).

    B is padded internally to a multiple of 1024.
    """
    if nu > 4:
        raise NotImplementedError(
            "pallas backward supports nu <= 4 (3^nu active-set enumeration); "
            "use backend='xla' (any nu) for wider control vectors")
    B0, N = derivs["fx"].shape[0], derivs["fx"].shape[1]
    B = ((B0 + _CELL - 1) // _CELL) * _CELL
    G = B // _CELL

    def pad(x):
        if x.shape[0] == B:
            return x
        pw = [(0, B - B0)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pw)

    f32 = lambda x: pad(x.astype(jnp.float32))

    nxx = nx * nx
    args = [
        _to_tiles(f32(derivs["fx"]), B, nxx),
        _to_tiles(f32(derivs["fu"]), B, nx * nu),
        _to_tiles(f32(derivs["lx"]), B, nx),
        _to_tiles(f32(derivs["lu"]), B, nu),
        _to_tiles(f32(derivs["lxx"]), B, nxx),
        _to_tiles(f32(derivs["luu"]), B, nu * nu),
        _to_tiles(f32(derivs["lux"]), B, nu * nx),
    ]
    if use_ddp:
        args += [
            _to_tiles(f32(derivs["fxx"]), B, nx * nxx),
            _to_tiles(f32(derivs["fux"]), B, nx * nu * nx),
            _to_tiles(f32(derivs["fuu"]), B, nx * nu * nu),
        ]
    else:
        z = np.zeros((G, N, 1, _SUB, _LANE), np.float32)
        args += [z, z, z]
    if ddp_scale is None:
        ddp_scale = np.ones((B0,), np.float32)
    args += [
        _to_tiles(f32(dlb), B, nu),
        _to_tiles(f32(dub), B, nu),
        _to_tiles_static(f32(gN), B),
        _to_tiles_static(f32(HN), B),
        _to_tiles_static(f32(reg[:, None]), B),
        _to_tiles_static(f32(ddp_scale[:, None]), B),
    ]

    # Stage chunking: C stages per grid invocation.  Measured on v5e: C=8
    # gives no end-to-end speedup over C=1 but doubles Mosaic compile time,
    # so default to 1 (override via MPC_VERDE_RICCATI_CHUNK for experiments).
    import os as _os

    C_req = int(_os.environ.get("MPC_VERDE_RICCATI_CHUNK", "1"))
    C = max(c for c in range(1, min(max(C_req, 1), N) + 1) if N % c == 0)
    n_chunks = N // C

    # Block specs: chunk-indexed inputs walk the stage axis in reverse.
    def stage_spec(entries):
        return pl.BlockSpec(
            (1, C, entries, _SUB, _LANE),
            lambda g, s: (g, n_chunks - 1 - s, 0, 0, 0),
            memory_space=pltpu.VMEM)

    def static_spec(entries):
        return pl.BlockSpec(
            (1, entries, _SUB, _LANE), lambda g, s: (g, 0, 0, 0),
            memory_space=pltpu.VMEM)

    ddp_e = (nx * nxx, nx * nu * nx, nx * nu * nu) if use_ddp else (1, 1, 1)
    in_specs = [
        stage_spec(nxx), stage_spec(nx * nu), stage_spec(nx), stage_spec(nu),
        stage_spec(nxx), stage_spec(nu * nu), stage_spec(nu * nx),
        stage_spec(ddp_e[0]), stage_spec(ddp_e[1]), stage_spec(ddp_e[2]),
        stage_spec(nu), stage_spec(nu),
        static_spec(nx), static_spec(nxx), static_spec(1), static_spec(1),
    ]
    out_specs = [
        stage_spec(nu),            # kff
        stage_spec(nu * nx),       # K
        pl.BlockSpec((1, _SUB, _LANE), lambda g, s: (g, 0, 0),
                     memory_space=pltpu.VMEM),  # dV1
        pl.BlockSpec((1, _SUB, _LANE), lambda g, s: (g, 0, 0),
                     memory_space=pltpu.VMEM),  # dV2
        pl.BlockSpec((1, _SUB, _LANE), lambda g, s: (g, 0, 0),
                     memory_space=pltpu.VMEM),  # gmax
    ]
    out_shape = [
        jax.ShapeDtypeStruct((G, N, nu, _SUB, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((G, N, nu * nx, _SUB, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((G, _SUB, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((G, _SUB, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((G, _SUB, _LANE), jnp.float32),
    ]

    kernel = _make_kernel(nx, nu, N, C, use_ddp, tol)
    kff_t, K_t, dV1_t, dV2_t, gmax_t = pl.pallas_call(
        kernel,
        grid=(G, n_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nx, _SUB, _LANE), jnp.float32),    # Vx carry
            pltpu.VMEM((nxx, _SUB, _LANE), jnp.float32),   # Vxx carry
            pltpu.VMEM((3, _SUB, _LANE), jnp.float32),     # dV1/dV2/gmax
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(*args)

    kff = _from_tiles(kff_t, B, nu)[:B0]
    K = _from_tiles(K_t, B, nu * nx)[:B0].reshape(B0, N, nu, nx)
    dV1 = dV1_t.reshape(B)[:B0]
    dV2 = dV2_t.reshape(B)[:B0]
    gmax = gmax_t.reshape(B)[:B0]
    return kff, K, dV1, dV2, gmax
