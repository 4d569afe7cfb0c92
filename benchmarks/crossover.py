"""Sequential vs associative-scan Riccati backward: the N crossover.

SURVEY.md §2.4/§5.7 names stage-parallel Riccati as the long-horizon
analogue of sequence parallelism; VERDICT r2 #4 asks for the measured
crossover.  This harness times ONE batched DDP backward pass (the
per-iteration hot phase the backends differ in) at fixed batch width over a
horizon sweep, for

  * ``pallas_bw`` — the production sequential-in-N Pallas kernel (TPU only),
  * ``xla``       — the vmapped sequential ``lax.scan`` pass,
  * ``scan``      — the associative-scan O(log N)-depth pass
                    (``ops/parallel_riccati.lq_backward_parallel``),

plus a full end-to-end solve comparison (backend="scan" vs sequential) on an
unbounded long-horizon problem, since the scan backend's Gauss-Newton LQ
subproblem only composes with unbounded controls (boxes ride the AL/IPM
outer loops).

Usage: python benchmarks/crossover.py [--horizons 40,128,512,2048] [--batch B]
Prints one JSON line per (N, backend).  Results table: docs/design.md
"Sequential vs associative-scan backward".
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_unbounded_ocp(N: int):
    import numpy as np

    import mpc_verde_tpu as mv
    from mpc_verde_tpu.models import unicycle
    from mpc_verde_tpu.ops import rk4_step

    F = rk4_step(unicycle.f, 0.2)
    Q = np.diag(np.array([1.0, 5.0, 0.1], dtype=np.float32))
    R = np.diag(np.array([0.5, 0.05], dtype=np.float32))

    def l(x, u, p):
        e = x - p[:3]
        return e @ Q @ e + u @ R @ u

    return mv.OCP(dynamics=lambda x, u, p: F(x, u, p), stage_cost=l,
                  N=N, nx=3, nu=2, npar=3)


def time_backward(ocp, backend: str, B: int, reps: int, seed: int = 0):
    """Time parts.backward alone (jitted), excluding derivative generation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import mpc_verde_tpu as mv
    from mpc_verde_tpu.solver.batched import _make_parts

    opt = mv.ILQROptions(use_ddp=(backend != "scan"))
    parts = _make_parts(ocp, opt, backend, "materialize")
    N, nx, nu = ocp.N, ocp.nx, ocp.nu
    rng = np.random.default_rng(seed)
    x0s = jnp.array(rng.uniform(-2, 2, (B, nx)), jnp.float32)
    ps = jnp.broadcast_to(jnp.array([10.0, 10.0, 0.0], jnp.float32),
                          (B, N + 1, 3))
    us = jnp.array(0.1 * rng.standard_normal((B, N, nu)), jnp.float32)
    xs, us_c, _ = jax.jit(parts.rollout)(x0s, us, ps)
    d, gN, HN, dlb, dub = jax.jit(parts.derivs)(xs, us_c, ps)
    ddp = jnp.ones((B,), jnp.float32)

    # fetch-based completion barrier: block_until_ready on this image's axon
    # runtime can return before the remote computation finishes (bench.py
    # module docstring), so wrap the backward to emit a data-dependent scalar
    # and fetch it.
    bwd = jax.jit(lambda *a: (lambda o: (o, jnp.sum(o[0])))(parts.backward(*a)))
    regs = [jnp.full((B,), 1e-6 * (i + 1), jnp.float32)
            for i in range(reps + 1)]  # unique inputs per rep
    out, s = bwd(d, gN, HN, dlb, dub, regs[-1], ddp)
    float(s)
    ts = []
    for i in range(reps):
        t0 = time.time()
        out, s = bwd(d, gN, HN, dlb, dub, regs[i], ddp)
        float(s)
        ts.append(time.time() - t0)
    return min(ts), out


def time_full_solve(ocp, backend: str, B: int, reps: int, max_iters: int = 30):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import mpc_verde_tpu as mv
    from mpc_verde_tpu.solver.batched import make_batched_ilqr_solver

    opts = mv.ILQROptions(max_iters=max_iters, tol_grad=1e-4, tol_cost=1e-6)
    solve = jax.jit(make_batched_ilqr_solver(ocp, opts, backend=backend))
    rng = np.random.default_rng(0)
    x0s = jnp.array(rng.uniform(-2, 2, (B, ocp.nx)), jnp.float32)
    ps = jnp.broadcast_to(jnp.array([10.0, 10.0, 0.0], jnp.float32),
                          (B, ocp.N + 1, 3))
    us = jnp.zeros((B, ocp.N, ocp.nu), jnp.float32)
    r = solve(x0s, ps, us)
    float(jnp.sum(r.iterations))  # fetch barrier (see time_backward)
    ts = []
    for i in range(reps):
        xr = x0s + jnp.float32(0.001 * (i + 1))
        t0 = time.time()
        r = solve(xr, ps, us)
        float(jnp.sum(r.iterations))
        ts.append(time.time() - t0)
    return min(ts), r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--horizons", default="40,128,512,2048")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--full", action="store_true",
                    help="also time full solves (scan vs sequential)")
    args = ap.parse_args()

    if args.cpu:
        from mpc_verde_tpu.utils import force_cpu

        force_cpu()
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    tpu = jax.default_backend() == "tpu"
    backends = (["pallas_bw"] if tpu else []) + ["xla", "scan"]
    horizons = [int(h) for h in args.horizons.split(",")]
    B = args.batch

    for N in horizons:
        ocp = build_unbounded_ocp(N)
        row = {"metric": "riccati_backward_ms", "N": N, "batch": B,
               "backend_hw": jax.default_backend()}
        for be in backends:
            try:
                dt, _ = time_backward(ocp, be, B, args.reps)
                row[be + "_ms"] = round(dt * 1e3, 3)
            except Exception as e:  # pragma: no cover - diagnostics only
                row[be + "_error"] = f"{type(e).__name__}: {e}"[:120]
        seq = min(v for k, v in row.items()
                  if k.endswith("_ms") and not k.startswith("scan"))
        if "scan_ms" in row:
            row["scan_speedup_vs_seq"] = round(seq / row["scan_ms"], 3)
        print(json.dumps(row), flush=True)

        if args.full:
            rowf = {"metric": "full_solve_ms", "N": N, "batch": B}
            for be in (["pallas_bw"] if tpu else ["xla"]) + ["scan"]:
                try:
                    dt, r = time_full_solve(ocp, be, B, args.reps)
                    rowf[be + "_ms"] = round(dt * 1e3, 2)
                    rowf[be + "_conv"] = round(float(r.converged.mean()), 3)
                except Exception as e:  # pragma: no cover
                    rowf[be + "_error"] = f"{type(e).__name__}: {e}"[:120]
            print(json.dumps(rowf), flush=True)


if __name__ == "__main__":
    main()
