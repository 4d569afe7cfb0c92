"""On-chip probe of the sublane-packed line-search kernel (VERDICT r3 #3).

Measures, at the bench workload (W=1024, N=40, A=8, diff-drive problem):
  * Mosaic compile wall-time of ``mode="sublane"`` (the round-3 layouts hit
    20 s / 766 s / >5 min; the experiment's bar is < 60 s),
  * chained runtime per call vs the XLA scan line search (bar: < 100 us),
  * numerical parity vs the XLA path on the same inputs.

Usage: python benchmarks/sublane_probe.py [--width 1024] [--k 20]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--horizon", type=int, default=40)
    ap.add_argument("--alphas", type=int, default=8)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--mode", default="sublane")
    ap.add_argument("--cpu", action="store_true")
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
    import jax.numpy as jnp
    import numpy as np

    import mpc_verde_tpu as mv
    from bench import build_ocp
    from mpc_verde_tpu.ops.pallas.rollout import linesearch_forward_pallas
    from mpc_verde_tpu.solver.batched import _make_parts

    N, B, A, K = args.horizon, args.width, args.alphas, args.k
    ocp = build_ocp(N)
    nx, nu, npar = ocp.nx, ocp.nu, 3
    opt = mv.ILQROptions(max_iters=40, tol_grad=1e-4, tol_cost=1e-6,
                         n_alphas=A, alpha_decay=0.4)
    alphas = tuple(float(opt.alpha_decay) ** i for i in range(A))
    lf = ocp.terminal_cost or (lambda x, p: jnp.zeros((), dtype=x.dtype))
    cb = ocp.control_bounds

    rng = np.random.default_rng(0)
    f32 = jnp.float32
    x0 = f32(rng.uniform(-2, 2, (B, nx)))
    xs = f32(rng.uniform(-1, 1, (B, N + 1, nx)))
    us = f32(0.1 * rng.standard_normal((B, N, nu)))
    ps = jnp.broadcast_to(jnp.array([10.0, 10.0, 0.0], f32),
                          (B, N + 1, npar)).astype(f32)
    kffs = f32(0.01 * rng.standard_normal((B, N, nu)))
    Ks = f32(0.01 * rng.standard_normal((B, N, nu, nx)))

    interp = jax.default_backend() != "tpu"  # CPU smoke runs interpret mode

    def ls_kernel(x0, xs, us, ps, kffs, Ks):
        return linesearch_forward_pallas(
            x0, xs, us, ps, kffs, Ks, alphas=alphas,
            dynamics=ocp.dynamics, stage_cost=ocp.stage_cost,
            terminal_cost=lf, control_bounds=cb, nx=nx, nu=nu,
            mode=args.mode, interpret=interp)

    def chain(fn):
        def body(a):
            x0, xs, us, ps, kffs, Ks = a
            s = jnp.zeros((), jnp.float32)
            out = None
            for i in range(K):
                out = fn(x0 + s * jnp.float32(1e-20), xs, us, ps, kffs, Ks)
                s = s + jnp.sum(out[2]).astype(jnp.float32)
            return out, s
        return jax.jit(body)

    row = {"metric": "sublane_linesearch_probe", "mode": args.mode,
           "width": B, "N": N, "A": A, "chain_k": K,
           "backend": jax.default_backend()}

    # parity first (single call, also the compile)
    print(f"[sublane] compiling mode={args.mode}...", file=sys.stderr,
          flush=True)
    t0 = time.time()
    xs_p, us_p, c_p = jax.jit(ls_kernel)(x0, xs, us, ps, kffs, Ks)
    c_p.block_until_ready()
    float(jnp.sum(c_p))  # fetch barrier
    row["compile_s"] = round(time.time() - t0, 1)
    print(f"[sublane] compiled in {row['compile_s']}s", file=sys.stderr,
          flush=True)

    parts = _make_parts(ocp, opt, "xla", "materialize")
    xs_r, us_r, c_r = jax.jit(parts.linesearch)(x0, xs, us, ps, kffs, Ks)
    float(jnp.sum(c_r))
    row["parity_max_du"] = float(jnp.max(jnp.abs(us_p - us_r)))
    row["parity_max_dcost_rel"] = float(
        jnp.max(jnp.abs(c_p - c_r) / (1.0 + jnp.abs(c_r))))

    # chained runtime: kernel vs XLA
    for name, fn in (("kernel", ls_kernel), ("xla", parts.linesearch)):
        cfn = chain(fn)
        print(f"[sublane] compiling {name} chain...", file=sys.stderr,
              flush=True)
        t0 = time.time()
        out, s = cfn((x0, xs, us, ps, kffs, Ks))
        float(s)
        print(f"[sublane] {name} chain compiled in {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            out, s = cfn((x0, xs, us, ps, kffs, Ks))
            float(s)
            ts.append(time.time() - t0)
        row[f"{name}_us_per_call"] = round(min(ts) / K * 1e6, 1)
        print(f"[sublane] {name}: {row[f'{name}_us_per_call']} us/call",
              file=sys.stderr, flush=True)

    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
