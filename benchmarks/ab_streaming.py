"""A/B harness: streaming-solver configurations on the real TPU chip.

Measures sustained queue throughput (same methodology as bench.py: a stream
of dispatches blocked once at the end) for a grid of configurations —
backend ("pallas_bw" Riccati kernel + XLA line search vs "pallas" fused
forward kernel), line-search width (n_alphas), and slot width — so per-config
deltas are measured inside the full compiled solve, not microbenchmarks
(docs/design.md: the axon tunnel adds ~26 ms fixed dispatch latency, so only
end-to-end A/B is meaningful).

Usage: python benchmarks/ab_streaming.py [--configs pallas_bw:8:1024,...]
Prints one JSON line per config.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable as `python benchmarks/ab_streaming.py` from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queue", type=int, default=16384)
    ap.add_argument("--horizon", type=int, default=40)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--configs", type=str,
        default="pallas_bw:8:1024,pallas:8:1024,pallas_bw:6:1024,"
                "pallas_bw:8:2048,pallas:8:2048")
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    import mpc_verde_tpu as mv
    from bench import build_ocp
    from mpc_verde_tpu.solver.streaming import make_streaming_solver

    ocp = build_ocp(args.horizon)
    M, N = args.queue, args.horizon
    rng = np.random.default_rng(0)
    target = jnp.array([10.0, 10.0, 0.0], dtype=jnp.float32)
    x0q = jnp.array(rng.uniform(-2.0, 2.0, (M, 3)), dtype=jnp.float32)
    psq = jnp.broadcast_to(target, (M, N + 1, 3)).astype(jnp.float32)
    us0q = jnp.zeros((M, N, 2), dtype=jnp.float32)

    for spec in args.configs.split(","):
        kern, na, width = spec.split(":")
        na, width = int(na), int(width)
        opts = mv.ILQROptions(max_iters=args.iters, tol_grad=1e-4,
                              tol_cost=1e-6, n_alphas=na, alpha_decay=0.4)
        solve = jax.jit(make_streaming_solver(ocp, opts, backend=kern,
                                              batch_width=width))
        # fetch-based completion barrier: block_until_ready on the axon
        # runtime can return before the remote computation finishes
        # (bench.py module docstring)
        def barrier(*rs):
            return float(sum(jnp.sum(r.iterations) for r in rs))

        import itertools

        _uniq = itertools.count(1)
        t0 = time.time()
        res = solve(x0q, psq, us0q)
        barrier(res)
        compile_s = time.time() - t0

        def stream(k=3):
            xs = [x0q + jnp.float32(1e-4 * next(_uniq)) for i in range(k)]
            t0 = time.time()
            rs = [solve(x, psq, us0q) for x in xs]
            barrier(*rs)
            return (time.time() - t0) / k, rs[-1]

        dt, res = min((stream() for _ in range(args.reps)),
                      key=lambda t: t[0])
        print(json.dumps({
            "config": spec,
            "solves_per_s": round(M / dt, 1),
            "converged_frac": round(float(res.converged.mean()), 4),
            "mean_iterations": round(float(res.iterations.mean()), 2),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
