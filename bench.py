"""Benchmark: batched MPC solves/s on TPU at N=40 (BASELINE.md headline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

The workload is the reference's diff-drive point-stabilization problem
(``Casadi/single_shooting_v1.py`` constants) at horizon N=40, batched over
random initial states, solved by the box-iLQR solver in f32.  ``vs_baseline``
normalizes against the per-chip share of BASELINE.json's north-star target
(>=10,000 solves/s on a 16-chip v5e slice -> 625 solves/s/chip).

The headline is *sustained* throughput: a stream of independent batch solves
dispatched back-to-back (pipeline full), total time / batches.  Synchronous
single-dispatch latency is reported as ``sync_latency_ms``.

Run directly on this image: the default backend is the single real TPU chip.
``--cpu`` pins to host CPU for a smoke run.
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def build(N: int, max_iters: int):
    import jax
    import jax.numpy as jnp

    import mpc_verde_tpu as mv
    from mpc_verde_tpu.models import unicycle
    from mpc_verde_tpu.ops import rk4_step

    T = 0.2
    F = rk4_step(unicycle.f, T)
    Q = jnp.diag(jnp.array([1.0, 5.0, 0.1], dtype=jnp.float32))
    R = jnp.diag(jnp.array([0.5, 0.05], dtype=jnp.float32))

    def l(x, u, p):
        e = x - p[:3]
        return e @ Q @ e + u @ R @ u

    import numpy as np

    ocp = mv.OCP(
        dynamics=lambda x, u, p: F(x, u, p), stage_cost=l,
        N=N, nx=3, nu=2, npar=3,
        control_bounds=mv.box_bounds(
            jnp.array([-1.0, -np.pi / 4]), jnp.array([1.0, np.pi / 4])),
    )
    # tol_grad is absolute; at this problem's cost scale (~1e4) a projected
    # gradient of 1.0 is ~1e-4 relative, so the DDP fallback only fires for
    # genuinely unconverged members (factor * tol_grad = 1.0)
    # tol_cost is relative; 1e-6 sits decisively above the f32 rollout-noise
    # floor at this cost scale (~2e-3 absolute on ~2e4) while being 1000x
    # tighter than the 1e-3 control-error acceptance bound
    opts = mv.ILQROptions(max_iters=max_iters, tol_grad=1e-4, tol_cost=1e-6,
                          n_alphas=8, alpha_decay=0.4)
    # batch-major solver with the Pallas Riccati backward kernel on TPU;
    # plain vmapped-XLA path on CPU
    from mpc_verde_tpu.solver.batched import make_batched_ilqr_solver

    # "pallas_bw": Riccati backward kernel + XLA line search (validated);
    # "pallas" additionally fuses the line-search forward kernel
    backend = "pallas_bw" if jax.default_backend() == "tpu" else "xla"
    solve = make_batched_ilqr_solver(ocp, opts, backend=backend)
    return ocp, jax.jit(solve), (opts, backend)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="pin to host CPU")
    # pipelined-throughput sweet spot on 1x v5e (design.md batch sweep):
    # below 2048 the chip is underutilized, above it the straggler max and
    # VMEM pressure grow faster than the amortization gain
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--horizon", type=int, default=40)
    ap.add_argument("--iters", type=int, default=40, help="max iLQR iterations")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    if args.cpu:
        from mpc_verde_tpu.utils import force_cpu

        force_cpu()

    import jax

    # Persistent compilation cache: the ~3 min remote TPU compile of the
    # batched solver amortizes across bench invocations.
    import os

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    backend = jax.default_backend()
    ocp, vsolve, (opts, kern) = build(args.horizon, args.iters)

    B, N = args.batch, args.horizon
    rng = np.random.default_rng(0)
    target = jnp.array([10.0, 10.0, 0.0], dtype=jnp.float32)
    x0s = jnp.array(rng.uniform(-2.0, 2.0, (B, 3)), dtype=jnp.float32)
    params = jnp.broadcast_to(target, (B, N + 1, 3)).astype(jnp.float32)
    us0 = jnp.zeros((B, N, 2), dtype=jnp.float32)

    t0 = time.time()
    res = vsolve(x0s, params, us0)
    jax.block_until_ready(res.us)
    compile_s = time.time() - t0

    # Sustained throughput (headline): dispatch a stream of independent
    # batch solves and block once — the serving steady state, with the
    # dispatch pipeline full.  Per-dispatch synchronous latency is reported
    # separately (on this image it includes ~20 ms of remote-tunnel
    # round-trip that local TPU hardware does not pay).
    K = max(4, 2 * args.reps)
    xrs = [x0s + jnp.float32(0.001 * (i + 1)) for i in range(K)]

    def stream(warm):
        t0 = time.time()
        rs = [vsolve(xr, params, warm) for xr in xrs]
        for rr in rs:
            jax.block_until_ready(rr.us)
        return (time.time() - t0) / K, rs[-1]

    # best of 3 streams: the remote-tunnel dispatch jitter on this image
    # perturbs individual streams by 10-30%
    dt, res = min((stream(us0) for _ in range(3)), key=lambda t: t[0])
    solves_per_s = B / dt

    # synchronous per-solve latency (single dispatch, block each time)
    ltimes = []
    for r in range(args.reps):
        xr = x0s + jnp.float32(0.001 * (r + 1))
        t0 = time.time()
        rl = vsolve(xr, params, us0)
        jax.block_until_ready(rl.us)
        ltimes.append(time.time() - t0)
    sync_ms = min(ltimes) * 1e3

    # warm-started (receding-horizon regime): previous solution shifted one
    # stage, slightly moved initial state — the deployment steady state
    warm_us = jnp.concatenate([res.us[:, 1:], res.us[:, -1:]], axis=1)
    xrs = [x0s + jnp.float32(0.02 * (i + 1)) for i in range(K)]
    dtw, res_w = min((stream(warm_us) for _ in range(3)), key=lambda t: t[0])

    # two-phase quorum+drain solver: exits the main batch at the p99
    # iteration count and finishes the ~1% stragglers in a 256-wide drain
    # batch (1/16 the per-iteration cost), preserving strict convergence
    from mpc_verde_tpu.solver.batched import make_drained_solver

    dsolve = make_drained_solver(ocp, opts, backend=kern, quorum=0.99,
                                 drain_capacity=256)
    rd = dsolve(x0s, params, us0)  # compile both phases
    jax.block_until_ready(rd.us)
    dtimes = []
    for r in range(args.reps):
        xr = x0s + jnp.float32(0.001 * (r + 1))
        t0 = time.time()
        rd = dsolve(xr, params, us0)
        jax.block_until_ready(rd.us)
        dtimes.append(time.time() - t0)
    dtd = min(dtimes)

    dwtimes = []
    rd_w = rd
    for r in range(args.reps):
        xr = x0s + jnp.float32(0.02 * (r + 1))
        t0 = time.time()
        rd_w = dsolve(xr, params, warm_us)
        jax.block_until_ready(rd_w.us)
        dwtimes.append(time.time() - t0)
    dtdw = min(dwtimes)

    per_chip_target = 10000.0 / 16.0  # BASELINE.json: >=10k on v5e-16
    out = {
        "metric": f"batched_mpc_solves_per_s_chip_N{N}",
        "value": round(solves_per_s, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_s / per_chip_target, 3),
        "backend": backend,
        "batch": B,
        "max_iters": args.iters,
        "converged_frac": round(float(res.converged.mean()), 4),
        "mean_iterations": round(float(res.iterations.mean()), 2),
        "compile_s": round(compile_s, 1),
        "steady_ms": round(dt * 1e3, 2),
        "sync_latency_ms": round(sync_ms, 2),
        "warm_solves_per_s": round(B / dtw, 1),
        "warm_converged_frac": round(float(res_w.converged.mean()), 4),
        "warm_mean_iterations": round(float(res_w.iterations.mean()), 2),
        "drained_solves_per_s": round(B / dtd, 1),
        "drained_converged_frac": round(float(rd.converged.mean()), 4),
        "drained_warm_solves_per_s": round(B / dtdw, 1),
        "drained_warm_converged_frac": round(float(rd_w.converged.mean()), 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
