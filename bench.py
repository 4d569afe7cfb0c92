"""Benchmark: batched MPC solves/s on TPU at N=40 (BASELINE.md headline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

The workload is the reference's diff-drive point-stabilization problem
(``Casadi/single_shooting_v1.py`` constants) at horizon N=40, solved over
random initial states in f32.  ``vs_baseline`` normalizes against the
per-chip share of BASELINE.json's north-star target (>=10,000 solves/s on a
16-chip v5e slice -> 625 solves/s/chip).

The headline path is the **streaming solver** (``solver/streaming.py``): one
compiled while_loop owns a 1024-slot batch and refills each slot from the
problem queue the moment its problem converges, so the device pays ~mean
iterations per problem instead of ~max over a batch (the straggler tail —
see docs/design.md).  The round-1 fixed-batch solver is reported alongside
(``batched_*`` keys) as the latency-oriented mode, and a 100-iteration-budget
streaming variant (``full_*`` keys) as the full-convergence serving mode.

Timing is *sustained* throughput: a stream of independent dispatches,
blocked once (pipeline full, hides this image's ~20 ms remote-tunnel RTT
exactly as a serving deployment or local-host TPU would).  Synchronous
single-dispatch latency is reported as ``sync_latency_ms``.

Run directly on this image: the default backend is the single real TPU chip.
``--cpu`` pins to host CPU for a smoke run.
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def build_ocp(N: int):
    import jax.numpy as jnp
    import numpy as np

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

    return mv.OCP(
        dynamics=lambda x, u, p: F(x, u, p), stage_cost=l,
        N=N, nx=3, nu=2, npar=3,
        control_bounds=mv.box_bounds(
            jnp.array([-1.0, -np.pi / 4]), jnp.array([1.0, np.pi / 4])),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="pin to host CPU")
    # streaming slot width: B=1024 saturates 1x v5e on this problem (sweep in
    # docs/design.md); the fixed-batch solver's pipelined sweet spot is 2048
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=2048)
    # queue length per dispatch: large enough to amortize pipeline head/tail
    ap.add_argument("--queue", type=int, default=16384)
    ap.add_argument("--horizon", type=int, default=40)
    ap.add_argument("--iters", type=int, default=40, help="max DDP iterations")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if args.cpu:
        from mpc_verde_tpu.utils import force_cpu

        force_cpu()
        # CPU smoke run: don't grind through the TPU-sized workload
        args.queue = min(args.queue, 256)
        args.width = min(args.width, 64)
        args.batch = min(args.batch, 128)

    import jax

    # Persistent compilation cache: the remote-TPU compiles amortize across
    # bench invocations.
    import os

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    import mpc_verde_tpu as mv
    from mpc_verde_tpu.solver.batched import make_batched_ilqr_solver
    from mpc_verde_tpu.solver.streaming import make_streaming_solver

    backend = jax.default_backend()
    kern = "pallas_bw" if backend == "tpu" else "xla"
    ocp = build_ocp(args.horizon)
    # tol_grad is absolute; at this problem's cost scale (~1e4) a projected
    # gradient of 1.0 is ~1e-4 relative.  tol_cost is relative; 1e-6 sits
    # above the f32 rollout-noise floor while being 1000x tighter than the
    # 1e-3 control-error acceptance bound.
    opts = mv.ILQROptions(max_iters=args.iters, tol_grad=1e-4, tol_cost=1e-6,
                          n_alphas=8, alpha_decay=0.4)

    M, N = args.queue, args.horizon
    rng = np.random.default_rng(0)
    target = jnp.array([10.0, 10.0, 0.0], dtype=jnp.float32)
    x0q = jnp.array(rng.uniform(-2.0, 2.0, (M, 3)), dtype=jnp.float32)
    psq = jnp.broadcast_to(target, (M, N + 1, 3)).astype(jnp.float32)
    us0q = jnp.zeros((M, N, 2), dtype=jnp.float32)

    ssolve = jax.jit(make_streaming_solver(ocp, opts, backend=kern,
                                           batch_width=args.width))
    t0 = time.time()
    res = ssolve(x0q, psq, us0q)
    jax.block_until_ready(res.us)
    compile_s = time.time() - t0

    def stream(solve, xq, us, k):
        """Sustained: k dispatches in flight, blocked once at the end."""
        xs = [xq + jnp.float32(0.001 * (i + 1)) for i in range(k)]
        t0 = time.time()
        rs = [solve(x, psq, us) for x in xs]
        for rr in rs:
            jax.block_until_ready(rr.us)
        return (time.time() - t0) / k, rs[-1]

    # best of `reps` streams: the remote-tunnel dispatch jitter on this
    # image perturbs individual streams by 10-30%
    dt, res = min((stream(ssolve, x0q, us0q, 3) for _ in range(args.reps)),
                  key=lambda t: t[0])
    solves_per_s = M / dt

    # synchronous whole-queue latency (single dispatch, blocked)
    ltimes = []
    for r in range(args.reps):
        xr = x0q + jnp.float32(0.001 * (r + 1))
        t0 = time.time()
        rl = ssolve(xr, psq, us0q)
        jax.block_until_ready(rl.us)
        ltimes.append(time.time() - t0)
    sync_ms = min(ltimes) * 1e3

    # warm-started (receding-horizon regime): previous solution shifted one
    # stage, slightly moved initial state — the deployment steady state
    warm_us = jnp.concatenate([res.us[:, 1:], res.us[:, -1:]], axis=1)
    dtw, res_w = min((stream(ssolve, x0q + jnp.float32(0.02), warm_us, 3)
                      for _ in range(args.reps)), key=lambda t: t[0])

    # full-convergence serving mode: extended budget + in-place restarts
    # (the drain-phase restart without its host round-trips) — only the
    # crawlers pay for either, so this replaces round-1's quorum+drain
    import dataclasses

    fopts = dataclasses.replace(opts, max_iters=60)
    fsolve = jax.jit(make_streaming_solver(ocp, fopts, backend=kern,
                                           batch_width=args.width,
                                           restarts=2))
    rf = fsolve(x0q, psq, us0q)
    jax.block_until_ready(rf.us)
    dtf, res_f = min((stream(fsolve, x0q, us0q, 2) for _ in range(args.reps)),
                     key=lambda t: t[0])

    # round-1 fixed-batch solver (latency-oriented mode), B=args.batch
    bsolve = jax.jit(make_batched_ilqr_solver(ocp, opts, backend=kern))
    Bb = min(args.batch, M)  # x0q[:Bb] must actually hold Bb problems
    x0b = x0q[:Bb]
    psb = psq[:Bb]
    usb = us0q[:Bb]
    rb = bsolve(x0b, psb, usb)
    jax.block_until_ready(rb.us)
    btimes = []
    for r in range(args.reps):
        xr = x0b + jnp.float32(0.001 * (r + 1))
        t0 = time.time()
        rb = bsolve(xr, psb, usb)
        jax.block_until_ready(rb.us)
        btimes.append(time.time() - t0)
    dtb = min(btimes)

    # closed-loop fleet simulation: the reference's headline workload — the
    # 84-step receding-horizon diff-drive run of Casadi/single_shooting_v1.py
    # (N=10, T=0.2, Euler plant shift :17-27) — batched over Bc plants, the
    # whole simulation one compiled scan (solve -> apply -> plant -> shift)
    from mpc_verde_tpu.models import unicycle
    from mpc_verde_tpu.ops import euler_step
    from mpc_verde_tpu.runtime import make_batched_receding_horizon

    Bc, Nsim, Ncl = (min(1024, args.batch), 84, 10)
    ocp_cl = build_ocp(Ncl)
    plant = euler_step(unicycle.f, 0.2)
    cl_opts = dataclasses.replace(opts, max_iters=20)
    run_cl = jax.jit(make_batched_receding_horizon(
        ocp_cl, make_batched_ilqr_solver(ocp_cl, cl_opts, backend=kern),
        lambda x, u, pp: plant(x, u, None), Nsim))
    x0c = jnp.zeros((Bc, 3), jnp.float32)
    psc = jnp.broadcast_to(target, (Nsim, Ncl + 1, 3)).astype(jnp.float32)
    rc = run_cl(x0c, psc)
    jax.block_until_ready(rc.us)
    ctimes = []
    for r in range(args.reps):
        xr = x0c + jnp.float32(0.001 * (r + 1))
        t0 = time.time()
        rc = run_cl(xr, psc)
        jax.block_until_ready(rc.us)
        ctimes.append(time.time() - t0)
    dtc = min(ctimes)
    err = jnp.linalg.norm(rc.xs[-1, :, :2] - target[:2], axis=-1)

    per_chip_target = 10000.0 / 16.0  # BASELINE.json: >=10k on v5e-16
    out = {
        "metric": f"batched_mpc_solves_per_s_chip_N{N}",
        "value": round(solves_per_s, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_s / per_chip_target, 3),
        "backend": backend,
        "solver": "streaming",
        "width": args.width,
        "queue": M,
        "max_iters": args.iters,
        "converged_frac": round(float(res.converged.mean()), 4),
        "mean_iterations": round(float(res.iterations.mean()), 2),
        "compile_s": round(compile_s, 1),
        "queue_ms": round(dt * 1e3, 2),
        "sync_latency_ms": round(sync_ms, 2),
        "warm_solves_per_s": round(M / dtw, 1),
        "warm_converged_frac": round(float(res_w.converged.mean()), 4),
        "warm_mean_iterations": round(float(res_w.iterations.mean()), 2),
        "full_solves_per_s": round(M / dtf, 1),
        "full_converged_frac": round(float(res_f.converged.mean()), 4),
        "batched_solves_per_s": round(Bb / dtb, 1),
        "batched_sync_ms": round(dtb * 1e3, 2),
        "batched_converged_frac": round(float(rb.converged.mean()), 4),
        # closed-loop fleet: Bc plants x Nsim warm-started MPC steps
        "closedloop_plants": Bc,
        "closedloop_mpc_steps_per_s": round(Bc * Nsim / dtc, 1),
        "closedloop_us_per_step_per_plant": round(dtc / Nsim / Bc * 1e6, 2),
        # real-time margin: control period T=0.2 s vs on-device step time
        "closedloop_realtime_factor": round(0.2 / (dtc / Nsim), 1),
        "closedloop_final_err_max": round(float(err.max()), 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
