"""On-chip profiler attribution of the streaming iteration body.

Captures a ``jax.profiler`` device trace of the streaming solver (the
VERDICT r4 #1 ask: a profiler-attributed phase table, not another
differencing probe), then parses the Perfetto JSON into:

  * a per-pass table of device-op time (fusions, copies, Pallas kernels),
  * an interval-union gap analysis: how much of the outer while-loop's
    wall time is covered by device compute vs scheduling gaps.

Round-5 findings (1x v5e, W=1024, N=40, 16k queue — recorded in
docs/design.md "The body, profiled on-chip"):

  * gaps are 0.6% of the body — the W-scaling conclusion (the body is
    per-problem compute, not a latency stack) confirmed by direct
    observation;
  * the line-search scan is ~241 us of the ~420-470 us pass; ~107 us of
    that (25% of the body) is XLA scan-output copies (materializing all
    A alpha-candidate trajectories per step);
  * the ``linesearch="costonly"`` mode, which writes ~A x less, was
    re-measured IN-LOOP on the same methodology: body 584 vs 465 us and
    +1.5 mean iterations — the second sequential scan chain costs more
    than the copies save, so "materialize" stays the default (now
    confirmed with the honest probe, not the round-2 chained one).

Usage (on the TPU):  python benchmarks/trace_phases.py [--width 1024]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import time


def capture(width: int, queue: int, horizon: int, logdir: str) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import mpc_verde_tpu as mv
    from mpc_verde_tpu.solver.streaming import make_streaming_solver
    from bench import build_ocp

    ocp = build_ocp(horizon)
    rng = np.random.default_rng(0)
    target = jnp.array([10.0, 10.0, 0.0], dtype=jnp.float32)
    x0q = jnp.array(rng.uniform(-2.0, 2.0, (queue, 3)), dtype=jnp.float32)
    psq = jnp.broadcast_to(target, (queue, horizon + 1, 3)).astype(jnp.float32)
    us0q = jnp.zeros((queue, horizon, 2), dtype=jnp.float32)
    opts = mv.ILQROptions(max_iters=60, tol_grad=1e-4, tol_cost=1e-6,
                          n_alphas=8, alpha_decay=0.4)
    ssolve = jax.jit(make_streaming_solver(ocp, opts, backend="pallas_bw",
                                           batch_width=width))
    r = ssolve(x0q, psq, us0q, 60, 2)
    float(r.iterations.sum())           # compile + warm
    jax.profiler.start_trace(logdir)
    t0 = time.time()
    r = ssolve(x0q + 1e-4, psq, us0q, 60, 2)
    float(r.iterations.sum())
    dt = time.time() - t0
    jax.profiler.stop_trace()
    print(f"captured: {queue} problems in {dt:.2f}s "
          f"({queue / dt:.0f} solves/s under profiling)")


def analyze(logdir: str, top: int = 30) -> None:
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no trace under {logdir}")
    with gzip.open(paths[-1]) as f:
        t = json.load(f)
    ev = [e for e in t["traceEvents"] if e.get("ph") == "X"
          and "device_offset_ps" in e.get("args", {})]

    def span(e):
        o = int(e["args"]["device_offset_ps"])
        return o, o + int(e["args"]["device_duration_ps"])

    outer = [e for e in ev if e["name"].startswith("while.")]
    # the outermost while = the streaming loop; inner whiles = scans
    outer.sort(key=lambda e: span(e)[1] - span(e)[0], reverse=True)
    w_main = outer[0]
    ws, we = span(w_main)
    inner_scan = [e for e in outer[1:]
                  if span(e)[0] >= ws and span(e)[1] <= we]
    scan_name = (collections.Counter(e["name"] for e in inner_scan)
                 .most_common(1)[0][0] if inner_scan else None)
    n_pass = sum(1 for e in inner_scan if e["name"] == scan_name) or 1

    skip = {w_main["name"], scan_name} | {
        e["name"] for e in ev if e["name"].startswith("jit_")}
    leaves = [e for e in ev if e["name"] not in skip
              and ws <= span(e)[0] and span(e)[1] <= we]

    def union(spans):
        spans = sorted(spans)
        if not spans:
            return 0
        tot, (cs, ce) = 0, spans[0]
        for s, e2 in spans[1:]:
            if s > ce:
                tot += ce - cs
                cs, ce = s, e2
            else:
                ce = max(ce, e2)
        return tot + (ce - cs)

    wall = we - ws
    cov = union([span(e) for e in leaves])
    print(f"passes: {n_pass}")
    print(f"per pass: wall {wall / n_pass / 1e6:.1f} us, device-op coverage "
          f"{cov / n_pass / 1e6:.1f} us, gaps {(wall - cov) / n_pass / 1e6:.1f} "
          f"us ({100 * (wall - cov) / wall:.1f}%)")
    if scan_name:
        ls_wall = sum(span(e)[1] - span(e)[0]
                      for e in inner_scan if e["name"] == scan_name)
        print(f"line-search scan ({scan_name}): "
              f"{ls_wall / n_pass / 1e6:.1f} us/pass")
    agg = collections.Counter()
    for e in leaves:
        agg[e["name"]] += int(e["args"]["device_duration_ps"])
    print(f"\nper-pass us by device op (top {top}):")
    copies = 0
    for name, d in agg.most_common(top):
        print(f"  {d / n_pass / 1e6:7.1f}  {name[:80]}")
    for name, d in agg.items():
        if name.startswith("copy"):
            copies += d
    print(f"\ntotal copy ops: {copies / n_pass / 1e6:.1f} us/pass "
          f"({100 * copies / wall:.1f}% of the body)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--queue", type=int, default=16384)
    ap.add_argument("--horizon", type=int, default=40)
    ap.add_argument("--logdir", default="/tmp/mpc_trace")
    ap.add_argument("--analyze-only", action="store_true")
    args = ap.parse_args()
    if not args.analyze_only:
        capture(args.width, args.queue, args.horizon, args.logdir)
    analyze(args.logdir)
