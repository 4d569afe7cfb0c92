"""Per-phase timing of the DDP iteration body on the bench workload.

The iteration body has four phases (solver/batched.py `_make_parts`):
rollout (initial only), derivs (stage linearization, embarrassingly
parallel), backward (sequential-in-N Riccati), linesearch (A-alpha forward
sweep, sequential-in-N).  This harness jits each phase separately at the
streaming width and the fixed-batch width and times them with the
fetch-based completion barrier (bench.py module docstring), giving the
phase breakdown that decides which fusion lever pays (docs/design.md
"Roofline").

Each phase is timed as k back-to-back dispatches inside one jit (scanned)
so the ~26 ms tunnel dispatch latency amortizes; the per-call time is
wall / k.

Usage: python benchmarks/phases.py [--batch 1024,4096] [--reps 5] [--k 20]
Prints one JSON line per batch width.
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
    ap.add_argument("--batch", default="1024,4096")
    ap.add_argument("--horizon", type=int, default=40)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--k", type=int, default=50,
                    help="chained calls per timed dispatch")
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
    from mpc_verde_tpu.solver.batched import _make_parts

    N = args.horizon
    ocp = build_ocp(N)
    opt = mv.ILQROptions(max_iters=40, tol_grad=1e-4, tol_cost=1e-6,
                         n_alphas=8, alpha_decay=0.4)
    kern = "pallas_bw" if jax.default_backend() == "tpu" else "xla"
    parts = _make_parts(ocp, opt, kern, "materialize")
    K = args.k

    def chain(fn, perturb):
        """Call fn K times with a data-dependent perturbation chaining the
        calls (so XLA cannot parallelize them away) inside one jit."""
        def body(args):
            s = jnp.zeros((), jnp.float32)
            out = None
            for i in range(K):
                out = fn(*perturb(args, s, i))
                s = s + jnp.sum(jax.tree_util.tree_leaves(out)[0]
                                ).astype(jnp.float32)
            return out, s
        return jax.jit(body)

    rng = np.random.default_rng(0)
    for B in [int(b) for b in args.batch.split(",")]:
        x0 = jnp.array(rng.uniform(-2, 2, (B, 3)), jnp.float32)
        ps = jnp.broadcast_to(jnp.array([10.0, 10.0, 0.0], jnp.float32),
                              (B, N + 1, 3)).astype(jnp.float32)
        us = jnp.array(0.1 * rng.standard_normal((B, N, 2)), jnp.float32)
        xs, us_c, _ = jax.jit(parts.rollout)(x0, us, ps)
        d, gN, HN, dlb, dub = jax.jit(parts.derivs)(xs, us_c, ps)
        reg = jnp.full((B,), 1e-6, jnp.float32)
        ddp = jnp.ones((B,), jnp.float32)
        kffs, Ks_, dV1, dV2, gmax = jax.jit(parts.backward)(
            d, gN, HN, dlb, dub, reg, ddp)

        eps = lambda s: s * jnp.float32(1e-20)

        phases = {
            # null: chain scaffolding + dispatch RTT alone — subtract from
            # every phase reading (the ~25 ms tunnel RTT / K floor)
            "null": (chain(lambda a: (a * 1.000001,),
                           lambda a, s, i: (a[0] + eps(s),)),
                     (reg,)),
            "rollout": (chain(parts.rollout,
                              lambda a, s, i: (a[0] + eps(s), a[1], a[2])),
                        (x0, us, ps)),
            "derivs": (chain(parts.derivs,
                             lambda a, s, i: (a[0] + eps(s), a[1], a[2])),
                       (xs, us_c, ps)),
            "backward": (chain(
                parts.backward,
                lambda a, s, i: (a[0], a[1] + eps(s), a[2], a[3], a[4],
                                 a[5], a[6])),
                (d, gN, HN, dlb, dub, reg, ddp)),
            "linesearch": (chain(
                parts.linesearch,
                lambda a, s, i: (a[0] + eps(s), a[1], a[2], a[3], a[4],
                                 a[5])),
                (x0, xs, us_c, ps, kffs, Ks_)),
        }

        row = {"metric": "iteration_phase_us", "batch": B, "N": N,
               "backend": jax.default_backend(), "kernel": kern, "chain_k": K}
        total = 0.0
        for name, (fn, inp) in phases.items():
            out, s = fn(inp)
            float(s)  # compile + fetch barrier
            ts = []
            for _ in range(args.reps):
                t0 = time.time()
                out, s = fn(inp)
                float(s)
                ts.append(time.time() - t0)
            per_call = min(ts) / K
            row[name + "_us"] = round(per_call * 1e6, 1)
            if name not in ("rollout", "null"):
                total += per_call
        null = row.get("null_us", 0.0) * 1e-6
        total = max(total - 3 * null, 1e-9)
        for name in ("rollout", "derivs", "backward", "linesearch"):
            row[name + "_us"] = round(row[name + "_us"] - row["null_us"], 1)
        row["iter_body_us"] = round(total * 1e6, 1)
        row["iters_per_s_bound"] = round(1.0 / total, 1)
        row["solves_per_s_bound_15it"] = round(B / (15 * total), 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
