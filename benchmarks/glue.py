"""Direct measurement of the streaming-iteration "glue" (VERDICT r3 #1).

Round 3's phase table derived the dominant per-iteration cost — ~357 us of
"acceptance / while_loop glue" — as a RESIDUAL between two harnesses (the
phases.py body sum vs a max_iters-differencing probe).  This harness measures
the glue directly and breaks it down:

  * ``refill_packed``   — the round-4 refill block: ONE packed output scatter
    + ONE packed queue gather + the slot-state where-chain
    (solver/streaming.py ``refill``).
  * ``refill_legacy``   — the round-3 shape: SIX output scatters + THREE
    queue gathers + the same where-chain (kept here as the ablation).
  * ``accept``          — ``batched._accept_and_update`` alone.
  * ``linesearch_uN``   — the XLA line-search forward pass at scan unroll
    1/4/8 (the other latency stack: N sequential scan-step launches).
  * ``body_diff``       — ground truth: full streaming solve at iteration
    budgets 1 vs 21 on the same executable (budgets are runtime scalars),
    differenced to a per-iteration body cost.

All timings use the fetch-based completion barrier and the chained-K
amortization of benchmarks/phases.py (the ~25 ms tunnel RTT / K floor is
subtracted via the null chain).  Also dumps StableHLO op counts
(scatter/gather/while) of the lowered streaming solve — lowering is local
and cheap; compiled-HLO fusion counts would need a remote compile.

Usage: python benchmarks/glue.py [--width 1024] [--queue 16384] [--cpu]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--queue", type=int, default=16384)
    ap.add_argument("--horizon", type=int, default=40)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--unrolls", default="1,4,8")
    ap.add_argument("--refill-every", type=int, default=1,
                    help="cadence for the body_diff probe")
    ap.add_argument("--ls-unroll", type=int, default=1,
                    help="rollout/line-search scan unroll for the body_diff "
                         "probe — the r4 'unroll is slower' verdict came "
                         "from CHAINED probes, which pipeline across calls "
                         "and hide serial launch gaps; only the in-loop "
                         "body measurement is ground truth")
    ap.add_argument("--n-alphas", type=int, default=8,
                    help="line-search grid width for the body_diff probe "
                         "(r5: the in-loop body is per-problem COMPUTE "
                         "dominated, and line-search work scales with A)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-body", action="store_true",
                    help="skip the full-solve differencing probe (no "
                         "streaming compile)")
    ap.add_argument("--skip-micro", action="store_true",
                    help="skip the chained micro-probes (body_diff only)")
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
    from mpc_verde_tpu.solver.batched import _make_parts, _accept_and_update
    from mpc_verde_tpu.solver.streaming import make_streaming_solver

    N = args.horizon
    B = args.width
    M = args.queue
    ocp = build_ocp(N)
    nx, nu, npar = ocp.nx, ocp.nu, 3
    base_opt = mv.ILQROptions(max_iters=40, tol_grad=1e-4, tol_cost=1e-6,
                              n_alphas=8, alpha_decay=0.4)
    kern = "pallas_bw" if jax.default_backend() == "tpu" else "xla"
    K = args.k

    def chain(fn, perturb):
        def body(args_):
            s = jnp.zeros((), jnp.float32)
            out = None
            for i in range(K):
                out = fn(*perturb(args_, s, i))
                s = s + jnp.sum(jax.tree_util.tree_leaves(out)[0]
                                ).astype(jnp.float32)
            return out, s
        return jax.jit(body)

    def timed(fn, inp, tag=""):
        print(f"[glue] compiling {tag}...", file=sys.stderr, flush=True)
        t0 = time.time()
        out, s = fn(inp)
        float(s)  # compile + fetch barrier
        print(f"[glue] {tag} compiled+warm in {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            out, s = fn(inp)
            float(s)
            ts.append(time.time() - t0)
        print(f"[glue] {tag}: {min(ts) / K * 1e6:.1f} us/call",
              file=sys.stderr, flush=True)
        return min(ts) / K

    rng = np.random.default_rng(0)
    eps = lambda s: s * jnp.float32(1e-20)
    f32 = jnp.float32

    # ---- shared slot-state inputs (the streaming body's carry shapes) -----
    xs = f32(rng.uniform(-1, 1, (B, N + 1, nx)))
    us = f32(0.1 * rng.standard_normal((B, N, nu)))
    cost = f32(rng.uniform(10, 20, (B,)))
    reg = jnp.full((B,), 1e-6, f32)
    it = jnp.full((B,), 5, jnp.int32)
    done = jnp.asarray(rng.random(B) < 0.06)        # ~6%/iter finish rate
    gnorm = f32(rng.uniform(0, 1, (B,)))
    stall = jnp.zeros((B,), jnp.int32)
    fail = jnp.zeros((B,), bool)
    ddp_on = jnp.ones((B,), bool)
    prob = jnp.asarray(rng.integers(0, M, (B,)), jnp.int32)
    iacc = jnp.zeros((B,), jnp.int32)
    nqp = jnp.asarray(B, jnp.int32)

    sx, su, sp = (N + 1) * nx, N * nu, (N + 1) * npar
    qpk = f32(rng.uniform(-1, 1, (M, nx + sp + su)))
    x0q = qpk[:, :nx]
    psq = qpk[:, nx:nx + sp].reshape(M, N + 1, npar)
    us0q = qpk[:, nx + sp:].reshape(M, N, nu)
    out_pk = jnp.zeros((M + 1, sx + su + 4), f32)
    out6 = (jnp.zeros((M + 1, N + 1, nx), f32), jnp.zeros((M + 1, N, nu), f32),
            jnp.zeros((M + 1,), f32), jnp.zeros((M + 1,), f32),
            jnp.zeros((M + 1,), jnp.int32), jnp.zeros((M + 1,), bool))

    inf = np.float32(np.inf)

    capped = jnp.zeros((B,), bool)
    rst = jnp.zeros((B,), jnp.int32)
    alr = jnp.zeros((B,), jnp.int32)

    def _slot_resets(has, fin, cand, state):
        """The refill where-chain over the slot state — op-for-op the
        production chain of solver/streaming.py's ``refill`` (incl. the
        capped/rst/alr resets and the fin->idle prob transition), so the
        measured cost matches what the solver actually pays per refill."""
        (xs, us, cost, reg, it, done, gnorm, stall, fail, ddp_on, prob,
         capped_, rst_, alr_, iacc_) = state
        sel3 = has.reshape((B, 1, 1))
        xs = jnp.where(sel3, 0.0, xs)
        cost = jnp.where(has, inf, cost)
        reg = jnp.where(has, np.float32(1e-6), reg)
        it = jnp.where(has, -1, it)
        gnorm = jnp.where(has, inf, gnorm)
        stall = jnp.where(has, 0, stall)
        fail = jnp.where(has, False, fail)
        ddp_on = jnp.where(has, True, ddp_on)
        capped_ = jnp.where(has, False, capped_)
        done = jnp.where(has, False, done)
        prob = jnp.where(has, cand, jnp.where(fin, M, prob))
        rst_ = jnp.where(has, 0, rst_)
        iacc_ = jnp.where(has, 0, iacc_)
        alr_ = jnp.where(has, 0, alr_)
        return (xs, us, cost, reg, it, done, gnorm, stall, fail, ddp_on,
                prob, capped_, rst_, alr_, iacc_)

    def refill_packed(xs, us, cost, done, out):
        fin = done & (prob < M)
        widx = jnp.where(fin, prob, M)
        conv = ~fail & jnp.isfinite(cost) & ~capped
        row = jnp.concatenate(
            [xs.reshape(B, sx), us.reshape(B, su), cost[:, None],
             gnorm[:, None], (iacc + jnp.maximum(it, 0)).astype(f32)[:, None],
             conv.astype(f32)[:, None]], axis=1)
        out = out.at[widx].set(row)
        rank = jnp.cumsum(fin.astype(jnp.int32)) - 1
        cand = nqp + rank
        has = fin & (cand < M)
        gidx = jnp.clip(cand, 0, M - 1)
        qrow = qpk[gidx]
        selb = lambda new, old: jnp.where(
            has.reshape((B,) + (1,) * (new.ndim - 1)), new, old)
        x0s = qrow[:, :nx]
        ps_n = selb(qrow[:, nx:nx + sp].reshape(B, N + 1, npar), 0.0 * xs[:, :, :1] + 1.0)
        us = selb(qrow[:, nx + sp:].reshape(B, N, nu), us)
        st = _slot_resets(has, fin, cand,
                          (xs, us, cost, reg, it, done, gnorm, stall, fail,
                           ddp_on, prob, capped, rst, alr, iacc))
        return (out, x0s, ps_n) + st

    def refill_legacy(xs, us, cost, done, out6_):
        o_xs, o_us, o_cost, o_gnorm, o_it, o_conv = out6_
        fin = done & (prob < M)
        widx = jnp.where(fin, prob, M)
        o_xs = o_xs.at[widx].set(xs)
        o_us = o_us.at[widx].set(us)
        o_cost = o_cost.at[widx].set(cost)
        o_gnorm = o_gnorm.at[widx].set(gnorm)
        o_it = o_it.at[widx].set(iacc + jnp.maximum(it, 0))
        o_conv = o_conv.at[widx].set(~fail & jnp.isfinite(cost) & ~capped)
        rank = jnp.cumsum(fin.astype(jnp.int32)) - 1
        cand = nqp + rank
        has = fin & (cand < M)
        gidx = jnp.clip(cand, 0, M - 1)
        selb = lambda new, old: jnp.where(
            has.reshape((B,) + (1,) * (new.ndim - 1)), new, old)
        x0s = x0q[gidx]
        ps_n = selb(psq[gidx], 0.0 * xs[:, :, :1] + 1.0)
        us = selb(us0q[gidx], us)
        st = _slot_resets(has, fin, cand,
                          (xs, us, cost, reg, it, done, gnorm, stall, fail,
                           ddp_on, prob, capped, rst, alr, iacc))
        return (o_xs, o_us, o_cost, o_gnorm, o_it, o_conv, x0s, ps_n) + st

    row = {"metric": "streaming_glue_us", "width": B, "N": N, "queue": M,
           "backend": jax.default_backend(), "kernel": kern, "chain_k": K}

    if not args.skip_micro:
        # null chain: scaffolding + dispatch RTT
        null = timed(chain(lambda a: (a * 1.000001,),
                           lambda a, s, i: (a[0] + eps(s),)), (reg,),
                     tag="null")
        row["null_us"] = round(null * 1e6, 1)

        t = timed(chain(refill_packed,
                        lambda a, s, i: (a[0] + eps(s), a[1], a[2], a[3],
                                         a[4])),
                  (xs, us, cost, done, out_pk), tag="refill_packed")
        row["refill_packed_us"] = round((t - null) * 1e6, 1)

        t = timed(chain(refill_legacy,
                        lambda a, s, i: (a[0] + eps(s), a[1], a[2], a[3],
                                         a[4])),
                  (xs, us, cost, done, out6), tag="refill_legacy")
        row["refill_legacy_us"] = round((t - null) * 1e6, 1)

        # accept block alone
        def accept(xs_b, us_b, new_cost, gmax):
            return _accept_and_update(
                base_opt, (xs, us, cost, reg, it, done, gnorm, stall, fail,
                           ddp_on), gmax, xs_b, us_b, new_cost,
                fresh=jnp.zeros((B,), bool))

        xs_b = xs * 1.01
        us_b = us * 1.01
        t = timed(chain(accept,
                        lambda a, s, i: (a[0] + eps(s), a[1], a[2], a[3])),
                  (xs_b, us_b, cost * 0.9, gnorm), tag="accept")
        row["accept_us"] = round((t - null) * 1e6, 1)

        # line search at each unroll factor
        ps_full = jnp.broadcast_to(jnp.array([10.0, 10.0, 0.0], f32),
                                   (B, N + 1, npar)).astype(f32)
        x0 = f32(rng.uniform(-2, 2, (B, nx)))
        kffs = f32(0.01 * rng.standard_normal((B, N, nu)))
        Ks = f32(0.01 * rng.standard_normal((B, N, nu, nx)))
        for u in [int(x) for x in args.unrolls.split(",")]:
            parts_u = _make_parts(
                ocp, dataclasses.replace(base_opt, ls_unroll=u), kern,
                "materialize")
            t = timed(chain(parts_u.linesearch,
                            lambda a, s, i: (a[0] + eps(s), a[1], a[2], a[3],
                                             a[4], a[5])),
                      (x0, xs, us, ps_full, kffs, Ks),
                      tag=f"linesearch_u{u}")
            row[f"linesearch_u{u}_us"] = round((t - null) * 1e6, 1)

        # full compute block (derivs -> backward -> linesearch -> accept) as
        # a straight chain OUTSIDE any while_loop: the gap between this and
        # body_diff is the while-loop-specific residual (cond + carry
        # plumbing + loop-iteration turnaround), as opposed to the
        # fusion-chain launch gaps which this probe includes
        parts_c = _make_parts(ocp, base_opt, kern, "materialize")

        def compute_once(x0c, xsc, usc, costc):
            d, gN, HN, dlb, dub = parts_c.derivs(xsc, usc, ps_full)
            kffs_c, Ks_c, dV1, dV2, gmax = parts_c.backward(
                d, gN, HN, dlb, dub, reg, ddp_on.astype(jnp.float32))
            xs_b2, us_b2, new_c = parts_c.linesearch(
                x0c, xsc, usc, ps_full, kffs_c, Ks_c)
            st = _accept_and_update(
                base_opt, (xsc, usc, costc, reg, it, done, gnorm, stall,
                           fail, ddp_on), gmax, xs_b2, us_b2, new_c,
                fresh=jnp.zeros((B,), bool))
            return st[0], st[1], st[2]

        t = timed(chain(lambda a, b, c, d_: compute_once(a, b, c, d_),
                        lambda a, s, i: (a[0] + eps(s), a[1], a[2], a[3])),
                  (x0, xs, us, cost), tag="compute_chain")
        row["compute_chain_us"] = round((t - null) * 1e6, 1)

    # ---- ground truth: full-solve differencing -----------------------------
    if not args.skip_body:
        print(f"[glue] compiling streaming solve "
              f"(refill_every={args.refill_every})...",
              file=sys.stderr, flush=True)
        row["refill_every"] = args.refill_every
        row["ls_unroll"] = args.ls_unroll
        row["n_alphas"] = args.n_alphas
        opt_b = dataclasses.replace(base_opt, max_iters=40,
                                    ls_unroll=args.ls_unroll,
                                    n_alphas=args.n_alphas)
        ssolve = jax.jit(make_streaming_solver(
            ocp, opt_b, backend=kern, batch_width=B,
            refill_every=args.refill_every))
        x0qs = f32(rng.uniform(-2, 2, (M, nx)))
        psqs = jnp.broadcast_to(jnp.array([10.0, 10.0, 0.0], f32),
                                (M, N + 1, npar)).astype(f32)
        usqs = jnp.zeros((M, N, nu), f32)

        def run(mi):
            t0 = time.time()
            r = ssolve(x0qs, psqs, usqs, mi, 0)
            it_total = float(jnp.sum(r.iterations))
            return time.time() - t0, it_total

        t0 = time.time()
        run(1)  # compile
        print(f"[glue] streaming solve compiled in {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        lo, it_lo = min(run(1) for _ in range(args.reps))
        hi, it_hi = min(run(21) for _ in range(args.reps))
        # Divide by the MEASURED iteration delta, not the budget delta: a
        # problem that converges before the cap frees its slot early, so at
        # budget 21 the mean consumed iterations is well below 21 (measured
        # ~13.9 at N=40 — ~88% converge before the cap).  Round 4 divided by
        # the assumed 20.0 * M / B and under-reported the body by ~1.56x
        # (VERDICT r4 W1).  Body executions run all B slots in lockstep, so
        # the time delta spans (it_hi - it_lo) / B extra executions (the
        # constant per-problem fresh/scatter passes cancel in differencing).
        extra_execs = (it_hi - it_lo) / B
        per_iter = (hi - lo) / extra_execs
        row["body_diff_us"] = round(per_iter * 1e6, 1)
        row["mean_iters_budget1"] = round(it_lo / M, 2)
        row["mean_iters_budget21"] = round(it_hi / M, 2)
        row["t_budget1_s"] = round(lo, 3)
        row["t_budget21_s"] = round(hi, 3)

        # StableHLO op census of the lowered solve (local, no compile)
        try:
            txt = jax.jit(make_streaming_solver(
                ocp, opt_b, backend=kern, batch_width=B,
                refill_every=args.refill_every)).lower(
                x0qs, psqs, usqs, 1, 0).as_text()
            # fusion is a compiled-HLO concept, not StableHLO — don't
            # pretend to count it at this layer (docstring caveat)
            for op in ("scatter", "gather", "while", "sort"):
                row[f"hlo_{op}"] = txt.count(f"stablehlo.{op}")
        except Exception as e:  # pragma: no cover
            row["hlo_error"] = str(e)[:80]

    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
