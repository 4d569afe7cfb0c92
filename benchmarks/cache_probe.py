"""Persistent-compilation-cache diagnosis on the axon remote-TPU (W1 / r3 #4).

Round 3 observed 5.5 s vs 200-280 s cold-start for the SAME streaming
program across bench invocations — i.e. the persistent cache hits only
sometimes.  Round 4 established the lowered HLO is bit-identical across
processes (tracing is deterministic), so the variance must come from the
cache layer itself.  This probe compiles a fixed mid-sized program with
``jax_explain_cache_misses`` enabled and reports compile wall time plus
the cache directory's before/after entry listing — run it twice (two
processes) and compare:

    python benchmarks/cache_probe.py --tag run1
    python benchmarks/cache_probe.py --tag run2

If run2 still pays the compile, the explain-misses log (stderr) says why.
"""
from __future__ import annotations

import argparse
import glob
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="run")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        from mpc_verde_tpu.utils import force_cpu

        force_cpu()

    logging.basicConfig(level=logging.WARNING)
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_explain_cache_misses", True)
    except Exception as e:
        print(f"[cache] no explain_cache_misses: {e}", file=sys.stderr)
    # log cache layer activity
    logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
    logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)

    import jax.numpy as jnp
    import numpy as np

    before = sorted(os.path.basename(p) for p in glob.glob(cache + "/*"))

    # A fixed, deterministic, mid-sized program, big enough to take >1 s to
    # compile (so the cache entry is actually written — jax skips entries
    # under persistent_cache_min_compile_time_secs).  EVERYTHING is an
    # argument or a python/numpy constant: round 4 measured a device-array
    # closure constant costing ~18 MINUTES at lowering time (the tunnel
    # fetches it back at ~0.5 KB/s — the r3 footgun, still the #1 cold-start
    # hazard on this image).
    def f(x, w1, w2):
        def step(c, i):
            c = jnp.tanh(c @ w1) @ w2 + c * (1.0 + 1e-7 * i)
            return c, jnp.sum(c)
        out, ss = jax.lax.scan(step, x, jnp.arange(512, dtype=jnp.float32))
        return out, ss

    rng = np.random.default_rng(0)
    w1 = np.asarray(rng.standard_normal((256, 256)), np.float32)
    w2 = np.asarray(rng.standard_normal((256, 256)), np.float32)
    x = np.asarray(rng.standard_normal((256, 256)), np.float32)

    t0 = time.time()
    out, ss = jax.jit(f)(x, w1, w2)
    barrier = float(jnp.sum(ss))
    dt = time.time() - t0
    after = sorted(os.path.basename(p) for p in glob.glob(cache + "/*"))
    new = [p for p in after if p not in before]
    print(f"[cache:{args.tag}] compile+run {dt:.2f}s  "
          f"entries before={len(before)} after={len(after)} new={new}",
          flush=True)


if __name__ == "__main__":
    main()
