"""Profiling: device traces + per-phase wall timing.

Upgrades the reference's observability (per-iteration ``time()`` prints —
``Casadi/single_shooting_v1.py:206-212``) to a ``jax.profiler`` device trace
plus the phase Timer.  View traces with TensorBoard or Perfetto.
"""
from __future__ import annotations

import contextlib

import jax

from .timing import Timer


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/mpc_verde_trace"):
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class SolvePhaseTimer(Timer):
    """Timer with phase names standardized across the solver pipeline
    (rollout / linearize / backward / line_search / plant)."""

    PHASES = ("rollout", "linearize", "backward", "line_search", "plant")

    def report(self) -> str:
        rows = [f"{k:>12s}: total {v['total_s']:.3f}s  mean {v['mean_ms']:.2f}ms"
                f"  n={v['count']}"
                for k, v in self.summary().items()]
        return "\n".join(rows)
