"""Checkpoint/resume for long closed-loop simulations.

The reference has no in-process checkpointing (SURVEY.md §5.4): closed-loop
results are dumped to xlsx/csv only at the end, and a crash loses the run.
Here the receding-horizon loop can run in segments with its full resumable
state — current plant state, warm-start plan, step index, and accumulated
history — persisted between segments (npz on local disk; the same dict is
orbax-compatible for cloud storage since it is a flat pytree of arrays).
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from .receding import ClosedLoopResult


def save_checkpoint(path: str, state: dict) -> str:
    """Persist a resumable-state dict of arrays (atomic rename)."""
    p = Path(path)
    tmp = p.with_suffix(".tmp.npz")
    np.savez(tmp, **{k: np.asarray(v) for k, v in state.items()})
    tmp.replace(p)
    return str(p)


def load_checkpoint(path: str) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


@dataclasses.dataclass
class SegmentedRun:
    """Run a closed loop in checkpointed segments.

    ``make_runner(n_steps)`` must return a jitted receding-horizon runner for
    a segment of that length (from ``make_receding_horizon``); the same
    compiled runner is reused for every full segment.
    """

    make_runner: Callable[[int], Callable]
    segment_steps: int
    checkpoint_path: Optional[str] = None

    def _seg_path(self, idx: int) -> Path:
        return Path(f"{self.checkpoint_path}.seg{idx:05d}.npz")

    def run(self, x0, params_seq, plant_params=None, us_init=None,
            resume: bool = True):
        n_total = len(params_seq)
        start = 0
        seg_idx = 0
        hist_xs, hist_us, hist_conv = [], [], []
        x = jnp.asarray(x0)
        warm = us_init

        if resume and self.checkpoint_path and Path(self.checkpoint_path).is_file():
            ck = load_checkpoint(self.checkpoint_path)
            # a stale checkpoint from a *different* run (other initial state
            # or run length) must not be silently resumed
            same_run = (int(ck.get("n_total", -1)) == n_total
                        and ck["x0"].shape == np.asarray(x0).shape
                        and np.allclose(ck["x0"], np.asarray(x0)))
            if same_run:
                start = int(ck["step"])
                seg_idx = int(ck["segments"])
                x = jnp.asarray(ck["x"])
                warm = jnp.asarray(ck["warm"])
                for i in range(seg_idx):
                    seg = load_checkpoint(self._seg_path(i))
                    hist_xs.append(seg["xs"])
                    hist_us.append(seg["us"])
                    hist_conv.append(seg["converged"])

        runner = self.make_runner(self.segment_steps)
        while start < n_total:
            n = min(self.segment_steps, n_total - start)
            r = runner if n == self.segment_steps else self.make_runner(n)
            seg_params = jnp.asarray(params_seq[start:start + n])
            seg_plant = None if plant_params is None else jnp.asarray(
                plant_params[start:start + n])
            res: ClosedLoopResult = r(x, seg_params, seg_plant, warm)
            seg_hist = {"xs": np.asarray(res.xs[:-1]),
                        "us": np.asarray(res.us),
                        "converged": np.asarray(res.converged)}
            hist_xs.append(seg_hist["xs"])
            hist_us.append(seg_hist["us"])
            hist_conv.append(seg_hist["converged"])
            x = res.xs[-1]
            warm = res.final_warm
            start += n
            if self.checkpoint_path:
                # per-segment history files + a small head state: I/O stays
                # linear in run length instead of re-serializing everything
                save_checkpoint(str(self._seg_path(seg_idx)), seg_hist)
                seg_idx += 1
                save_checkpoint(self.checkpoint_path, {
                    "step": start, "segments": seg_idx, "x": x, "warm": warm,
                    "n_total": n_total, "x0": np.asarray(x0),
                })

        xs = np.concatenate(hist_xs + [np.asarray(x)[None]])
        us = np.concatenate(hist_us)
        conv = np.concatenate(hist_conv)
        return {"xs": xs, "us": us, "converged": conv}
