"""Tracing / profiling subsystem.

Capability parity: the reference has no first-party profiler — at most
Lightning's ``profiler=`` flag (SURVEY.md §5 "Tracing/profiling",
reconstructed — reference mount empty). Rebuild design per SURVEY §5:
``jax.profiler`` traces (xplane → TensorBoard) around a step range, plus
host-side step timers built on ``block_until_ready``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(profile_dir: str):
    """Capture a jax.profiler trace into ``profile_dir`` (xplane format).

    View with ``tensorboard --logdir profile_dir``; no-op if dir is empty.
    """
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with device sync (block_until_ready)."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "steps": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p90_s": ts[min(n - 1, int(n * 0.9))],
            "min_s": ts[0],
            "max_s": ts[-1],
        }
