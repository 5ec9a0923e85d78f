"""Tracing / profiling subsystem.

Capability parity: the reference has no first-party profiler — at most
Lightning's ``profiler=`` flag (SURVEY.md §5 "Tracing/profiling",
reconstructed — reference mount empty). Rebuild design per SURVEY §5:
``jax.profiler`` traces (xplane → TensorBoard) around a step range, plus
host-side step timers built on ``block_until_ready``.
"""

from __future__ import annotations

import contextlib
import os
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


def summarize_trace(profile_dir: str, top: int = 15) -> List[Dict]:
    """Summarize a jax.profiler trace: per-op-group device time.

    Reads the newest ``*.trace.json.gz`` under ``profile_dir`` (written by
    ``trace()``/``start_trace``) and aggregates device-side op durations,
    grouping ops by name with trailing ``.N`` indices stripped. Returns a
    list of {"op", "ms", "percent"} rows, largest first — the same analysis
    used to find the BatchNorm-statistics bottleneck (BASELINE.md).
    """
    import collections
    import glob
    import gzip
    import json
    import re

    paths = sorted(glob.glob(os.path.join(
        profile_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {profile_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    dev_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", "")).upper()}
    agg = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("dur") and e.get("pid") in dev_pids:
            name = e.get("name", "")
            if name.startswith("jit_"):
                total += e["dur"]
                continue
            if name.isdigit():
                continue  # per-step markers
            agg[re.sub(r"\.\d+$", "", name)] += e["dur"]
    total = total or sum(agg.values())
    rows = [{"op": k, "ms": v / 1e3, "percent": 100.0 * v / total}
            for k, v in agg.most_common(top)]
    return rows


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
