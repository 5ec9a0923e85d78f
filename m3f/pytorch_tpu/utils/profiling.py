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


def summarize_trace(profile_dir: str, top: int = 15,
                    group: bool = True) -> List[Dict]:
    """Summarize a jax.profiler trace: device time per op.

    Reads the newest ``*.trace.json.gz`` under ``profile_dir`` (written by
    ``trace()``/``start_trace``) and aggregates device-side op durations.
    ``group=True`` merges ops by name with trailing ``.N`` indices stripped
    (the categorical view); ``group=False`` keeps each HLO fusion separate
    and attaches its shape signature from the trace's ``long_name`` (the
    view used for the stage-1 lane-padding analysis, BASELINE.md). Returns
    {"op", "ms", "percent"[, "count", "detail"]} rows, largest first.
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
    count = collections.Counter()
    detail: Dict[str, str] = {}
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("dur") and e.get("pid") in dev_pids:
            name = e.get("name", "")
            if name.startswith("jit_"):
                total += e["dur"]
                continue
            if name.isdigit():
                continue  # per-step markers
            key = re.sub(r"\.\d+$", "", name) if group else name
            agg[key] += e["dur"]
            count[key] += 1
            if not group and key not in detail:
                # "%fusion.1 = (bf16[64]{...}, ...) fusion(...)" → keep the
                # result shapes, drop tiling annotations
                ln = str(e.get("args", {}).get("long_name", ""))
                ln = ln.partition(" fusion(")[0].partition(" = ")[2]
                detail[key] = re.sub(r"\{[^}]*\}", "", ln)[:120]
    total = total or sum(agg.values())
    rows = []
    for k, v in agg.most_common(top):
        row = {"op": k, "ms": v / 1e3, "percent": 100.0 * v / total}
        if not group:
            row["count"] = count[k]
            row["detail"] = detail.get(k, "")
        rows.append(row)
    return rows


def device_total_ms(profile_dir: str) -> float:
    """Total DEVICE-side executable time (ms) in the newest trace.

    Sums the top-level ``jit_*`` program executions on TPU device tracks —
    i.e. pure on-chip compute, excluding host work and H2D transfers. Used
    by the smoke gate so the eval regression row isn't drowned by remote-
    tunnel H2D variance (VERDICT r2 weak #6: wall frames/s through the
    ~41 MB/s tunnel can't catch device-side regressions).
    """
    import glob
    import gzip
    import json

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
    total_us = sum(e["dur"] for e in events
                   if e.get("ph") == "X" and e.get("dur")
                   and e.get("pid") in dev_pids
                   and str(e.get("name", "")).startswith("jit_"))
    return total_us / 1e3


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
