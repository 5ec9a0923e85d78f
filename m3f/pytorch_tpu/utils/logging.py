"""Metric-writer abstraction: CSV/JSONL always, TensorBoard when available.

Capability parity: the reference logs TensorBoard scalars through Lightning's
logger plus console tqdm (SURVEY.md §5 "Metrics / logging / observability",
reconstructed — reference mount empty). Rebuild design per SURVEY §5: a small
writer that always produces machine-readable CSV + JSONL and adds TensorBoard
summaries when a writer is importable (torch.utils.tensorboard ships with the
baked-in torch); nothing in the train loop depends on which sinks exist.
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Dict, Optional


class MetricWriter:
    """Append scalar metrics to JSONL + CSV (+ TensorBoard if available)."""

    def __init__(self, directory: str, name: str = "train",
                 tensorboard: bool = True):
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        self._jsonl = open(os.path.join(directory, f"{name}.jsonl"), "a")
        self._csv_path = os.path.join(directory, f"{name}.csv")
        self._csv_file = open(self._csv_path, "a", newline="")
        self._csv: Optional[csv.DictWriter] = None
        self._csv_fields: Optional[list] = None
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(os.path.join(directory, "tb"))
            except Exception:
                self._tb = None

    def write(self, step: int, metrics: Dict[str, float]):
        row = {"step": int(step), "time": time.time(),
               **{k: float(v) for k, v in metrics.items()}}
        self._jsonl.write(json.dumps(row) + "\n")
        self._jsonl.flush()
        if self._csv is None:
            self._csv_fields = list(row.keys())
            self._csv = csv.DictWriter(self._csv_file, fieldnames=self._csv_fields,
                                       extrasaction="ignore")
            if os.path.getsize(self._csv_path) == 0:
                self._csv.writeheader()
        self._csv.writerow({k: row.get(k, "") for k in self._csv_fields})
        self._csv_file.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), int(step))

    def close(self):
        self._jsonl.close()
        self._csv_file.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
