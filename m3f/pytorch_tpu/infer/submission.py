"""ABAW challenge submission writer.

Capability parity: reference C11 — "per-video ``.txt`` of per-frame V/A for
the ABAW test server" over smoothed/clipped/interpolated predictions
(SURVEY.md §2.1 C11, §1 L6; reconstructed — reference mount empty).

Postprocess chain (reference semantics, SURVEY §3.3):
  stitched per-frame preds → optional moving-average smoothing →
  interpolate frames with no valid prediction → clip to [-1, 1] →
  one txt per video: header line then "v,a" per frame.

ABAW-SERVER FORMAT ASSUMPTION SHEET (VERDICT r3 missing #4). The exact
server contract is unverifiable in this environment (reference mount empty,
no network); every assumption below is [UNVERIFIED] and centralized HERE so
a first real submission is a five-minute diff, not archaeology:

  A1 header      — exactly ``valence,arousal`` (lowercase, comma, no
                   spaces), one line, ``\n`` line endings throughout.
  A2 rounding    — 6 decimal places, fixed-point (``f"{x:.6f}"``). The
                   organizers' examples show varying precision; anything
                   within float32 print precision is assumed accepted.
  A3 row count   — one row per CONTAINER frame (annotation row count on
                   train/val; for test videos, max crop stem or the raw
                   container's frame count when ``videos/`` exists —
                   data/affwild2.py _test_frame_count). A crop dir shorter
                   than the container must NOT shorten the file.
  A4 invalid     — frames with no valid prediction (missing crop, -5 row)
                   still get a row: linearly interpolated from neighboring
                   valid frames, edges extended (ops/stitch.py
                   interpolate_gaps); never a sentinel like -5.
  A5 range       — values clipped to [-1, 1] inclusive; the server is
                   assumed to reject values outside it.
  A6 layout      — one ``<video_id>.txt`` per video, flat directory; ids
                   exactly as the annotation/crop-dir stems (including
                   ``_left``/``_right`` suffixes for two-face videos).
  A7 no index    — rows carry no frame number/timestamp column.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from m3f.pytorch_tpu.ops.stitch import clip_predictions, interpolate_gaps


def smooth_predictions(preds: np.ndarray, window: int = 1) -> np.ndarray:
    """Centered moving-average over the frame axis (window=1 → identity)."""
    if window <= 1:
        return preds
    k = np.ones(window, np.float32) / window
    pad = window // 2
    out = np.empty_like(preds, dtype=np.float32)
    for c in range(preds.shape[1]):
        x = np.pad(preds[:, c], pad, mode="edge")
        out[:, c] = np.convolve(x, k, mode="valid")[: len(preds)]
    return out


def postprocess(preds: np.ndarray, valid: Optional[np.ndarray] = None,
                smooth_window: int = 1) -> np.ndarray:
    """Full reference postprocess: smooth → interpolate gaps → clip."""
    preds = np.asarray(preds, np.float32)
    preds = smooth_predictions(preds, smooth_window)
    if valid is not None:
        preds = interpolate_gaps(preds, valid)
    return clip_predictions(preds)


def write_video_txt(path: str, preds: np.ndarray):
    """One ABAW VA submission file: 'valence,arousal' header + row per frame."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("valence,arousal\n")
        for v, a in preds:
            f.write(f"{v:.6f},{a:.6f}\n")


def write_submission(out_dir: str, per_video_preds: Dict[str, np.ndarray],
                     per_video_valid: Optional[Dict[str, np.ndarray]] = None,
                     smooth_window: int = 1):
    """Write one txt per video into ``out_dir`` (ABAW server layout)."""
    for vid, preds in per_video_preds.items():
        valid = per_video_valid.get(vid) if per_video_valid else None
        write_video_txt(os.path.join(out_dir, vid + ".txt"),
                        postprocess(preds, valid, smooth_window))
