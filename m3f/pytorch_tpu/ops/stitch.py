"""Sliding-window enumeration and on-device overlap stitching.

Capability parity: reference full-video eval — "enumerate overlapping 16-frame
windows (stride s<16), batch them … stitch: overlap-average window predictions
back onto the per-frame timeline; interpolate frames with no prediction; clip
to [-1,1]" (SURVEY.md §2.1 C9, §3.3; BASELINE.json config 4).  The reference
stitches host-side in numpy; here stitching is ON-DEVICE (BASELINE "on-device
overlap-add") so eval never round-trips per window-batch.

TPU design: instead of scatter-adds, the stitcher builds a dense coverage
matrix ``M[f, w] = 1`` iff window ``w`` covers frame ``f`` from two
``broadcasted_iota`` comparisons, and computes

    frame_pred = (M @ window_pred) / (M @ 1)

— one [N_frames, W] × [W, 2] MXU matmul with fully static shapes. N and W are
a few thousand at most, so the matrix is free compared to the model forward.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


def window_starts(num_frames: int, window: int, stride: int) -> np.ndarray:
    """Start indices covering every frame: [0, s, 2s, …] plus a tail window.

    For ``num_frames < window`` a single window at 0 is returned (the data
    pipeline pads short videos up to ``window``).
    """
    if stride > window:
        # [0, s, 2s, …] would leave frames (window, s) covered by NO window;
        # the stitchers' den>=1 guard would then silently emit 0.0 for them
        raise ValueError(
            f"eval stride {stride} > window {window} leaves uncovered frames")
    if num_frames <= window:
        return np.zeros(1, dtype=np.int32)
    starts = list(range(0, num_frames - window + 1, stride))
    if starts[-1] != num_frames - window:
        starts.append(num_frames - window)  # tail window, clamped
    return np.asarray(starts, dtype=np.int32)


def coverage_matrix(starts: jnp.ndarray, num_frames: int, window: int) -> jnp.ndarray:
    """[N, W] 0/1 matrix: frame f is covered by window w."""
    w = starts.shape[0]
    f_idx = jax.lax.broadcasted_iota(jnp.int32, (num_frames, w), 0)
    s = jnp.broadcast_to(starts[None, :], (num_frames, w))
    return ((f_idx >= s) & (f_idx < s + window)).astype(jnp.float32)


def stitch_overlap_average(window_preds: jnp.ndarray, starts: jnp.ndarray,
                           num_frames: int, window: int) -> jnp.ndarray:
    """Overlap-average per-window predictions onto the frame timeline.

    window_preds: [W, C] (one prediction per window) → [num_frames, C].
    Every frame is covered by ≥1 window by construction of `window_starts`.
    """
    m = coverage_matrix(starts, num_frames, window)           # [N, W]
    # precision pinned: under DEFAULT this backend lowers fp32 matmuls to a
    # single bf16 pass, which is not acceptable for eval predictions
    num = jnp.matmul(m, window_preds.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)     # [N, C]
    den = jnp.sum(m, axis=1, keepdims=True)                   # [N, 1]
    return num / jnp.maximum(den, 1.0)


def stitch_framewise(window_preds: jnp.ndarray, starts: jnp.ndarray,
                     num_frames: int,
                     win_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Overlap-average PER-FRAME window predictions onto the timeline.

    window_preds: [W, L, C] (a prediction for each frame of each window)
    → [num_frames, C].  ``win_valid`` ([W] bool/float) drops padding windows
    from both numerator and coverage count.

    TPU design: a flat segment-sum (``.at[idx].add``) over the W·L predicted
    frames — XLA lowers duplicate-index scatter-add natively.  The one-hot
    [F, W, L] matmul alternative costs F·W·L memory (~0.8 GB for a 10k-frame
    video at stride 8) where the scatter touches only W·L elements.
    """
    num, den = stitch_framewise_sums(window_preds, starts, num_frames,
                                     win_valid=win_valid)
    return num / jnp.maximum(den[:, None], 1.0)


def stitch_framewise_sums(window_preds: jnp.ndarray, starts: jnp.ndarray,
                          num_frames: int,
                          win_valid: Optional[jnp.ndarray] = None):
    """Un-normalized framewise stitch: (Σ preds, coverage count) per frame.

    The building block behind ``stitch_framewise``; exposed so CHUNKED
    whole-video eval (bounded window batches for arbitrarily long videos)
    can accumulate partial sums across chunk boundaries before dividing —
    summation is associative where the per-chunk average is not.
    """
    w, l, c = window_preds.shape
    idx = (starts[:, None] + jnp.arange(l)[None, :]).reshape(-1)   # [W·L]
    vals = window_preds.astype(jnp.float32)
    ones = jnp.ones((w, l), jnp.float32)
    if win_valid is not None:
        wv = win_valid.astype(jnp.float32)[:, None]
        vals = vals * wv[..., None]
        ones = ones * wv
    num = jnp.zeros((num_frames, c), jnp.float32).at[idx].add(
        vals.reshape(-1, c), mode="drop")
    den = jnp.zeros((num_frames,), jnp.float32).at[idx].add(
        ones.reshape(-1), mode="drop")
    return num, den


def smooth_moving_average(preds: jnp.ndarray, window: int) -> jnp.ndarray:
    """On-device centered moving average over the frame axis, [T, C] → [T, C].

    Exactly `infer/submission.py:smooth_predictions` (the reference's
    postprocess smoother: edge-padded, window//2 centering, truncated to T
    for even windows) so eval-time smoothing (`window.eval_smooth`) measures
    the same CCC the submission postprocess would produce. window<=1 is the
    identity. fp32 math regardless of input dtype.
    """
    if window <= 1:
        return preds
    T = preds.shape[0]
    pad = window // 2
    xp = jnp.pad(preds.astype(jnp.float32), ((pad, pad), (0, 0)), mode="edge")
    # direct windowed mean as a sum of shifted slices (window is small, and
    # unlike a cumsum-difference this has no long-T cancellation error):
    # out[t] = mean(xp[t : t+window])
    out = xp[0:T]
    for i in range(1, window):
        out = out + xp[i:i + T]
    return out / window


# ---------------------------------------------------------------------------
# Host-side postprocess (reference C9/C11 semantics: gap interpolation + clip)
# ---------------------------------------------------------------------------

def interpolate_gaps(preds: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Linearly interpolate prediction rows where ``valid`` is False.

    Host-side numpy postprocessing, as in the reference (frames whose face
    crop was missing get no direct prediction). Edge gaps take the nearest
    valid value.
    """
    preds = np.array(preds, dtype=np.float32, copy=True)
    valid = np.asarray(valid, dtype=bool)
    if valid.all():
        return preds
    if not valid.any():
        return np.zeros_like(preds)
    idx = np.arange(len(preds))
    for c in range(preds.shape[1]):
        preds[~valid, c] = np.interp(idx[~valid], idx[valid], preds[valid, c])
    return preds


def clip_predictions(preds: np.ndarray) -> np.ndarray:
    """Clip to the valid label range [-1, 1] (reference postprocess)."""
    return np.clip(preds, -1.0, 1.0)
