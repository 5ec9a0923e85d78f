"""Production inference API: per-frame valence/arousal for raw videos.

The reference has no serving story — inference is a Lightning ``test`` pass
over a dataset directory (SURVEY §2.1 C9/C11).  This wraps the same fused
whole-video eval path (on-device windowing → forward → per-frame stitch →
clip, ONE jit call per video, shape-bucketed compiles) behind an API a
service can hold long-lived:

    p = Predictor(checkpoint="run/ckpt_00001000.npz")   # or imported torch npz
    out = p.predict_video(frames=jpegs_uint8, waveform=wav16k)
    out["pred"]   # [N, 2] float32 in [-1, 1], one (valence, arousal) per frame

Labels are not required: the eval graph's CCC inputs are fed an all-invalid
mask, the masked statistics guard to 0, and only the stitched predictions are
consumed.  Several videos can be kept in flight (``predict_many``) so the
next video's decode + H2D overlaps the current one's compute — the same
pipelining the CLI ``predict`` subcommand uses.
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, Optional, Tuple

import numpy as np

from m3f.pytorch_tpu.config import ExperimentConfig, PRESETS, apply_overrides
from m3f.pytorch_tpu.infer.submission import postprocess


class Predictor:
    def __init__(self, cfg: Optional[ExperimentConfig] = None,
                 checkpoint: str = "", preset: str = "longseq_eval",
                 overrides: Optional[dict] = None):
        # serving processes construct Predictor directly (no CLI entry), so
        # enable the persistent compile cache here — warmup's "cheap after
        # the first process" depends on it
        from m3f.pytorch_tpu.cache import enable_persistent_cache
        enable_persistent_cache()
        from m3f.pytorch_tpu.train.loop import Trainer

        if cfg is None:
            cfg = PRESETS[preset]()
            if overrides:
                cfg = apply_overrides(cfg, overrides)
        self.cfg = cfg
        self.trainer = Trainer(cfg)
        self.state = self.trainer.init_state()
        if checkpoint:
            from m3f.pytorch_tpu.train.checkpoint import load_model_checkpoint
            self.state = load_model_checkpoint(self.state, checkpoint)

    def warmup(self, max_frames: int = 1024) -> None:
        """Pre-compile the eval graph for videos up to ``max_frames``.

        The whole-video eval buckets shapes (frame count to 256s, window
        count to the mesh-aligned bucket), so one warmup call per bucket
        removes the multi-second first-request compile from serving paths.
        Compiles are persisted by the XLA cache, so this is cheap after the
        first process.
        """
        sr, fps = self.cfg.model.mel.sample_rate, self.cfg.data.fps
        for n in range(256, max_frames + 1, 256):
            kw = {}
            if self.cfg.model.use_video:
                S = self.cfg.data.image_size
                kw["frames"] = np.zeros((n, S, S, 3), np.uint8)
            if self.cfg.model.use_audio:
                # exactly n frames' worth: for audio-only models the frame
                # count derives from the waveform length, and extra headroom
                # would land in the NEXT bucket, leaving this one cold
                # (_dispatch_eval pads the tail host-side anyway)
                kw["waveform"] = np.zeros(int(round(n / fps * sr)), np.float32)
            self.predict_video(**kw)

    # -- single video -------------------------------------------------------

    def _video_dict(self, frames: Optional[np.ndarray],
                    waveform: Optional[np.ndarray]) -> Dict[str, np.ndarray]:
        mcfg = self.cfg.model
        if mcfg.use_video:
            assert frames is not None, "model uses video; pass frames [N,S,S,3] uint8"
            n = len(frames)
        else:
            assert waveform is not None, "audio-only model; pass waveform"
            n = int(round(len(waveform) / mcfg.mel.sample_rate * self.cfg.data.fps))
            n = max(n, 1)
        if mcfg.use_audio:
            assert waveform is not None, "model uses audio; pass 16 kHz waveform"
        video = {
            # no labels at inference: all-invalid so the graph's CCC inputs
            # are inert (masked statistics guard to 0)
            "labels": np.full((n, 2), -5.0, np.float32),
            "valid": np.zeros(n, bool),
        }
        if frames is not None:
            video["frames"] = np.ascontiguousarray(frames, dtype=np.uint8)
        if waveform is not None:
            video["waveform"] = np.asarray(waveform, np.float32)
        return video

    def predict_video(self, frames: Optional[np.ndarray] = None,
                      waveform: Optional[np.ndarray] = None,
                      smooth_window: int = 0) -> Dict[str, np.ndarray]:
        """Per-frame predictions for one video.

        frames: [N, S, S, 3] uint8 face crops (S = cfg.data.image_size);
        waveform: mono float32 at cfg.model.mel.sample_rate.
        Returns {"pred": [N, 2] float32 in [-1, 1]}.
        """
        out = self.trainer.evaluate_video(
            self.state, self._video_dict(frames, waveform))
        return {"pred": postprocess(out["pred"], smooth_window=smooth_window)}

    # -- pipelined stream ----------------------------------------------------

    def predict_many(self, videos: Iterable[Tuple[str, Dict[str, np.ndarray]]],
                     smooth_window: int = 0, pipeline: int = 2
                     ) -> Iterator[Tuple[str, np.ndarray]]:
        """Pipelined inference over (video_id, {frames, waveform}) pairs.

        Keeps ``pipeline`` videos in flight: the next video's H2D transfer
        overlaps the current video's device compute. Yields
        (video_id, preds [N, 2]) in input order.
        """
        prepared = ((vid, self._video_dict(v.get("frames"), v.get("waveform")))
                    for vid, v in videos)
        for vid, r in self.trainer.evaluate_stream(self.state, prepared,
                                                   pipeline=pipeline):
            yield vid, postprocess(r["pred"], smooth_window=smooth_window)
