"""M3F: late-fusion audio-visual valence-arousal model.

Capability parity: reference ``models/m3f.py`` / ``audiovisual.py`` —
"concat audio‖video per-window features → bidirectional GRU over window
sequence → FC → tanh → (valence, arousal)" (SURVEY.md §2.1 C6, §3.4;
BASELINE.json "late-fusion concat", "BiGRU temporal fusion head").

The model consumes a *sequence of W windows* per example:

    video: [B, W, L=16, 112, 112, 3]   (uint8 or float, NDHWC per window)
    mel:   [B, W, F, n_mels]           (log-mel slice aligned to each window)
    →      [B, W, L, 2]  per_frame=True (default): per-FRAME (valence, arousal)
           [B, W, 2]     per_frame=False: one prediction per window

In per-frame mode (the reference's granularity — it trains on per-frame [T,2]
labels, SURVEY §1 L2 / §2.1 C9) each branch keeps its temporal axis (visual:
spatial-only pool → [·, T', C]; audio: mel-axis-only pool → [·, F', C]),
features are nearest-upsampled to L frames per window, and the BiGRU runs over
the W·L frame sequence. No parameter shapes differ between the modes.

Branch backbones run on the flattened [B·W] window batch — one big MXU-friendly
batch instead of a Python loop — then the BiGRU runs over the W axis.

Audio-only / visual-only ablations (BASELINE configs 1-2) are the same module
with a branch disabled.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from m3f.pytorch_tpu.config import ModelConfig
from m3f.pytorch_tpu.models.audio import AudioCNN
from m3f.pytorch_tpu.models.gru import BiGRU
from m3f.pytorch_tpu.models.r2plus1d import R2Plus1D
from m3f.pytorch_tpu.nn import Dense, Params, State


def _dropout(key, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Inverted dropout (torch semantics: scale kept units by 1/(1-p))."""
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def _upsample_nearest(x: jnp.ndarray, length: int) -> jnp.ndarray:
    """Nearest-neighbor upsample [B, T', C] → [B, length, C].

    idx[l] = ⌊l·T'/length⌋ — equals ``repeat_interleave`` when T' | length
    (the torch golden mirrors this exact formula, tests/torch_golden.py).
    """
    tp = x.shape[1]
    if tp == length:
        return x
    idx = (jnp.arange(length) * tp) // length
    return jnp.take(x, idx, axis=1)


@dataclass(frozen=True)
class M3F:
    cfg: ModelConfig

    def _parts(self):
        audio = AudioCNN(self.cfg.audio) if self.cfg.use_audio else None
        visual = R2Plus1D(self.cfg.visual) if self.cfg.use_video else None
        gru = BiGRU(self.cfg.fused_dim, self.cfg.gru.hidden_size,
                    self.cfg.gru.num_layers,
                    backend=self.cfg.gru.backend,
                    bidirectional=self.cfg.gru.bidirectional)
        head_in = (2 if self.cfg.gru.bidirectional else 1) * self.cfg.gru.hidden_size
        head = Dense(head_in, self.cfg.num_outputs)
        return audio, visual, gru, head

    def init(self, key) -> Tuple[Params, State]:
        ka, kv, kg, kh = jax.random.split(key, 4)
        audio, visual, gru, head = self._parts()
        params: Params = {}
        state: State = {}
        if audio is not None:
            params["audio"], state["audio"] = audio.init(ka)
        if visual is not None:
            params["visual"], state["visual"] = visual.init(kv)
        params["gru"] = gru.init(kg)
        params["head"] = head.init(kh)
        return params, state

    def apply(self, params: Params, state: State,
              video: Optional[jnp.ndarray] = None,
              mel: Optional[jnp.ndarray] = None,
              wav: Optional[jnp.ndarray] = None,
              hop: Optional[jnp.ndarray] = None,
              train: bool = False,
              rng: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, State]:
        audio, visual, gru, head = self._parts()
        if audio is not None and mel is None and wav is not None:
            # fused on-device frontend — raw [B, W, samples] waveform slices
            # become [B, W, F, n_mels] log-mels inside the same jit region.
            # ``hop``: traced per-example mel hop (int32, broadcastable over
            # wav's leading dims) for the per-video audio time base; the wav
            # buffer is then max-hop-sized (samples_per_window_max) and ONE
            # compiled program covers every frame rate.
            if self.cfg.mel_backend == "pallas":
                if hop is not None:
                    raise NotImplementedError(
                        "mel_backend='pallas' does not support the per-video "
                        "dynamic hop (its framing is compile-time strided) — "
                        "use mel_backend='xla' for hop-aware runs")
                from m3f.pytorch_tpu.ops.pallas.melspec_pallas import \
                    log_mel_spectrogram_pallas
                mel = log_mel_spectrogram_pallas(wav, self.cfg.mel,
                                                 out_dtype=self._cdtype())
            else:
                from m3f.pytorch_tpu.ops.melspec import log_mel_spectrogram
                mel = log_mel_spectrogram(
                    wav, self.cfg.mel, out_dtype=self._cdtype(), hop=hop,
                    n_frames_out=(self.cfg.audio.mel_frames_per_window
                                  if hop is not None else None))
        per_frame = self.cfg.per_frame
        # L = output frames per window (per-frame mode). With video present it
        # is pinned by the input; audio-only takes it from config.
        if per_frame:
            L = video.shape[2] if video is not None else self.cfg.frames_per_window
        feats = []
        new_state: State = {}
        if visual is not None:
            assert video is not None, "model configured with use_video=True"
            b, w = video.shape[:2]
            flat = video.reshape((b * w,) + video.shape[2:])
            if flat.dtype == jnp.uint8:
                flat = flat.astype(self._cdtype()) / 255.0
            else:
                flat = flat.astype(self._cdtype())
            vfeat, new_state["visual"] = visual.apply(
                params["visual"], state["visual"], flat, train,
                per_frame=per_frame)
            if per_frame:
                # [B·W, T', C] → nearest-upsample to [B·W, L, C] → [B, W·L, C]
                vfeat = _upsample_nearest(vfeat, L)
                feats.append(vfeat.reshape(b, w * L, -1))
            else:
                feats.append(vfeat.reshape(b, w, -1))
        if audio is not None:
            assert mel is not None, "model configured with use_audio=True"
            b, w = mel.shape[:2]
            flat = mel.reshape((b * w,) + mel.shape[2:]).astype(self._cdtype())
            afeat, new_state["audio"] = audio.apply(
                params["audio"], state["audio"], flat, train,
                per_frame=per_frame)
            if per_frame:
                afeat = _upsample_nearest(afeat, L)
                feats.append(afeat.reshape(b, w * L, -1))
            else:
                feats.append(afeat.reshape(b, w, -1))
        fused = jnp.concatenate(feats, axis=-1)  # [B, W(*L), Dv+Da]
        drop = train and self.cfg.dropout > 0.0
        if drop:
            # dropout on fused features (pre-GRU) and GRU output (pre-head)
            assert rng is not None, \
                "model.dropout > 0 needs an rng in train mode"
            k1, k2 = jax.random.split(rng)
            fused = _dropout(k1, fused, self.cfg.dropout)
        seq = gru.apply(params["gru"], fused)    # [B, W(*L), 2H]
        if drop:
            seq = _dropout(k2, seq, self.cfg.dropout)
        out = head.apply(params["head"], seq.astype(jnp.float32))
        if self.cfg.head_activation == "tanh":
            out = jnp.tanh(out)
        if per_frame:
            # [B, W·L, 2] → [B, W, L, 2] per-frame predictions
            out = out.reshape(out.shape[0], -1, L, out.shape[-1])
        return out, new_state

    def _cdtype(self):
        return jnp.dtype(self.cfg.compute_dtype)
