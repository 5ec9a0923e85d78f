"""Audio branch: 2D CNN over log-mel windows.

Capability parity: reference ``models/audio.py`` — "audio CNN branch" over
log-mel patches (SURVEY.md §2.1 C5; reconstructed, reference mount empty).

TPU design: NHWC layout ([B, mel_frames, n_mels, 1]); stride-2 stages keep
channel counts MXU-aligned; BN+ReLU fuse into the convs under XLA. Output is
one ``feature_dim`` vector per 16-frame window.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from m3f.pytorch_tpu.config import AudioNetConfig
from m3f.pytorch_tpu.nn import (BatchNorm, Conv, Dense, Params, State,
                                global_avg_pool, relu)


@dataclass(frozen=True)
class AudioCNN:
    cfg: AudioNetConfig

    def _layers(self):
        convs, bns = [], []
        in_c = 1
        for out_c in self.cfg.channels:
            # explicit (1,1) padding — torch semantics; "SAME" pads
            # asymmetrically under stride 2 and breaks checkpoint parity
            convs.append(Conv(in_c, out_c, (3, 3), strides=(2, 2), padding=1))
            bns.append(BatchNorm(out_c, two_pass=self.cfg.bn_two_pass))
            in_c = out_c
        return convs, bns, Dense(in_c, self.cfg.feature_dim)

    def init(self, key) -> Tuple[Params, State]:
        convs, bns, head = self._layers()
        keys = jax.random.split(key, len(convs) + 1)
        params = {"conv": [], "bn": [], "head": head.init(keys[-1])}
        state = {"bn": []}
        for i, (c, b) in enumerate(zip(convs, bns)):
            params["conv"].append(c.init(keys[i]))
            bp, bs = b.init(None)
            params["bn"].append(bp)
            state["bn"].append(bs)
        return params, state

    def apply(self, params: Params, state: State, mel: jnp.ndarray,
              train: bool = False, per_frame: bool = False) -> Tuple[jnp.ndarray, State]:
        """mel: [B, mel_frames, n_mels] log-mel window → [B, feature_dim].

        ``per_frame=True`` pools only the MEL axis, keeping the (downsampled)
        temporal axis: [B, F', feature_dim] with F' = mel_frames / 2^len(channels).
        The Dense head applies per timestep (same weights as the pooled mode).
        """
        convs, bns, head = self._layers()
        x = mel[..., None]  # NHWC with C=1
        new_bn = []
        for c, b, cp, bp, bs in zip(convs, bns, params["conv"], params["bn"], state["bn"]):
            x = c.apply(cp, x)
            x, ns = b.apply(bp, bs, x, train)
            new_bn.append(ns)
            x = relu(x)
        if per_frame:
            feat = jnp.mean(x, axis=2)               # [B, F', C_last]
        else:
            feat = global_avg_pool(x)                # [B, C_last]
        feat = head.apply(params["head"], feat)      # [..., feature_dim]
        return feat, {"bn": new_bn}
