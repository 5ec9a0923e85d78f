"""On-device training augmentation for face-crop clips.

The reference repo family augments clips on the host inside DataLoader
workers (random horizontal flip + photometric jitter — UNVERIFIED vs
reference, standard for this task). TPU-first redesign: augmentation runs
INSIDE the jitted train step on the uint8 batch the host already shipped —
zero extra host work, zero extra H2D bytes, fused with the uint8→bf16
normalize that follows it.

Randomness: the caller derives one key per step (``fold_in(seed, step)``),
so augmentation is deterministic given (seed, step) — reproducible runs and
bitwise-identical multi-host behavior over the global batch.

Decisions are per-EXAMPLE and shared by all windows/frames of the example
(temporal consistency: flipping or brightening only some frames of a clip
would destroy the motion/identity signal).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def augment_clips(key: jax.Array, video: jnp.ndarray, *,
                  flip_prob: float = 0.5,
                  brightness: float = 0.1,
                  contrast: float = 0.1,
                  compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """video [B, W, L, H, W', 3] uint8 (or float in [0,1]) → float in [0,1].

    Per example: horizontal flip with ``flip_prob``; pixel scale
    U(1−contrast, 1+contrast); pixel shift U(−brightness, +brightness);
    clipped back to [0, 1]. Returns the compute dtype — the model skips its
    own uint8 conversion for float input.
    """
    b = video.shape[0]
    kf, kb, kc = jax.random.split(key, 3)
    v = video.astype(compute_dtype)
    if video.dtype == jnp.uint8:
        v = v / 255.0
    flip = jax.random.bernoulli(kf, flip_prob, (b,))
    expand = (slice(None),) + (None,) * (video.ndim - 1)
    v = jnp.where(flip[expand], v[..., ::-1, :], v)
    if contrast:
        scale = jax.random.uniform(kc, (b,), jnp.float32,
                                   1.0 - contrast, 1.0 + contrast)
        v = v * scale[expand].astype(compute_dtype)
    if brightness:
        shift = jax.random.uniform(kb, (b,), jnp.float32,
                                   -brightness, brightness)
        v = v + shift[expand].astype(compute_dtype)
    return jnp.clip(v, 0.0, 1.0)
