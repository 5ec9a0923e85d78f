"""On-device train augmentation (ops/augment.py): determinism, temporal
consistency, flip correctness, and train-step integration."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from m3f.pytorch_tpu.config import (AudioNetConfig, DataConfig,
                                    ExperimentConfig, GRUConfig, MeshConfig,
                                    ModelConfig, TrainConfig, VisualNetConfig,
                                    WindowConfig)
from m3f.pytorch_tpu.data.windowing import samples_per_window
from m3f.pytorch_tpu.ops.augment import augment_clips
from m3f.pytorch_tpu.parallel.mesh import shard_batch
from m3f.pytorch_tpu.train.loop import Trainer


def _video(b=3, w=2, l=4, s=8, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randint(0, 256, (b, w, l, s, s, 3), np.uint8))


def test_deterministic_and_range():
    v = _video()
    k = jax.random.PRNGKey(7)
    a1 = augment_clips(k, v, compute_dtype=jnp.float32)
    a2 = augment_clips(k, v, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert float(a1.min()) >= 0.0 and float(a1.max()) <= 1.0
    # a different key gives a different batch
    a3 = augment_clips(jax.random.PRNGKey(8), v, compute_dtype=jnp.float32)
    assert not np.array_equal(np.asarray(a1), np.asarray(a3))


def test_flip_only_is_exact_mirror_per_example():
    v = _video()
    k = jax.random.PRNGKey(0)
    out = np.asarray(augment_clips(k, v, flip_prob=0.5, brightness=0.0,
                                   contrast=0.0, compute_dtype=jnp.float32))
    plain = np.asarray(v).astype(np.float32) / 255.0
    for i in range(v.shape[0]):
        same = np.array_equal(out[i], plain[i])
        mirrored = np.array_equal(out[i], plain[i][..., ::-1, :])
        assert same or mirrored          # whole example flipped or not
        # temporal consistency: every window/frame made the same choice
        if mirrored and not same:
            assert not np.array_equal(out[i, 0, 0], plain[i, 0, 0])


def test_flip_prob_extremes():
    v = _video()
    plain = np.asarray(v).astype(np.float32) / 255.0
    never = augment_clips(jax.random.PRNGKey(1), v, flip_prob=0.0,
                          brightness=0.0, contrast=0.0,
                          compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(never), plain)
    always = augment_clips(jax.random.PRNGKey(1), v, flip_prob=1.0,
                           brightness=0.0, contrast=0.0,
                           compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(always), plain[..., ::-1, :])


def test_train_step_with_augmentation_runs_and_differs():
    cfg = ExperimentConfig(
        name="aug",
        model=ModelConfig(
            use_audio=False, use_video=True,
            visual=VisualNetConfig(block_channels=(4, 8), blocks_per_stage=(1, 1),
                                   stem_channels=4, feature_dim=8),
            audio=AudioNetConfig(channels=(4,), feature_dim=4),
            gru=GRUConfig(hidden_size=8)),
        window=WindowConfig(windows_per_clip=2),
        data=DataConfig(augment=True, image_size=16),
        train=TrainConfig(batch_size=2, mesh=MeshConfig(num_data=1)),
    )
    tr = Trainer(cfg)
    state = tr.init_state(seed=0)
    step = tr.make_train_step()
    rng = np.random.RandomState(0)
    W, L = 2, cfg.window.window_frames
    batch = {
        "video": rng.randint(0, 256, (2, W, L, 16, 16, 3)).astype(np.uint8),
        "labels": rng.uniform(-1, 1, (2, W, L, 2)).astype(np.float32),
        "mask": np.ones((2, W, L), bool),
    }
    s1, m1 = step(state, shard_batch(tr.mesh, batch))
    assert np.isfinite(float(m1["loss"]))
    # same data, augmentation OFF → different loss (jitter applied)
    cfg_off = cfg.replace(data=dataclasses.replace(cfg.data, augment=False))
    tr2 = Trainer(cfg_off)
    s2, m2 = tr2.make_train_step()(tr2.init_state(seed=0),
                                   shard_batch(tr2.mesh, batch))
    assert float(m1["loss"]) != float(m2["loss"])
