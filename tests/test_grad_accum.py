"""Gradient accumulation (optax.MultiSteps wiring, SURVEY §2.3).

VERDICT r1 weak #6: `OptimConfig.accumulate_steps` had zero tests. Properties
asserted here:

1. params do NOT move on a non-boundary mini step, and DO move on the k-th;
2. feeding the SAME batch k times under accumulate_steps=k produces exactly
   the update of ONE plain step on that batch (train-mode BN uses batch
   statistics, so the k mini-step gradients are identical and their average
   equals the single-step gradient).
"""

import numpy as np
import jax

from m3f.pytorch_tpu.config import (AudioNetConfig, ExperimentConfig,
                                    GRUConfig, MeshConfig, ModelConfig,
                                    OptimConfig, TrainConfig, WindowConfig)
from m3f.pytorch_tpu.data.windowing import samples_per_window
from m3f.pytorch_tpu.parallel.mesh import shard_batch
from m3f.pytorch_tpu.train.loop import Trainer


def cfg_with_accum(k: int) -> ExperimentConfig:
    return ExperimentConfig(
        name="accum",
        model=ModelConfig(
            use_audio=True, use_video=False,
            audio=AudioNetConfig(channels=(4, 8), feature_dim=8),
            gru=GRUConfig(hidden_size=8),
        ),
        window=WindowConfig(windows_per_clip=2),
        train=TrainConfig(batch_size=2, mesh=MeshConfig(num_data=1),
                          optim=OptimConfig(learning_rate=1e-2,
                                            accumulate_steps=k)),
    )


def make_batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    W = cfg.window.windows_per_clip
    L = cfg.model.frames_per_window
    spw = samples_per_window(cfg.model.mel, cfg.model.audio.mel_frames_per_window)
    return {
        "wav": rng.randn(2, W, spw).astype(np.float32),
        "labels": rng.uniform(-1, 1, (2, W, L, 2)).astype(np.float32),
        "mask": np.ones((2, W, L), dtype=bool),
    }


def _leaves(params):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(params)]


def test_params_move_only_on_accumulation_boundary():
    cfg = cfg_with_accum(3)
    tr = Trainer(cfg)
    state = tr.init_state(seed=0)
    step = tr.make_train_step()
    p0 = _leaves(jax.device_get(state.params))
    batch = make_batch(cfg)

    state, _ = step(state, shard_batch(tr.mesh, batch))
    p1 = _leaves(jax.device_get(state.params))
    for a, b in zip(p0, p1):
        np.testing.assert_array_equal(a, b)  # mini step 1: no update

    state, _ = step(state, shard_batch(tr.mesh, batch))
    p2 = _leaves(jax.device_get(state.params))
    for a, b in zip(p0, p2):
        np.testing.assert_array_equal(a, b)  # mini step 2: still no update

    state, _ = step(state, shard_batch(tr.mesh, batch))
    p3 = _leaves(jax.device_get(state.params))
    moved = any(not np.array_equal(a, b) for a, b in zip(p0, p3))
    assert moved, "params did not update on the accumulation boundary"
    assert int(state.step) == 3  # step counts mini-steps


def test_accumulated_equals_single_step_on_same_batch():
    batch = make_batch(cfg_with_accum(1))

    tr1 = Trainer(cfg_with_accum(1))
    s1 = tr1.init_state(seed=0)
    s1, m1 = tr1.make_train_step()(s1, shard_batch(tr1.mesh, batch))

    trk = Trainer(cfg_with_accum(2))
    sk = trk.init_state(seed=0)
    stepk = trk.make_train_step()
    for _ in range(2):
        sk, mk = stepk(sk, shard_batch(trk.mesh, batch))

    for a, b in zip(_leaves(jax.device_get(s1.params)),
                    _leaves(jax.device_get(sk.params))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    # the loss metric on every mini step is the true mini-batch loss
    assert abs(float(m1["loss"]) - float(mk["loss"])) < 1e-5
