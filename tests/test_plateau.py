"""optim.schedule="plateau" — ReduceLROnPlateau, TPU-native (round 4).

torch/Lightning users drive ReduceLROnPlateau off the val metric
(reference C8 family idiom). Here the multiplier is a replicated fp32
scalar in TrainState post-scaling the optimizer update inside the ONE
jitted train step (no recompile on decay); fit() decides decays at eval
boundaries. Asserted:

1. lr_mult=m is exactly a learning rate of lr*m for adam (one step);
2. fit() decays with torch ReduceLROnPlateau patience semantics (IGNORE
   `plateau_patience` bad evals, decay on the next one — num_bad > patience),
   respects the min-scale floor, and does NOT decay while improving;
3. the multiplier round-trips the checkpoint (resume-exact decays);
4. plateau knobs are hash-neutral unless the schedule is "plateau";
5. unknown schedules fail loudly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from m3f.pytorch_tpu.config import (AudioNetConfig, ExperimentConfig,
                                    GRUConfig, MeshConfig, ModelConfig,
                                    OptimConfig, TrainConfig, WindowConfig)
from m3f.pytorch_tpu.data.windowing import samples_per_window
from m3f.pytorch_tpu.parallel.mesh import shard_batch
from m3f.pytorch_tpu.train.loop import Trainer, make_optimizer


def make_cfg(num_steps=8, **optim_kw) -> ExperimentConfig:
    return ExperimentConfig(
        name="plateau",
        model=ModelConfig(
            use_audio=True, use_video=False,
            audio=AudioNetConfig(channels=(4, 8), feature_dim=8),
            gru=GRUConfig(hidden_size=8),
        ),
        window=WindowConfig(windows_per_clip=2),
        train=TrainConfig(batch_size=2, num_steps=num_steps, log_every=100,
                          eval_every=2, mesh=MeshConfig(num_data=1),
                          optim=OptimConfig(**{"learning_rate": 1e-2,
                                               **optim_kw})),
    )


def make_batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    B, W = cfg.train.batch_size, cfg.window.windows_per_clip
    L = cfg.model.frames_per_window
    spw = samples_per_window(cfg.model.mel,
                             cfg.model.audio.mel_frames_per_window)
    return {
        "wav": rng.randn(B, W, spw).astype(np.float32),
        "labels": rng.uniform(-1, 1, (B, W, L, 2)).astype(np.float32),
        "mask": np.ones((B, W, L), dtype=bool),
    }


def _leaves(params):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(
        jax.device_get(params))]


def test_lr_mult_is_exactly_a_learning_rate():
    # plateau run with lr_mult manually set to 0.5 == constant run at lr/2
    cfg_p = make_cfg(schedule="plateau")
    tr = Trainer(cfg_p)
    state = tr.init_state(seed=0)
    assert float(state.lr_mult) == 1.0
    state = state._replace(lr_mult=jnp.float32(0.5))
    step = tr.make_train_step()
    batch = make_batch(cfg_p)
    state, _ = step(state, shard_batch(tr.mesh, batch))

    cfg_h = make_cfg(learning_rate=5e-3)
    tr_h = Trainer(cfg_h)
    state_h = tr_h.init_state(seed=0)
    step_h = tr_h.make_train_step()
    state_h, _ = step_h(state_h, shard_batch(tr_h.mesh, batch))

    for a, b in zip(_leaves(state.params), _leaves(state_h.params)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def _fit_with_metrics(metrics, **optim_kw):
    """Run fit() with Trainer.evaluate stubbed to yield `metrics` in order;
    returns the final state (so tests steer the plateau tracker exactly)."""
    from m3f.pytorch_tpu.data.synthetic import SyntheticAVDataset
    cfg = make_cfg(num_steps=2 * len(metrics), schedule="plateau",
                   **optim_kw)
    tr = Trainer(cfg)
    it = iter(metrics)

    def fake_evaluate(state, dataset, **kw):
        m = next(it)
        return {"ccc_v": m, "ccc_a": m, "ccc_mean": m,
                "pooled_ccc_v": m, "pooled_ccc_a": m, "pooled_ccc_mean": m,
                "ccc_select": m}

    tr.evaluate = fake_evaluate
    batch = make_batch(cfg)

    def stream(skip=0):
        while True:
            yield batch

    state, _ = tr.fit(stream, val_dataset=object(), log=lambda s: None)
    return state


def test_fit_decays_after_patience_and_respects_floor():
    # improving run: no decay
    state = _fit_with_metrics([0.1, 0.2, 0.3], plateau_patience=1)
    assert float(state.lr_mult) == 1.0
    # torch semantics: patience=2 IGNORES 2 bad evals — a flat run with
    # only 2 bad evals after the first must NOT decay...
    state = _fit_with_metrics([0.3, 0.3, 0.3], plateau_patience=2,
                              plateau_factor=0.5)
    assert float(state.lr_mult) == 1.0
    # ...and decays exactly once on the 3rd consecutive bad eval
    state = _fit_with_metrics([0.3, 0.3, 0.3, 0.3], plateau_patience=2,
                              plateau_factor=0.5)
    assert float(state.lr_mult) == pytest.approx(0.5)
    # patience=1, evals 2-4 bad: decay at eval 3 (2nd bad), window restarts,
    # eval 4 is only 1 bad again -> one decay total
    state = _fit_with_metrics([0.3, 0.2, 0.1, 0.0], plateau_patience=1,
                              plateau_factor=0.1, plateau_min_scale=1e-2)
    assert float(state.lr_mult) == pytest.approx(0.1)
    # patience=0 (torch-legal): decay on EVERY bad eval, clamped at floor
    state = _fit_with_metrics([0.3, 0.2, 0.1, 0.0], plateau_patience=0,
                              plateau_factor=0.1, plateau_min_scale=1e-2)
    assert float(state.lr_mult) == pytest.approx(1e-2)


def test_lr_mult_checkpoint_roundtrip(tmp_path):
    from m3f.pytorch_tpu.train.checkpoint import Checkpointer, load_pytree
    cfg = make_cfg(schedule="plateau")
    tr = Trainer(cfg)
    state = tr.init_state(seed=0)
    state = state._replace(lr_mult=jnp.float32(0.25))
    step = tr.make_train_step()
    state, _ = step(state, shard_batch(tr.mesh, make_batch(cfg)))
    ck = Checkpointer(str(tmp_path), keep=1, cfg=cfg)
    path = ck.save(state)
    restored = load_pytree(tr.init_state(seed=1), path)
    assert float(restored.lr_mult) == pytest.approx(0.25)
    for a, b in zip(_leaves(state.params), _leaves(restored.params)):
        np.testing.assert_array_equal(a, b)


def test_plateau_knobs_hash_neutral_unless_active():
    base = make_cfg().config_hash()
    assert make_cfg(plateau_factor=0.5).config_hash() == base
    p = make_cfg(schedule="plateau").config_hash()
    assert p != base
    assert make_cfg(schedule="plateau",
                    plateau_factor=0.5).config_hash() != p


def test_unknown_schedule_fails_loudly():
    with pytest.raises(ValueError, match="unknown optim.schedule"):
        make_optimizer(OptimConfig(schedule="linear"), num_steps=10)
