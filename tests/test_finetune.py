"""Fine-tuning controls: optim.freeze and optim.lr_scale (round 4).

The reference's fine-tuning workflow loads a pretrained backbone at model
__init__ (SURVEY §3.5) and torch users then freeze it or give it a smaller
per-group learning rate. Properties asserted here:

1. frozen subtrees stay BITWISE at init (weight decay included) while
   everything else trains;
2. lr_scale=f is exactly a per-group learning rate of lr*f for adam
   (post-optimizer update scaling; moments are lr-independent);
3. nested '/'-path prefixes address sub-subtrees (one GRU direction);
4. typo'd prefixes, overlapping scales, and malformed specs fail loudly;
5. freeze composes with gradient accumulation (mask inside MultiSteps);
6. setting either control changes the semantic config hash, leaving it
   byte-stable when both are unset (legacy checkpoints keep resuming).
"""

import numpy as np
import jax
import pytest

from m3f.pytorch_tpu.config import (AudioNetConfig, ExperimentConfig,
                                    GRUConfig, MeshConfig, ModelConfig,
                                    OptimConfig, TrainConfig, WindowConfig)
from m3f.pytorch_tpu.data.windowing import samples_per_window
from m3f.pytorch_tpu.parallel.mesh import shard_batch
from m3f.pytorch_tpu.train.loop import Trainer


def make_cfg(num_data=1, **optim_kw) -> ExperimentConfig:
    return ExperimentConfig(
        name="finetune",
        model=ModelConfig(
            use_audio=True, use_video=False,
            audio=AudioNetConfig(channels=(4, 8), feature_dim=8),
            gru=GRUConfig(hidden_size=8),
        ),
        window=WindowConfig(windows_per_clip=2),
        train=TrainConfig(batch_size=4, mesh=MeshConfig(num_data=num_data),
                          optim=OptimConfig(**{"learning_rate": 1e-2,
                                               **optim_kw})),
    )


def make_batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    B = cfg.train.batch_size
    W = cfg.window.windows_per_clip
    L = cfg.model.frames_per_window
    spw = samples_per_window(cfg.model.mel,
                             cfg.model.audio.mel_frames_per_window)
    return {
        "wav": rng.randn(B, W, spw).astype(np.float32),
        "labels": rng.uniform(-1, 1, (B, W, L, 2)).astype(np.float32),
        "mask": np.ones((B, W, L), dtype=bool),
    }


def _named(params):
    flat, _ = jax.tree_util.tree_flatten_with_path(jax.device_get(params))
    return {"/".join(str(getattr(q, "key", getattr(q, "idx", q)))
                     for q in path): np.asarray(leaf)
            for path, leaf in flat}


def _run_steps(cfg, n=3):
    tr = Trainer(cfg)
    state = tr.init_state(seed=0)
    p0 = _named(state.params)
    step = tr.make_train_step()
    batch = make_batch(cfg)
    for _ in range(n):
        state, _ = step(state, shard_batch(tr.mesh, batch))
    return p0, _named(state.params)


def test_freeze_keeps_params_bitwise_and_others_move():
    # weight_decay > 0 exercises adamw's decay term, which the freeze mask
    # must also zero (decay alone would drift "frozen" params)
    p0, p3 = _run_steps(make_cfg(freeze="audio", weight_decay=1e-2))
    for k in p0:
        if k.startswith("audio/"):
            np.testing.assert_array_equal(p0[k], p3[k], err_msg=k)
        else:
            assert not np.array_equal(p0[k], p3[k]), f"{k} did not train"


def test_nested_prefix_freezes_one_gru_direction():
    p0, p3 = _run_steps(make_cfg(freeze="gru/layers/0/bwd"))
    for k in p0:
        if k.startswith("gru/layers/0/bwd/"):
            np.testing.assert_array_equal(p0[k], p3[k], err_msg=k)
        else:
            assert not np.array_equal(p0[k], p3[k]), f"{k} did not train"


def test_lr_scale_is_exactly_a_per_group_learning_rate():
    # scale EVERY group by 0.5 <=> plain run at lr/2 (adam updates are
    # lr-linear; global-norm clip runs before the optimizer, lr-independent)
    _, scaled = _run_steps(make_cfg(lr_scale="audio=0.5,gru=0.5,head=0.5"),
                           n=2)
    _, half = _run_steps(make_cfg(learning_rate=5e-3), n=2)
    for k in scaled:
        np.testing.assert_allclose(scaled[k], half[k], rtol=1e-6, atol=1e-7,
                                   err_msg=k)


def test_freeze_composes_with_grad_accumulation():
    p0, p2 = _run_steps(make_cfg(freeze="audio", accumulate_steps=2), n=2)
    for k in p0:
        if k.startswith("audio/"):
            np.testing.assert_array_equal(p0[k], p2[k], err_msg=k)
        else:
            assert not np.array_equal(p0[k], p2[k]), f"{k} did not train"


def test_unknown_prefix_fails_loudly_at_init():
    tr = Trainer(make_cfg(freeze="vizual"))
    with pytest.raises(ValueError, match="match no parameter"):
        tr.init_state(seed=0)


def test_overlapping_lr_scale_prefixes_rejected():
    with pytest.raises(ValueError, match="overlap"):
        Trainer(make_cfg(lr_scale="gru=0.5,gru/layers=2.0"))


def test_malformed_lr_scale_rejected():
    with pytest.raises(ValueError, match="prefix=factor"):
        Trainer(make_cfg(lr_scale="gru:0.5"))


def test_freeze_sharded_equals_single_device():
    # the masked chain must survive GSPMD sharding: dp=4 == dp=1 up to the
    # documented psum-reduce-order × Adam-rsqrt noise band (test_parallel.py
    # test_sharded_equals_single_device uses the same 5e-3/1e-3 tolerances);
    # FROZEN leaves must stay BITWISE equal regardless — zero is exact.
    p0, single = _run_steps(make_cfg(freeze="audio", lr_scale="gru=0.25"),
                            n=2)
    _, sharded = _run_steps(make_cfg(num_data=4, freeze="audio",
                                     lr_scale="gru=0.25"), n=2)
    for k in single:
        if k.startswith("audio/"):
            np.testing.assert_array_equal(p0[k], sharded[k], err_msg=k)
        else:
            np.testing.assert_allclose(single[k], sharded[k], rtol=5e-3,
                                       atol=1e-3, err_msg=k)


def test_freeze_exact_resume(tmp_path):
    """The masked opt_state (extra chain entries wrapping MaskedState) must
    round-trip through the npz checkpoint: save at step 2, resume into a
    FRESH trainer, continue — final params bitwise-equal an uninterrupted
    4-step run."""
    from m3f.pytorch_tpu.train.checkpoint import Checkpointer

    cfg = make_cfg(freeze="audio", lr_scale="gru=0.25", weight_decay=1e-2)
    batch = make_batch(cfg)

    tr_a = Trainer(cfg)
    state_a = tr_a.init_state(seed=0)
    step_a = tr_a.make_train_step()
    for _ in range(4):
        state_a, _ = step_a(state_a, shard_batch(tr_a.mesh, batch))

    tr_b = Trainer(cfg)
    state_b = tr_b.init_state(seed=0)
    step_b = tr_b.make_train_step()
    for _ in range(2):
        state_b, _ = step_b(state_b, shard_batch(tr_b.mesh, batch))
    ck = Checkpointer(str(tmp_path), keep=1, cfg=cfg)
    path = ck.save(state_b)

    tr_c = Trainer(cfg)
    state_c = tr_c.init_state(seed=1)  # different seed: restore must win
    from m3f.pytorch_tpu.train.checkpoint import load_pytree
    state_c = load_pytree(state_c, path)
    step_c = tr_c.make_train_step()
    for _ in range(2):
        state_c, _ = step_c(state_c, shard_batch(tr_c.mesh, batch))

    pa, pc = _named(state_a.params), _named(state_c.params)
    for k in pa:
        np.testing.assert_array_equal(pa[k], pc[k], err_msg=k)
    assert int(state_c.step) == int(state_a.step) == 4


def test_config_hash_conditional():
    base = make_cfg().config_hash()
    assert make_cfg(freeze="audio").config_hash() != base
    assert make_cfg(lr_scale="audio=0.1").config_hash() != base
    # unset controls leave the hash identical (legacy-checkpoint resume)
    assert make_cfg().config_hash() == base
