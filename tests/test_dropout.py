"""Train-time dropout (`model.dropout`): inverted-dropout semantics on the
fused features (pre-GRU) and the GRU output (pre-head), train-mode only.
UNVERIFIED vs reference placement; standard for the repo family."""

import dataclasses

import jax
import numpy as np
import pytest

from m3f.pytorch_tpu.data.synthetic import SyntheticAVDataset
from m3f.pytorch_tpu.data.windowing import WindowSequencer, example_stream
from m3f.pytorch_tpu.models.m3f import M3F
from m3f.pytorch_tpu.train.loop import Trainer
from test_train_integration import tiny_audio_cfg


def _model_and_inputs(dropout):
    cfg = tiny_audio_cfg().model
    cfg = dataclasses.replace(cfg, dropout=dropout)
    model = M3F(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    from m3f.pytorch_tpu.data.windowing import samples_per_window
    spw = samples_per_window(cfg.mel, cfg.audio.mel_frames_per_window)
    wav = np.random.RandomState(0).randn(2, 2, spw).astype(np.float32)
    return model, params, state, wav


def test_dropout_train_stochastic_eval_deterministic():
    model, params, state, wav = _model_and_inputs(0.5)
    p1, _ = model.apply(params, state, wav=wav, train=True,
                        rng=jax.random.PRNGKey(1))
    p1b, _ = model.apply(params, state, wav=wav, train=True,
                         rng=jax.random.PRNGKey(1))
    p2, _ = model.apply(params, state, wav=wav, train=True,
                        rng=jax.random.PRNGKey(2))
    # same key reproducible, different keys differ
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p1b))
    assert np.abs(np.asarray(p1) - np.asarray(p2)).max() > 1e-6

    # eval ignores dropout entirely (no rng needed, matches dropout=0 model)
    e1, _ = model.apply(params, state, wav=wav, train=False)
    model0, params0, state0, _ = _model_and_inputs(0.0)
    e0, _ = model0.apply(params0, state0, wav=wav, train=False)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e0),
                               rtol=1e-6, atol=1e-6)


def test_dropout_requires_rng_in_train():
    model, params, state, wav = _model_and_inputs(0.3)
    with pytest.raises(AssertionError):
        model.apply(params, state, wav=wav, train=True)


def test_dropout_training_runs(tmp_path):
    cfg = tiny_audio_cfg(num_steps=4, ckpt_dir=str(tmp_path))
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, dropout=0.25))
    tr = Trainer(cfg)
    ds = SyntheticAVDataset(cfg.data, cfg.model.mel)
    seq = WindowSequencer(cfg.window, cfg.model.mel,
                          mel_frames=cfg.model.audio.mel_frames_per_window)
    stream = example_stream(ds, seq, cfg.train.batch_size, seed=0)
    state, hist = tr.fit(stream, log=lambda s: None)
    assert np.isfinite(hist["loss"][-1])
