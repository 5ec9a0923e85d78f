"""Integration gate (SURVEY §4): tiny audio-only end-to-end training on CPU —
wav → fused mel → CNN → BiGRU → CCC loss → optax steps → loss decreases;
then full-video sliding-window eval runs and checkpoint resume works."""

import numpy as np

from m3f.pytorch_tpu.config import (AudioNetConfig, DataConfig,
                                    ExperimentConfig, GRUConfig, MeshConfig,
                                    ModelConfig, OptimConfig, TrainConfig,
                                    WindowConfig)
from m3f.pytorch_tpu.data.synthetic import SyntheticAVDataset
from m3f.pytorch_tpu.data.windowing import WindowSequencer, example_stream
from m3f.pytorch_tpu.train.checkpoint import Checkpointer
from m3f.pytorch_tpu.train.loop import Trainer


def tiny_audio_cfg(num_steps=12, ckpt_dir="/tmp/m3f_it_ckpt"):
    return ExperimentConfig(
        name="it_audio",
        model=ModelConfig(
            use_audio=True, use_video=False,
            audio=AudioNetConfig(channels=(8, 16), feature_dim=16),
            gru=GRUConfig(hidden_size=16),
        ),
        window=WindowConfig(windows_per_clip=2),
        data=DataConfig(synthetic_num_videos=2, synthetic_video_frames=96,
                        image_size=16),
        train=TrainConfig(batch_size=4, num_steps=num_steps, log_every=4,
                          eval_every=10_000, checkpoint_every=10_000,
                          checkpoint_dir=ckpt_dir,
                          optim=OptimConfig(learning_rate=3e-3),
                          mesh=MeshConfig(num_data=1)),
    )


def test_audio_only_trains_and_evals(tmp_path):
    cfg = tiny_audio_cfg(ckpt_dir=str(tmp_path))
    tr = Trainer(cfg)
    ds = SyntheticAVDataset(cfg.data, cfg.model.mel)
    seq = WindowSequencer(cfg.window, cfg.model.mel,
                          mel_frames=cfg.model.audio.mel_frames_per_window)
    stream = example_stream(ds, seq, cfg.train.batch_size, seed=0)
    ck = Checkpointer(str(tmp_path), keep=2, cfg=cfg)
    state, hist = tr.fit(stream, log=lambda s: None, checkpointer=ck)
    losses = hist["loss"]
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert np.isfinite(losses[-1])

    # sliding-window full-video eval produces per-frame preds and finite CCC
    r = tr.evaluate_video(state, ds.load_video(ds.video_ids()[0]))
    assert r["pred"].shape == (cfg.data.synthetic_video_frames, 2)
    assert np.isfinite(r["ccc_v"]) and np.isfinite(r["ccc_a"])
    assert (np.abs(r["pred"]) <= 1.0).all()

    # resume: restored state continues from the saved step
    ck.save(state)
    cfg2 = tiny_audio_cfg(num_steps=14, ckpt_dir=str(tmp_path))
    tr2 = Trainer(cfg2)
    restored = ck.maybe_restore(tr2.init_state(), tr2)
    assert int(restored.step) == int(state.step)


def test_eval_video_shorter_than_window(tmp_path):
    """Video with fewer frames than one 16-frame window still evaluates."""
    cfg = tiny_audio_cfg(ckpt_dir=str(tmp_path))
    cfg = cfg.replace(data=cfg.data.__class__(
        synthetic_num_videos=1, synthetic_video_frames=10, image_size=16))
    tr = Trainer(cfg)
    state = tr.init_state()
    ds = SyntheticAVDataset(cfg.data, cfg.model.mel)
    r = tr.evaluate_video(state, ds.load_video(ds.video_ids()[0]))
    assert r["pred"].shape == (10, 2)
    assert np.isfinite(r["pred"]).all()
    assert np.isfinite(r["ccc_v"]) and np.isfinite(r["ccc_a"])


def test_eval_all_invalid_video_stays_finite(tmp_path):
    """Degenerate: every frame invalid → CCC must be finite (0), not NaN."""
    cfg = tiny_audio_cfg(ckpt_dir=str(tmp_path))
    tr = Trainer(cfg)
    state = tr.init_state()
    ds = SyntheticAVDataset(cfg.data, cfg.model.mel)
    video = ds.load_video(ds.video_ids()[0])
    video["valid"][:] = False
    r = tr.evaluate_video(state, video)
    assert np.isfinite(r["ccc_v"]) and np.isfinite(r["ccc_a"])
    assert np.isfinite(r["pred"]).all()


def test_cadence_zero_means_off(tmp_path):
    """eval/log/checkpoint_every = 0 disable the feature instead of
    crashing fit() with ZeroDivisionError (found via the CLI:
    train.eval_every=0 is the natural way to switch periodic eval off)."""
    import dataclasses

    cfg = tiny_audio_cfg(num_steps=3, ckpt_dir=str(tmp_path))
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, eval_every=0, log_every=0, checkpoint_every=0))
    tr = Trainer(cfg)
    ds = SyntheticAVDataset(cfg.data, cfg.model.mel)
    seq = WindowSequencer(cfg.window, cfg.model.mel,
                          mel_frames=cfg.model.audio.mel_frames_per_window,
                          per_frame=cfg.model.per_frame)
    stream = example_stream(ds, seq, cfg.train.batch_size, loop=True)
    ck = Checkpointer(str(tmp_path), keep=2, cfg=cfg)
    # val_dataset present but eval_every=0: evaluate must never run
    state, hist = tr.fit(stream, val_dataset=ds, log=lambda s: None,
                         checkpointer=ck)
    assert int(state.step) == 3
    assert "eval" not in hist
    assert not ck.all_steps()  # cadence 0 saved nothing mid-run


def test_nondefault_window_geometry_trains(tmp_path):
    """L=8 windows end-to-end (fuzz-verified geometry-generic; this pins
    the non-default path in the suite): train a few steps + eval."""
    import dataclasses

    from m3f.pytorch_tpu.config import apply_overrides

    cfg = apply_overrides(tiny_audio_cfg(num_steps=3, ckpt_dir=str(tmp_path)), {
        "window.window_frames": 8, "model.frames_per_window": 8,
        "model.audio.mel_frames_per_window": 8, "window.eval_stride": 5})
    tr = Trainer(cfg)
    ds = SyntheticAVDataset(cfg.data, cfg.model.mel)
    seq = WindowSequencer(cfg.window, cfg.model.mel,
                          mel_frames=cfg.model.audio.mel_frames_per_window,
                          per_frame=cfg.model.per_frame)
    stream = example_stream(ds, seq, cfg.train.batch_size, loop=True)
    state, hist = tr.fit(stream, log=lambda s: None)
    assert int(state.step) == 3 and np.isfinite(hist["loss"]).all()
    r = tr.evaluate_video(state, ds.load_video(ds.video_ids()[0]))
    assert r["pred"].shape == (cfg.data.synthetic_video_frames, 2)
    assert np.isfinite(r["pred"]).all()
