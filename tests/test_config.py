"""Config system: presets, dotted overrides, hashing (SURVEY §5)."""

import pytest

from m3f.pytorch_tpu.config import (PRESETS, apply_overrides, fusion)
from m3f.pytorch_tpu.main import build_config


def test_presets_exist_for_all_baseline_configs():
    # BASELINE.json lists exactly five configs ([B:7-11])
    assert set(PRESETS) == {"audio_only", "visual_only", "fusion",
                            "longseq_eval", "distributed_train"}
    assert not PRESETS["audio_only"]().model.use_video
    assert not PRESETS["visual_only"]().model.use_audio


def test_dotted_overrides():
    cfg = apply_overrides(fusion(), {
        "train.optim.learning_rate": 3e-4,
        "train.batch_size": 16,
        "model.gru.hidden_size": 128,
    })
    assert cfg.train.optim.learning_rate == 3e-4
    assert cfg.train.batch_size == 16
    assert cfg.model.gru.hidden_size == 128


def test_override_string_coercion():
    cfg = apply_overrides(fusion(), {"train.batch_size": "12",
                                     "model.use_audio": "false"})
    assert cfg.train.batch_size == 12
    assert cfg.model.use_audio is False


def test_config_hash_changes_with_content():
    # semantic fields (model / window / optim / loss) change the hash ...
    a = fusion()
    assert a.config_hash() != apply_overrides(
        fusion(), {"model.gru.hidden_size": 128}).config_hash()
    assert a.config_hash() != apply_overrides(
        fusion(), {"train.optim.learning_rate": 0.123}).config_hash()
    assert a.config_hash() != apply_overrides(
        fusion(), {"train.loss": "mse"}).config_hash()
    assert a.config_hash() != apply_overrides(
        fusion(), {"data.image_size": 224}).config_hash()  # input semantics
    # ... run cadence / placement / identical-math backend knobs do NOT
    # (legitimate resume changes: extending num_steps, new batch size,
    # moved checkpoint dir or pretrained npz, xla<->pallas flips)
    assert a.config_hash() == apply_overrides(
        fusion(), {"train.batch_size": 99}).config_hash()
    assert a.config_hash() == apply_overrides(
        fusion(), {"train.num_steps": 123}).config_hash()
    assert a.config_hash() == apply_overrides(
        fusion(), {"model.visual.conv_backend": "pallas_fused"}).config_hash()
    assert a.config_hash() == apply_overrides(
        fusion(), {"model.gru.backend": "pallas"}).config_hash()
    assert a.config_hash() == apply_overrides(
        fusion(), {"model.init_from": "/some/other/path.npz"}).config_hash()
    assert a.config_hash() == fusion().config_hash()


def test_cli_build_config_parses_values():
    cfg = build_config("fusion", ["train.batch_size=4",
                                  "train.optim.learning_rate=0.001"])
    assert cfg.train.batch_size == 4
    assert cfg.train.optim.learning_rate == 0.001
    with pytest.raises(SystemExit):
        build_config("fusion", ["notkeyvalue"])


def test_cli_preset_variants_stack():
    cfg = build_config("fusion+lane+s2d", [])
    assert cfg.model.visual.mid_mode == "lane"
    assert cfg.model.visual.stem_s2d is True
    with pytest.raises(SystemExit):
        build_config("fusion+warp", [])


def test_metric_writer(tmp_path):
    from m3f.pytorch_tpu.utils.logging import MetricWriter
    with MetricWriter(str(tmp_path), "t", tensorboard=False) as w:
        w.write(1, {"loss": 0.5})
        w.write(2, {"loss": 0.25})
    jl = (tmp_path / "t.jsonl").read_text().strip().split("\n")
    assert len(jl) == 2
    csv_lines = (tmp_path / "t.csv").read_text().strip().split("\n")
    assert csv_lines[0].startswith("step,")
    assert len(csv_lines) == 3


def test_metric_writer_grows_csv_header(tmp_path):
    from m3f.pytorch_tpu.utils.logging import MetricWriter
    with MetricWriter(str(tmp_path), "t2", tensorboard=False) as w:
        w.write(1, {"loss": 0.5})
        w.write(2, {"eval_ccc_v": 0.3, "eval_ccc_a": 0.4})
    lines = (tmp_path / "t2.csv").read_text().strip().split("\n")
    header = lines[0].split(",")
    assert "loss" in header and "eval_ccc_v" in header
    assert len(lines) == 3
    # resume appends without losing prior rows
    with MetricWriter(str(tmp_path), "t2", tensorboard=False) as w:
        w.write(3, {"loss": 0.25})
    lines = (tmp_path / "t2.csv").read_text().strip().split("\n")
    assert len(lines) == 4


def test_step_schedule_decays():
    """optim.schedule="step": torch MultiStepLR-style staircase."""
    import numpy as np
    from m3f.pytorch_tpu.config import OptimConfig
    from m3f.pytorch_tpu.train.loop import make_optimizer
    import optax

    cfg = OptimConfig(learning_rate=1e-2, schedule="step",
                      step_decay_factor=0.1, step_decay_every=10)
    tx = make_optimizer(cfg, num_steps=30)  # builds without error
    # the schedule itself: lr halves of decades at 10, 20
    lr = optax.piecewise_constant_schedule(
        1e-2, {10: 0.1, 20: 0.1})
    assert np.isclose(float(lr(0)), 1e-2)
    assert np.isclose(float(lr(15)), 1e-3)
    assert np.isclose(float(lr(25)), 1e-4)


def test_tuple_field_overrides():
    """Tuple fields accept JSON lists and comma strings (e.g. the R(2+1)D-34
    recipe via model.visual.blocks_per_stage=[3,4,6,3])."""
    from m3f.pytorch_tpu.config import fusion, apply_overrides

    cfg = apply_overrides(fusion(), {"model.visual.blocks_per_stage": [3, 4, 6, 3]})
    assert cfg.model.visual.blocks_per_stage == (3, 4, 6, 3)
    assert isinstance(cfg.model.visual.blocks_per_stage, tuple)
    cfg = apply_overrides(fusion(), {"model.audio.channels": "16,32"})
    assert cfg.model.audio.channels == (16, 32)
    # hashing still works with overridden tuples
    assert cfg.config_hash()


def test_tuple_field_override_bad_scalar_errors():
    import pytest
    from m3f.pytorch_tpu.config import fusion, apply_overrides

    with pytest.raises(ValueError, match="blocks_per_stage"):
        apply_overrides(fusion(), {"model.visual.blocks_per_stage": 3})


def test_window_frames_coupling_validated():
    """window.window_frames and model.frames_per_window must agree in
    per-frame mode (fuzzing found a mismatch crashes with a cryptic
    reshape error deep in label alignment); Trainer fails loudly at
    construction, and SYNCED non-default geometry works (fuzz-verified)."""
    import pytest

    from m3f.pytorch_tpu.config import ExperimentConfig, apply_overrides
    from m3f.pytorch_tpu.train.loop import Trainer

    bad = apply_overrides(ExperimentConfig(), {
        "model.use_video": False, "window.window_frames": 8})
    with pytest.raises(ValueError, match="frames_per_window"):
        Trainer(bad)

    ok = apply_overrides(ExperimentConfig(), {
        "model.use_video": False, "model.audio.channels": [4],
        "model.audio.feature_dim": 4, "model.gru.hidden_size": 4,
        "window.window_frames": 8, "model.frames_per_window": 8,
        "model.audio.mel_frames_per_window": 8})
    Trainer(ok)  # constructs fine
