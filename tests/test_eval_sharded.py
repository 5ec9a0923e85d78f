"""Full-video eval equality: 8-way sharded window batches vs single device."""

import numpy as np

from m3f.pytorch_tpu.config import (AudioNetConfig, DataConfig,
                                    ExperimentConfig, GRUConfig, MeshConfig,
                                    ModelConfig, TrainConfig, WindowConfig)
from m3f.pytorch_tpu.data.synthetic import SyntheticAVDataset
from m3f.pytorch_tpu.train.loop import Trainer


def cfg_with_mesh(n_data):
    return ExperimentConfig(
        name="evalshard",
        model=ModelConfig(
            use_audio=True, use_video=False,
            audio=AudioNetConfig(channels=(8, 16), feature_dim=16),
            gru=GRUConfig(hidden_size=16),
        ),
        window=WindowConfig(windows_per_clip=2, eval_stride=8),
        data=DataConfig(synthetic_num_videos=1, synthetic_video_frames=80,
                        image_size=16),
        train=TrainConfig(batch_size=2, mesh=MeshConfig(num_data=n_data)),
    )


def test_sharded_eval_matches_single_device():
    results = {}
    for n in (1, 8):
        cfg = cfg_with_mesh(n)
        tr = Trainer(cfg)
        state = tr.init_state(seed=0)
        ds = SyntheticAVDataset(cfg.data, cfg.model.mel)
        r = tr.evaluate_video(state, ds.load_video(ds.video_ids()[0]))
        results[n] = r
    # bf16 compute: batch tiling differs between shardings → ~1e-4 pred noise
    np.testing.assert_allclose(results[8]["pred"], results[1]["pred"],
                               atol=1e-3)
    assert abs(results[8]["ccc_v"] - results[1]["ccc_v"]) < 1e-3
    assert abs(results[8]["ccc_a"] - results[1]["ccc_a"]) < 1e-3


def test_pipelined_evaluate_matches_serial():
    """evaluate(pipeline=3) must produce exactly the serial (pipeline=1)
    metrics — pipelining only overlaps transfers, never reorders math."""
    cfg = cfg_with_mesh(1)
    cfg = cfg.replace(data=cfg.data.__class__(
        synthetic_num_videos=5, synthetic_video_frames=64, image_size=16))
    from m3f.pytorch_tpu.data.synthetic import SyntheticAVDataset
    tr = Trainer(cfg)
    state = tr.init_state(seed=0)
    ds = SyntheticAVDataset(cfg.data, cfg.model.mel)
    serial = tr.evaluate(state, ds, pipeline=1)
    piped = tr.evaluate(state, ds, pipeline=3)
    assert serial == piped
