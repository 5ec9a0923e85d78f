"""Chunked long-video eval (`window.eval_max_windows`).

Videos whose window enumeration exceeds the bound are evaluated in bounded
window chunks with host-side accumulation of stitch sums — device memory
stays constant for arbitrarily long videos. Must match the single fused
dispatch to float tolerance (same windows, same GRU sequence grouping, same
postprocess order), including the smoothed variant, on the 8-fake-device
mesh (chunks ride the same sequence sharding).
"""

import numpy as np
import pytest

from m3f.pytorch_tpu.config import ExperimentConfig, apply_overrides
from m3f.pytorch_tpu.data.synthetic import SyntheticAVDataset
from m3f.pytorch_tpu.train.loop import Trainer, _host_ccc

OV = {"model.audio.channels": [4, 8], "model.audio.feature_dim": 8,
      "model.visual.block_channels": [8, 16],
      "model.visual.blocks_per_stage": [1, 1],
      "model.visual.stem_channels": 8, "model.visual.feature_dim": 16,
      "model.gru.hidden_size": 8, "data.image_size": 32,
      "data.synthetic_num_videos": 1,
      # 560 frames @ stride 8 -> ~69 windows: > 2 chunks of 32 (the
      # 8-fake-device mesh's sequence bucket is W*8 = 32 windows)
      "data.synthetic_video_frames": 560}


def _video(cfg):
    ds = SyntheticAVDataset(cfg.data, cfg.model.mel)
    return ds.load_video(ds.video_ids()[0])


# smooth=5 is a second ~5 s compile of the same contract with the smoother
# folded in — slow-marked for the suite budget (ROUND5); smooth=1 stays lean
@pytest.mark.parametrize("smooth", [1, pytest.param(
    5, marks=pytest.mark.slow)])
def test_chunked_eval_matches_fused(smooth):
    fused_cfg = apply_overrides(ExperimentConfig(), {
        **OV, "window.eval_max_windows": 0, "window.eval_smooth": smooth})
    chunk_cfg = apply_overrides(ExperimentConfig(), {
        **OV, "window.eval_max_windows": 32, "window.eval_smooth": smooth})
    assert fused_cfg.config_hash() == chunk_cfg.config_hash()

    fused, chunked = Trainer(fused_cfg), Trainer(chunk_cfg)
    state = fused.init_state()
    video = _video(fused_cfg)
    rf = fused.evaluate_video(state, video)
    rc = chunked.evaluate_video(state, video)
    assert rc["pred"].shape == rf["pred"].shape == (560, 2)
    np.testing.assert_allclose(rc["pred"], rf["pred"], rtol=1e-4, atol=1e-5)
    assert abs(rc["ccc_v"] - rf["ccc_v"]) < 1e-4
    assert abs(rc["ccc_a"] - rf["ccc_a"]) < 1e-4


def test_chunked_eval_invalid_frames_and_host_ccc():
    """-5-masked frames stay out of the chunked path's host CCC, and the
    numpy fp64 CCC matches the device formula on a hand case."""
    cfg = apply_overrides(ExperimentConfig(), {
        **OV, "window.eval_max_windows": 32})
    tr = Trainer(cfg)
    state = tr.init_state()
    video = _video(cfg)
    video = dict(video)
    valid = video["valid"].copy()
    valid[100:200] = False
    video["valid"] = valid
    r = tr.evaluate_video(state, video)
    assert np.isfinite(r["ccc_v"]) and np.isfinite(r["ccc_a"])
    # masked frames must not affect the score: same result when their
    # labels are scrambled
    video2 = dict(video)
    labels2 = video["labels"].copy()
    labels2[100:200] = 0.777
    video2["labels"] = labels2
    r2 = tr.evaluate_video(state, video2)
    assert r2["ccc_v"] == r["ccc_v"] and r2["ccc_a"] == r["ccc_a"]

    # _host_ccc vs ops.ccc on a random masked case
    import jax.numpy as jnp
    from m3f.pytorch_tpu.ops.ccc import ccc
    rng = np.random.RandomState(0)
    p = rng.uniform(-1, 1, (300, 2)).astype(np.float32)
    t = rng.uniform(-1, 1, (300, 2)).astype(np.float32)
    m = rng.rand(300) > 0.3
    want = np.asarray(ccc(jnp.asarray(p), jnp.asarray(t),
                          mask=jnp.asarray(m)[:, None], axis=(0,)))
    got = _host_ccc(p, t, m)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
