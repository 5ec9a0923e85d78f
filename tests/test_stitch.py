"""Window/stitch indexing properties (SURVEY §4: "every frame covered,
overlap weights sum to 1"), determinism, gap interpolation."""

import numpy as np
import jax.numpy as jnp
import pytest

from m3f.pytorch_tpu.ops.stitch import (clip_predictions, coverage_matrix,
                                        interpolate_gaps,
                                        stitch_framewise,
                                        stitch_overlap_average, window_starts)


@pytest.mark.parametrize("n,window,stride", [
    (100, 16, 8), (100, 16, 16), (16, 16, 8), (17, 16, 8), (23, 16, 5),
    (1000, 16, 4), (10, 16, 8),
])
def test_every_frame_covered(n, window, stride):
    starts = window_starts(n, window, stride)
    m = np.asarray(coverage_matrix(jnp.asarray(starts), n, window))
    assert (m.sum(axis=1) >= 1).all(), "uncovered frame"
    # windows never exceed the timeline (except the single-window short case)
    if n >= window:
        assert starts.max() + window <= n


def test_constant_predictions_stitch_exactly():
    n, window, stride = 57, 16, 7
    starts = window_starts(n, window, stride)
    preds = jnp.ones((len(starts), 2)) * 0.37
    out = np.asarray(stitch_overlap_average(preds, jnp.asarray(starts), n, window))
    np.testing.assert_allclose(out, 0.37, rtol=1e-6)


def test_overlap_average_matches_numpy():
    rng = np.random.RandomState(0)
    n, window, stride = 80, 16, 8
    starts = window_starts(n, window, stride)
    preds = rng.randn(len(starts), 2).astype(np.float32)
    got = np.asarray(stitch_overlap_average(jnp.asarray(preds),
                                            jnp.asarray(starts), n, window))
    want_num = np.zeros((n, 2))
    want_den = np.zeros((n, 1))
    for w, s in enumerate(starts):
        want_num[s:s + window] += preds[w]
        want_den[s:s + window] += 1
    np.testing.assert_allclose(got, want_num / want_den, rtol=1e-5, atol=1e-6)


def test_framewise_stitch_matches_numpy():
    rng = np.random.RandomState(1)
    n, window, stride = 40, 16, 8
    starts = window_starts(n, window, stride)
    preds = rng.randn(len(starts), window, 2).astype(np.float32)
    got = np.asarray(stitch_framewise(jnp.asarray(preds), jnp.asarray(starts), n))
    num = np.zeros((n, 2)); den = np.zeros((n, 1))
    for w, s in enumerate(starts):
        num[s:s + window] += preds[w]
        den[s:s + window] += 1
    np.testing.assert_allclose(got, num / den, rtol=1e-5, atol=1e-6)


def test_framewise_stitch_win_valid_drops_padding():
    """Padding windows (win_valid=False) contribute nothing; stitch with
    padded duplicate windows == stitch of the unpadded set."""
    rng = np.random.RandomState(2)
    n, window, stride = 40, 16, 8
    starts = window_starts(n, window, stride)
    preds = rng.randn(len(starts), window, 2).astype(np.float32)
    want = np.asarray(stitch_framewise(jnp.asarray(preds), jnp.asarray(starts), n))
    # pad with 3 duplicates of the last window carrying garbage predictions
    pad_starts = np.concatenate([starts, np.repeat(starts[-1:], 3)])
    pad_preds = np.concatenate([preds, 99.0 * np.ones((3, window, 2), np.float32)])
    valid = np.arange(len(pad_starts)) < len(starts)
    got = np.asarray(stitch_framewise(jnp.asarray(pad_preds),
                                      jnp.asarray(pad_starts), n,
                                      win_valid=jnp.asarray(valid)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_framewise_stitch_constant_exact():
    n, window, stride = 57, 16, 7
    starts = window_starts(n, window, stride)
    preds = jnp.ones((len(starts), window, 2)) * -0.41
    out = np.asarray(stitch_framewise(preds, jnp.asarray(starts), n))
    np.testing.assert_allclose(out, -0.41, rtol=1e-6)


def test_interpolate_gaps():
    preds = np.array([[0.0, 0.0], [1.0, -1.0], [9.0, 9.0], [3.0, -3.0]], np.float32)
    valid = np.array([True, True, False, True])
    out = interpolate_gaps(preds, valid)
    np.testing.assert_allclose(out[2], [2.0, -2.0], atol=1e-6)  # linear between rows 1 and 3
    # edges: leading/trailing gaps take nearest valid value
    out2 = interpolate_gaps(preds, np.array([False, True, True, False]))
    np.testing.assert_allclose(out2[0], preds[1])
    np.testing.assert_allclose(out2[3], preds[2])


def test_clip():
    p = np.array([[1.5, -2.0], [0.3, 0.9]], np.float32)
    out = clip_predictions(p)
    assert out.max() <= 1.0 and out.min() >= -1.0
    np.testing.assert_allclose(out[1], p[1])


def test_randomized_coverage_and_framewise_properties():
    """Randomized sweep over (n, window, stride): every frame covered, stitch
    weights sum to 1 where covered, and the jit framewise stitch equals a
    numpy scatter-add oracle (SURVEY §4 'window/stitch indexing properties')."""
    rng = np.random.RandomState(42)
    for trial in range(12):
        window = int(rng.randint(2, 24))
        n = int(rng.randint(1, 200))
        stride = int(rng.randint(1, window + 1))
        starts = window_starts(n, window, stride)
        assert (starts >= 0).all()
        L = max(n, window)
        # coverage
        cover = np.zeros(L)
        for s in starts:
            cover[s:s + window] += 1
        assert (cover[:n] >= 1).all(), (n, window, stride)
        # framewise stitch vs numpy oracle — every random shape is a fresh
        # XLA compile (~1.5 s each on this VM), so the jit comparison runs
        # on the first 5 shapes only; coverage stays randomized over all 12
        if trial >= 5:
            continue
        preds = rng.randn(len(starts), window, 2).astype(np.float32)
        got = np.asarray(stitch_framewise(jnp.asarray(preds),
                                          jnp.asarray(starts), L))
        acc = np.zeros((L, 2)); cnt = np.zeros(L)
        for i, s in enumerate(starts):
            acc[s:s + window] += preds[i]
            cnt[s:s + window] += 1
        want = acc / np.maximum(cnt, 1)[:, None]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=str((n, window, stride)))


def test_smooth_moving_average_matches_submission_oracle():
    """On-device smoother == infer/submission.py host smoother (the spec),
    odd and even windows, short and long sequences."""
    from m3f.pytorch_tpu.infer.submission import smooth_predictions
    from m3f.pytorch_tpu.ops.stitch import smooth_moving_average
    rng = np.random.RandomState(7)
    for T in (1, 2, 5, 37, 400):
        preds = rng.uniform(-1, 1, (T, 2)).astype(np.float32)
        for w in (1, 2, 3, 5, 8, 15):
            want = smooth_predictions(preds, w)
            got = np.asarray(smooth_moving_average(jnp.asarray(preds), w))
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6,
                                       err_msg=f"T={T} w={w}")


def test_eval_smooth_matches_host_postprocess():
    """`window.eval_smooth` inside the fused eval jit == running the plain
    eval then the host submission smoother (incl. the padded-timeline right
    edge, which the jit must edge-extend rather than smear pad zeros)."""
    import jax
    from m3f.pytorch_tpu.config import ExperimentConfig, apply_overrides
    from m3f.pytorch_tpu.data.synthetic import SyntheticAVDataset
    from m3f.pytorch_tpu.infer.submission import smooth_predictions
    from m3f.pytorch_tpu.train.loop import Trainer

    ov = {"model.audio.channels": [4, 8], "model.audio.feature_dim": 8,
          "model.visual.block_channels": [8, 16],
          "model.visual.blocks_per_stage": [1, 1],
          "model.visual.stem_channels": 8, "model.visual.feature_dim": 16,
          "model.gru.hidden_size": 8, "data.image_size": 32,
          "data.synthetic_num_videos": 1,
          # 100 frames: NOT a multiple of the 256-frame eval bucket, so the
          # right edge exercises the n_real edge-extension
          "data.synthetic_video_frames": 100}
    cfg = apply_overrides(ExperimentConfig(), ov)
    sm = apply_overrides(cfg, {"window.eval_smooth": 5})
    assert cfg.config_hash() == sm.config_hash()  # postprocess-only knob

    plain, smoothed = Trainer(cfg), Trainer(sm)
    state = plain.init_state()
    ds = SyntheticAVDataset(cfg.data, cfg.model.mel)
    video = ds.load_video(ds.video_ids()[0])
    p = plain.evaluate_video(state, video)["pred"]
    q = smoothed.evaluate_video(state, video)["pred"]
    want = np.clip(smooth_predictions(p, 5), -1.0, 1.0)
    np.testing.assert_allclose(q, want, rtol=1e-4, atol=1e-5)
