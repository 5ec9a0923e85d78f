"""Submission writer + postprocess chain (SURVEY §2.1 C11)."""

import numpy as np

from m3f.pytorch_tpu.infer.submission import (postprocess, smooth_predictions,
                                              write_submission)


def test_smooth_identity_and_window():
    p = np.random.RandomState(0).randn(50, 2).astype(np.float32)
    np.testing.assert_array_equal(smooth_predictions(p, 1), p)
    s = smooth_predictions(p, 5)
    assert s.shape == p.shape
    # interior point is the mean of its 5-neighborhood
    np.testing.assert_allclose(s[10, 0], p[8:13, 0].mean(), rtol=1e-5)


def test_postprocess_clips_and_interpolates():
    p = np.array([[2.0, -2.0], [0.5, 0.5], [9.0, 9.0], [0.1, -0.1]], np.float32)
    valid = np.array([True, True, False, True])
    out = postprocess(p, valid)
    assert (out <= 1.0).all() and (out >= -1.0).all()
    # gap row was interpolated between neighbors then clipped
    np.testing.assert_allclose(out[2], [(0.5 + 0.1) / 2, (0.5 - 0.1) / 2], atol=1e-6)


def test_write_submission_layout(tmp_path):
    preds = {"vidA": np.zeros((3, 2), np.float32),
             "vidB": np.full((2, 2), 0.25, np.float32)}
    write_submission(str(tmp_path), preds)
    for vid, n in [("vidA", 3), ("vidB", 2)]:
        lines = (tmp_path / f"{vid}.txt").read_text().strip().split("\n")
        assert lines[0] == "valence,arousal"
        assert len(lines) == n + 1
        v, a = lines[1].split(",")
        float(v), float(a)
