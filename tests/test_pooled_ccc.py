"""Pooled (cross-video) CCC evaluation convention (VERDICT r2 missing #1).

The ABAW-family evaluation plausibly pools statistics over the concatenation
of ALL videos rather than averaging per-video CCCs; the two differ
materially (per-video CCC punishes short low-variance videos). evaluate()
reports BOTH; `train.eval_ccc_convention` picks which drives best-checkpoint
selection. Oracle: numpy fp64 CCC over the literal concatenation.
"""

import numpy as np
import pytest

from m3f.pytorch_tpu.config import ExperimentConfig, apply_overrides
from m3f.pytorch_tpu.data.synthetic import SyntheticAVDataset
from m3f.pytorch_tpu.ops.ccc import ccc_from_stats, ccc_sufficient_stats
from m3f.pytorch_tpu.train.loop import Trainer, _host_ccc

OV = {"model.audio.channels": [4, 8], "model.audio.feature_dim": 8,
      "model.use_video": False, "model.gru.hidden_size": 8,
      "data.synthetic_num_videos": 3,
      "data.synthetic_video_frames": 96}


def _oracle_ccc(pred, target, valid, eps=1e-8):
    """Plain two-pass fp64 masked CCC (the textbook formula)."""
    m = np.asarray(valid, bool)
    p, t = np.asarray(pred, np.float64)[m], np.asarray(target, np.float64)[m]
    mu_p, mu_t = p.mean(0), t.mean(0)
    cov = ((p - mu_p) * (t - mu_t)).mean(0)
    return 2 * cov / (p.var(0) + t.var(0) + (mu_p - mu_t) ** 2 + eps)


def test_stats_sum_equals_concat_oracle():
    """Summed per-video sufficient stats == CCC of the concatenation."""
    rng = np.random.RandomState(0)
    videos = []
    for n in (50, 200, 7):
        target = rng.uniform(-1, 1, (n, 2))
        pred = target * 0.8 + rng.normal(0, 0.2, (n, 2))
        valid = rng.rand(n) > 0.2
        videos.append((pred, target, valid))
    # guard against accidentally-uniform fixtures
    assert any(v[2].sum() < len(v[2]) for v in videos)

    pooled = sum(ccc_sufficient_stats(p, t, v) for p, t, v in videos)
    got = ccc_from_stats(pooled)

    cat = tuple(np.concatenate([x[i] for x in videos]) for i in range(3))
    want = _oracle_ccc(*cat)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    # single-video stats also reproduce that video's own CCC (same formula
    # the per-video convention uses, fp64 host reference)
    p, t, v = videos[0]
    np.testing.assert_allclose(ccc_from_stats(ccc_sufficient_stats(p, t, v)),
                               _host_ccc(p, t, v), rtol=1e-9, atol=1e-12)


def test_stats_degenerate_inputs_finite():
    # all-masked video contributes nothing and stays finite
    z = ccc_from_stats(ccc_sufficient_stats(
        np.zeros((5, 2)), np.zeros((5, 2)), np.zeros(5, bool)))
    assert np.all(np.isfinite(z)) and np.all(z == 0.0)
    # constant pair: zero variance, equal means -> CCC 0, not NaN
    c = ccc_from_stats(ccc_sufficient_stats(
        np.full((5, 2), 0.3), np.full((5, 2), 0.3), np.ones(5, bool)))
    assert np.all(np.isfinite(c))


def test_evaluate_reports_both_conventions():
    """evaluate() emits per-video AND pooled CCC; pooled matches the oracle
    computed from the per-video preds/labels it returns."""
    cfg = apply_overrides(ExperimentConfig(), OV)
    tr = Trainer(cfg)
    state = tr.init_state()
    ds = SyntheticAVDataset(cfg.data, cfg.model.mel)

    per_video = {}

    def keep(vid, r):
        per_video[vid] = r

    res = tr.evaluate(state, ds, per_video_fn=keep)
    for k in ("ccc_v", "ccc_a", "ccc_mean",
              "pooled_ccc_v", "pooled_ccc_a", "pooled_ccc_mean",
              "ccc_select"):
        assert k in res and np.isfinite(res[k]), k

    # oracle: concatenate every video's preds against its labels
    preds, labs, vals = [], [], []
    for vid in ds.video_ids():
        video = ds.load_video(vid)
        preds.append(per_video[vid]["pred"])
        labs.append(video["labels"])
        vals.append(video["valid"])
    want = _oracle_ccc(np.concatenate(preds), np.concatenate(labs),
                       np.concatenate(vals))
    assert abs(res["pooled_ccc_v"] - want[0]) < 1e-6
    assert abs(res["pooled_ccc_a"] - want[1]) < 1e-6
    # default selection metric is the per-video mean
    assert res["ccc_select"] == res["ccc_mean"]

    # pooled selection flips the metric used for best tracking
    tr2 = Trainer(apply_overrides(
        cfg, {"train.eval_ccc_convention": "pooled"}))
    res2 = tr2.evaluate(state, ds)
    assert res2["ccc_select"] == res2["pooled_ccc_mean"]
    # the two trainers agree on every reported number (same state, data)
    assert abs(res2["pooled_ccc_mean"] - res["pooled_ccc_mean"]) < 1e-9


def test_bad_convention_rejected():
    cfg = apply_overrides(ExperimentConfig(),
                          {**OV, "train.eval_ccc_convention": "bogus"})
    with pytest.raises(ValueError, match="eval_ccc_convention"):
        Trainer(cfg)
