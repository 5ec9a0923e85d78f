"""Prediction-level checkpoint ensembling (round 4).

The challenge-era workflow averages the per-frame prediction tracks of
several trained checkpoints (distinct from weight-space SWA, which
scripts/average_checkpoints.py covers). Asserted:

1. predict_ensemble([A]) == the single-model eval prediction exactly;
2. predict_ensemble([A, A]) == single A (mean of identical tracks);
3. predict_ensemble([A, B]) == the per-frame mean of A's and B's tracks;
4. evaluate_ensemble scores the MEAN track (its CCC differs from the mean
   of the individual CCCs) and returns the evaluate() key set;
5. the CLI comma syntax routes eval and predict through the ensemble.
"""

import json

import numpy as np
import pytest

from m3f.pytorch_tpu.config import (AudioNetConfig, DataConfig,
                                    ExperimentConfig, GRUConfig, MeshConfig,
                                    ModelConfig, TrainConfig, WindowConfig)
from m3f.pytorch_tpu.data.synthetic import SyntheticAVDataset
from m3f.pytorch_tpu.train.loop import Trainer


def tiny_cfg() -> ExperimentConfig:
    return ExperimentConfig(
        name="ensemble",
        model=ModelConfig(
            use_audio=True, use_video=False,
            audio=AudioNetConfig(channels=(4, 8), feature_dim=8),
            gru=GRUConfig(hidden_size=8),
        ),
        window=WindowConfig(windows_per_clip=2, eval_stride=8),
        data=DataConfig(synthetic_num_videos=2, synthetic_video_frames=64,
                        image_size=16),
        train=TrainConfig(batch_size=2, mesh=MeshConfig(num_data=1)),
    )


@pytest.fixture(scope="module")
def rig():
    cfg = tiny_cfg()
    tr = Trainer(cfg)
    ds = SyntheticAVDataset(cfg.data, cfg.model.mel)
    a = tr.init_state(seed=0)
    b = tr.init_state(seed=1)
    return cfg, tr, ds, a, b


def test_singleton_and_duplicate_match_single_model(rig):
    cfg, tr, ds, a, _ = rig
    video = ds.load_video(ds.video_ids()[0])
    single = tr.evaluate_video(a, video)["pred"]
    np.testing.assert_array_equal(tr.predict_ensemble([a], video), single)
    np.testing.assert_array_equal(tr.predict_ensemble([a, a], video), single)


def test_pair_is_the_per_frame_mean(rig):
    cfg, tr, ds, a, b = rig
    video = ds.load_video(ds.video_ids()[0])
    pa = tr.evaluate_video(a, video)["pred"]
    pb = tr.evaluate_video(b, video)["pred"]
    ens = tr.predict_ensemble([a, b], video)
    np.testing.assert_allclose(
        ens, np.mean([pa, pb], axis=0, dtype=np.float64).astype(np.float32),
        rtol=0, atol=0)
    assert not np.array_equal(ens, pa) and not np.array_equal(ens, pb)


def test_evaluate_ensemble_scores_the_mean_track(rig):
    cfg, tr, ds, a, b = rig
    res = tr.evaluate_ensemble([a, b], ds)
    assert res["n_models"] == 2
    for k in ("ccc_v", "ccc_a", "ccc_mean", "pooled_ccc_v", "pooled_ccc_a",
              "pooled_ccc_mean", "ccc_select"):
        assert np.isfinite(res[k]), k
    # scoring the mean track, not averaging the scores
    ra = tr.evaluate(a, ds)
    rb = tr.evaluate(b, ds)
    assert res["ccc_mean"] != pytest.approx(
        (ra["ccc_mean"] + rb["ccc_mean"]) / 2, abs=1e-12)
    # rows drain through per_video_fn like evaluate()
    rows = []
    tr.evaluate_ensemble([a, b], ds, max_videos=1,
                         per_video_fn=lambda vid, r: rows.append((vid, r)))
    assert len(rows) == 1 and rows[0][1]["pred"].shape[1] == 2


def test_blank_checkpoint_list_fails_loudly(rig):
    # "--checkpoint ," splits to zero paths; must be a clear error, not an
    # IndexError on states[0] (round-4 review)
    from m3f.pytorch_tpu.main import _load_states
    _, tr, _, _, _ = rig
    with pytest.raises(SystemExit, match="no checkpoint paths"):
        _load_states(tr, " , ")


def test_ensemble_states_are_eval_only(rig, tmp_path):
    # k ensemble members must not pin k sets of Adam moments / ema aliases
    # on device (round-4 review)
    import jax
    from m3f.pytorch_tpu.main import _load_states
    from m3f.pytorch_tpu.train.checkpoint import Checkpointer
    cfg, tr, ds, a, b = rig
    ck = Checkpointer(str(tmp_path / "m"), keep=2, cfg=cfg)
    ck.save(jax.device_get(a))
    states = _load_states(tr, ck._path(0))
    assert states[0].opt_state is None and states[0].ema is None
    video = ds.load_video(ds.video_ids()[0])
    np.testing.assert_array_equal(tr.predict_ensemble(states, video),
                                  tr.evaluate_video(a, video)["pred"])


def test_cli_comma_syntax(rig, tmp_path, capsys):
    import jax
    from m3f.pytorch_tpu.main import main
    from m3f.pytorch_tpu.train.checkpoint import Checkpointer
    cfg, tr, ds, a, b = rig
    pa = Checkpointer(str(tmp_path / "a"), keep=1, cfg=cfg)
    pa.save(jax.device_get(a))
    pb = Checkpointer(str(tmp_path / "b"), keep=1, cfg=cfg)
    pb.save(jax.device_get(b))
    ckpts = f"{pa._path(0)},{pb._path(0)}"
    over = ["data.synthetic=true", "data.synthetic_num_videos=2",
            "data.synthetic_video_frames=64", "data.image_size=16",
            "model.use_video=false", "model.audio.channels=[4,8]",
            "model.audio.feature_dim=8", "model.gru.hidden_size=8",
            "window.windows_per_clip=2", "window.eval_stride=8"]
    assert main(["eval", "--preset", "audio_only", "--checkpoint", ckpts,
                 "--max-videos", "1"] + over) == 0
    out = [l for l in capsys.readouterr().out.splitlines()
           if l.startswith("{")]
    res = json.loads(out[-1])
    assert res["n_models"] == 2

    sub = tmp_path / "sub"
    assert main(["predict", "--preset", "audio_only", "--checkpoint", ckpts,
                 "--max-videos", "1", "--out", str(sub)] + over) == 0
    txts = list(sub.glob("*.txt"))
    assert len(txts) == 1
    # the written rows are the ensemble track (the writer interpolates
    # INVALID frames, so compare the valid rows only)
    video = ds.load_video(ds.video_ids()[0])
    want = tr.predict_ensemble([a, b], video)
    got = np.loadtxt(txts[0], delimiter=",", skiprows=1)
    assert got.shape == want.shape
    valid = np.asarray(video["valid"], bool)
    np.testing.assert_allclose(got[valid], np.clip(want, -1, 1)[valid],
                               atol=5e-4)
