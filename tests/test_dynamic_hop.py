"""Per-video mel hop: the intra-window audio time base (VERDICT r4 missing #1).

The reference precomputed each video's mel with hop aligned to THAT video's
frame rate (SURVEY §2.1 C3 "hop aligned ... with video frames"), so mel
frame j of a window tracked video frame j exactly. A fixed nominal hop keeps
window STARTS aligned (fixed in r3) but time-warps frames WITHIN the window:
at 25 fps the 16 mel frames cover 0.50 s while the 16 video frames span
0.64 s — ~1/5 of the window off by its end. The dynamic-hop paths feed each
example hop = round(sample_rate / fps) as DATA (static max-hop buffer, index
computation traced), so ONE compiled program covers every rate.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from m3f.pytorch_tpu.config import (AudioNetConfig, ExperimentConfig,
                                    GRUConfig, MelConfig, MeshConfig,
                                    ModelConfig, TrainConfig, WindowConfig)
from m3f.pytorch_tpu.data.windowing import (WindowSequencer, batch_examples,
                                            needs_dynamic_hop,
                                            samples_per_window,
                                            samples_per_window_max)
from m3f.pytorch_tpu.ops.melspec import log_mel_spectrogram

F = 16        # mel frames per window
SR = 16_000


def test_hop_for_fps_values():
    mel = MelConfig()
    assert mel.hop_for_fps(30.0) == mel.hop_length == 533   # nominal: pinned
    assert mel.hop_for_fps(25.0) == 640
    assert mel.hop_for_fps(24.0) == 667
    assert mel.hop_for_fps(30000.0 / 1001.0) == 534         # NTSC 29.97
    assert mel.hop_for_fps(60.0) == 267
    # sub-floor rates clamp to the buffer bound (bounded residual warp)
    assert mel.hop_for_fps(12.0) == mel.max_hop_length == 667


@pytest.mark.parametrize("fps", [24.0, 25.0, 30000.0 / 1001.0, 30.0, 60.0])
def test_mel_frame_video_frame_correspondence_within_half_hop(fps):
    """VERDICT r4 'done' criterion: with the per-video hop, mel frame j of
    ANY window lands within half a hop of video frame j's true sample time,
    across the WHOLE window, at every canonical rate."""
    mel = MelConfig()
    hop = mel.hop_for_fps(fps)
    for fs in range(0, 5000, 7):                 # window start frames
        ss = round(fs / fps * SR)                # hop-aware window offset
        j = np.arange(F)
        mel_centers = ss + j * hop
        frame_times = (fs + j) * SR / fps
        assert np.max(np.abs(mel_centers - frame_times)) <= hop / 2, fps


def test_fixed_hop_demonstrably_warps_at_25fps():
    """The OLD fixed-hop path: by the window's last frame the mel center is
    ~2.5 hops away from the video frame it is upsampled onto."""
    mel = MelConfig()
    fs = 100
    ss = round(fs / 25.0 * SR)
    j = np.arange(F)
    mel_centers = ss + j * mel.hop_length        # fixed 533
    frame_times = (fs + j) * SR / 25.0
    err = np.abs(mel_centers - frame_times)
    assert err[-1] > 2 * mel.hop_for_fps(25.0)   # > two true hops off
    assert err[-1] > mel.hop_length / 2          # fails the criterion


def test_dynamic_frontend_matches_static_at_nominal_hop():
    """hop == cfg.hop_length gathers bitwise the same samples (index-space
    reflection == jnp.pad reflection), so the mel is identical."""
    mel = MelConfig()
    spw = samples_per_window(mel, F)
    buf = samples_per_window_max(mel, F)
    rng = np.random.RandomState(0)
    wav = rng.randn(3, spw).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(wav), mel))
    padded = np.pad(wav, ((0, 0), (0, buf - spw)))
    dyn = np.asarray(log_mel_spectrogram(
        jnp.asarray(padded), mel,
        hop=jnp.full((3,), mel.hop_length, jnp.int32), n_frames_out=F))
    np.testing.assert_array_equal(ref, dyn)


@pytest.mark.parametrize("hop", [640, 667, 534, 267])
def test_dynamic_frontend_matches_per_hop_static_config(hop):
    """Dynamic hop h == a static frontend CONFIGURED with hop_length=h on an
    exactly-(F−1)·h-wide buffer — the per-video-precompute oracle."""
    mel = MelConfig()
    mel_h = dataclasses.replace(mel, hop_length=hop)
    spw = (F - 1) * hop
    buf = samples_per_window_max(mel, F)
    rng = np.random.RandomState(1)
    wav = rng.randn(2, spw).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(wav), mel_h))
    assert ref.shape == (2, F, mel.n_mels)
    dyn = np.asarray(log_mel_spectrogram(
        jnp.asarray(np.pad(wav, ((0, 0), (0, buf - spw)))), mel,
        hop=jnp.full((2,), hop, jnp.int32), n_frames_out=F))
    np.testing.assert_array_equal(ref, dyn)


def test_dynamic_frontend_never_reads_buffer_tail():
    """Samples past the per-example span (F−1)·hop must not leak into the
    mel — the reflection folds every index back inside the window."""
    mel = MelConfig()
    hop = 640
    spw, buf = (F - 1) * hop, samples_per_window_max(mel, F)
    rng = np.random.RandomState(2)
    wav = rng.randn(1, buf).astype(np.float32)
    poisoned = wav.copy()
    poisoned[:, spw:] = 1e6                       # garbage in the tail
    h = jnp.full((1,), hop, jnp.int32)
    a = np.asarray(log_mel_spectrogram(jnp.asarray(wav), mel, hop=h,
                                       n_frames_out=F))
    b = np.asarray(log_mel_spectrogram(jnp.asarray(poisoned), mel, hop=h,
                                       n_frames_out=F))
    np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# sequencer + train step
# ---------------------------------------------------------------------------

def _tiny_cfg(**train_kw) -> ExperimentConfig:
    return ExperimentConfig(
        name="tiny_hop",
        model=ModelConfig(
            use_audio=True, use_video=False,
            audio=AudioNetConfig(channels=(4, 8), feature_dim=8),
            gru=GRUConfig(hidden_size=8),
            compute_dtype="float32",
        ),
        window=WindowConfig(windows_per_clip=2),
        train=TrainConfig(batch_size=2, mesh=MeshConfig(num_data=2),
                          **train_kw),
    )


def _video(fps: float, n_frames: int = 80, seed: int = 0):
    rng = np.random.RandomState(seed)
    n_samples = int(round(n_frames / fps * SR))
    return {
        "frames": rng.randint(0, 255, (n_frames, 8, 8, 3), np.uint8),
        "waveform": rng.randn(n_samples).astype(np.float32),
        "labels": rng.uniform(-1, 1, (n_frames, 2)).astype(np.float32),
        "valid": np.ones(n_frames, bool),
        "fps": fps,
    }


def test_sequencer_hop_aware_cut():
    cfg = _tiny_cfg()
    mel = cfg.model.mel
    seq = WindowSequencer(cfg.window, mel, hop_aware=True)
    leg = WindowSequencer(cfg.window, mel)
    buf = samples_per_window_max(mel, F)
    spw = samples_per_window(mel, F)

    v25 = _video(25.0)
    ex = seq.cut(v25, 0)
    assert ex["wav"].shape == (2, buf)
    assert int(ex["hop"]) == 640
    # window 1 starts at frame 16 → sample round(16/25·16000); real span
    # (F−1)·640, zero beyond
    ss = round(16 / 25.0 * SR)
    np.testing.assert_array_equal(ex["wav"][1][: (F - 1) * 640],
                                  v25["waveform"][ss:ss + (F - 1) * 640])
    np.testing.assert_array_equal(ex["wav"][:, (F - 1) * 640:], 0.0)

    # nominal-rate video: hop-aware emits the legacy samples, just padded
    v30 = _video(30.0)
    ex30, leg30 = seq.cut(v30, 0), leg.cut(v30, 0)
    assert int(ex30["hop"]) == mel.hop_length
    np.testing.assert_array_equal(ex30["wav"][:, :spw], leg30["wav"])
    np.testing.assert_array_equal(ex30["wav"][:, spw:], 0.0)
    assert "hop" not in leg30


def test_mixed_rate_batch_trains_in_one_compile():
    """A batch mixing 30/25 fps examples runs the ONE dynamic program; a
    second batch with different hop VALUES must not retrace (hop is data,
    not shape) — the compile-bucket criterion from VERDICT r4 #1."""
    from m3f.pytorch_tpu.parallel.mesh import shard_batch
    from m3f.pytorch_tpu.train.loop import Trainer

    cfg = _tiny_cfg()
    trainer = Trainer(cfg)
    seq = WindowSequencer(cfg.window, cfg.model.mel, hop_aware=True)
    state = trainer.init_state()
    step = trainer.make_train_step()

    batch = batch_examples([seq.cut(_video(30.0), 0),
                            seq.cut(_video(25.0, seed=1), 0)])
    assert batch["hop"].tolist() == [533, 640]
    state, m1 = step(state, shard_batch(trainer.mesh, batch))
    assert np.isfinite(float(m1["loss"]))

    batch2 = batch_examples([seq.cut(_video(24.0, seed=2), 0),
                             seq.cut(_video(60.0, seed=3), 0)])
    assert batch2["hop"].tolist() == [667, 267]
    state, m2 = step(state, shard_batch(trainer.mesh, batch2))
    assert np.isfinite(float(m2["loss"]))
    assert step._cache_size() == 1, "hop values must not retrace"


def test_needs_dynamic_hop_probe():
    class DS:
        def __init__(self, rates):
            self._rates = rates

        def video_ids(self):
            return list(range(len(self._rates)))

        def video_fps(self, vid):
            return self._rates[vid]

    mel = MelConfig()
    assert not needs_dynamic_hop(DS([30.0, 30.0]), mel, 30.0)
    assert needs_dynamic_hop(DS([30.0, 25.0]), mel, 30.0)
    # rates whose hop rounds to the nominal hop stay on the static path
    assert not needs_dynamic_hop(DS([30.01]), mel, 30.0)
    assert not needs_dynamic_hop(object(), mel, 30.0)  # no protocol


# ---------------------------------------------------------------------------
# end-to-end eval: dynamic path == a config NATIVELY clocked at that rate
# ---------------------------------------------------------------------------

def test_eval_dynamic_hop_matches_native_rate_config():
    """A 25 fps video through the default (30 fps-nominal) config's dynamic
    path must predict EXACTLY what a config with data.fps=25 and
    hop_length=640 (the legacy static path, i.e. the reference's per-video
    precompute) predicts — same params, same windows, same samples."""
    from m3f.pytorch_tpu.train.loop import Trainer

    cfg30 = _tiny_cfg()
    cfg25 = cfg30.replace(
        model=dataclasses.replace(
            cfg30.model,
            mel=dataclasses.replace(cfg30.model.mel, hop_length=640)),
        data=dataclasses.replace(cfg30.data, fps=25.0))
    t30, t25 = Trainer(cfg30), Trainer(cfg25)
    s30, s25 = t30.init_state(), t25.init_state()
    for a, b in zip(jax.tree.leaves(s30.params), jax.tree.leaves(s25.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    video = _video(25.0, n_frames=60)
    r_dyn = t30.evaluate_video(s30, video)          # off-rate → dynamic hop
    native = dict(video)
    native.pop("fps")                               # 25 IS cfg25's nominal
    r_nat = t25.evaluate_video(s25, native)         # → legacy static path
    np.testing.assert_array_equal(r_dyn["pred"], r_nat["pred"])
    assert r_dyn["ccc_v"] == pytest.approx(r_nat["ccc_v"], abs=1e-7)


def test_streaming_off_rate_session_matches_offline():
    """A 25 fps streaming session (dynamic hop) must emit exactly the
    offline dynamic-path predictions — the offline-equality contract that
    already holds for nominal-rate sessions."""
    from m3f.pytorch_tpu.infer.predictor import Predictor

    cfg = _tiny_cfg()
    p = Predictor(cfg=cfg)
    video = _video(25.0, n_frames=60, seed=4)
    offline = p.predict_video(waveform=video["waveform"], fps=25.0)["pred"]

    sess = p.stream(fps=25.0)
    assert sess.dynamic_hop and sess.hop == 640
    chunks = np.array_split(video["waveform"], 7)
    got = []
    for c in chunks:
        _, preds = sess.push(waveform=c)
        got.append(preds)
    _, preds = sess.flush()
    got.append(preds)
    got = np.concatenate(got)
    np.testing.assert_allclose(got, offline, atol=1e-6)


def test_session_group_mixed_rates_match_inline():
    """One tick batching a 30 fps and a 25 fps session: each schema batches
    separately, and per-session results equal the inline (unbatched) path."""
    from m3f.pytorch_tpu.infer.predictor import Predictor, SessionGroup

    cfg = _tiny_cfg()
    p = Predictor(cfg=cfg)
    wav30 = _video(30.0, n_frames=60, seed=5)["waveform"]
    wav25 = _video(25.0, n_frames=60, seed=6)["waveform"]

    # inline reference
    ref = {}
    for fps, wav in ((30.0, wav30), (25.0, wav25)):
        s = p.stream(fps=fps)
        _, a = s.push(waveform=wav)
        _, b = s.flush()
        ref[fps] = np.concatenate([a, b])

    group = SessionGroup(p)
    s30, s25 = group.open(), group.open(fps=25.0)
    outs = group.push_many({s30: {"waveform": wav30},
                            s25: {"waveform": wav25}})
    tails = {s30: 30.0, s25: 25.0}
    for sess, fps in tails.items():
        got = np.concatenate([outs[sess][1], sess.flush()[1]])
        np.testing.assert_allclose(got, ref[fps], atol=1e-5)


def test_hop_plan_is_the_single_derivation():
    """ModelConfig.hop_plan is THE derivation every consumer (train
    windowing gate, eval dispatches, streaming sessions, warmup filters)
    routes through: (hop, dynamic, spw, spw_buf)."""
    m = ModelConfig()
    hop, dyn, spw, buf = m.hop_plan(25.0, 30.0)
    assert (hop, dyn) == (640, True)
    assert spw == (m.audio.mel_frames_per_window - 1) * 640
    assert buf == samples_per_window_max(m.mel, m.audio.mel_frames_per_window)
    hop, dyn, spw, buf = m.hop_plan(30.0, 30.0)
    assert (hop, dyn) == (m.mel.hop_length, False)
    assert spw == buf == samples_per_window(m.mel,
                                            m.audio.mel_frames_per_window)
    # audio-less models trivially plan the fixed hop — nothing reads it
    assert ModelConfig(use_audio=False).hop_plan(25.0, 30.0)[1] is False


def test_hop_plan_pallas_backend_keeps_fixed_hop():
    """mel_backend='pallas' frames at a compile-time stride and REJECTS a
    traced hop (models/m3f.py raises at trace time) — the plan must fall
    back to the fixed nominal hop (the bounded-warp pre-dynamic behavior)
    so off-rate data on a pallas config keeps working instead of crashing
    (round-5 review finding)."""
    m = ModelConfig(mel_backend="pallas")
    hop, dyn, spw, buf = m.hop_plan(25.0, 30.0)
    assert (hop, dyn) == (m.mel.hop_length, False)
    assert spw == buf == samples_per_window(m.mel,
                                            m.audio.mel_frames_per_window)


def test_streaming_session_pallas_backend_never_goes_dynamic():
    """An off-rate streaming session on a pallas-frontend predictor plans
    the FIXED hop (no traced hop reaches the model, which would raise
    NotImplementedError on the first completed window group)."""
    from m3f.pytorch_tpu.infer.predictor import Predictor

    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, mel_backend="pallas"))
    sess = Predictor(cfg=cfg).stream(fps=25.0)
    assert not sess.dynamic_hop
    assert sess.hop == cfg.model.mel.hop_length
    assert sess.spw == sess.spw_buf
