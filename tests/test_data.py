"""Synthetic dataset, windowing, and batch schema tests (SURVEY §4)."""

import numpy as np
import pytest

from m3f.pytorch_tpu.config import (DataConfig, INVALID_LABEL, MelConfig,
                                    WindowConfig)
from m3f.pytorch_tpu.data.synthetic import SyntheticAVDataset
from m3f.pytorch_tpu.data.windowing import (WindowSequencer, batch_examples,
                                            example_stream, samples_per_window)


DATA = DataConfig(synthetic_num_videos=2, synthetic_video_frames=96, image_size=32)
MEL = MelConfig()
WIN = WindowConfig()


def test_synthetic_schema():
    ds = SyntheticAVDataset(DATA, MEL)
    v = ds.load_video(ds.video_ids()[0])
    n = DATA.synthetic_video_frames
    assert v["frames"].shape == (n, 32, 32, 3) and v["frames"].dtype == np.uint8
    assert v["labels"].shape == (n, 2)
    assert v["valid"].shape == (n,)
    assert len(v["waveform"]) == int(round(n / 30.0 * MEL.sample_rate))
    # labels valid range or INVALID
    lab = v["labels"][v["valid"]]
    assert (np.abs(lab) <= 1.0).all()
    assert (v["labels"][~v["valid"]] == INVALID_LABEL).all()
    # deterministic
    v2 = ds.load_video(ds.video_ids()[0])
    np.testing.assert_array_equal(v["frames"], v2["frames"])


def test_synthetic_uint8_path_matches_float_reference():
    """The uint8-only frame synthesis (round-4 host-pipeline fix) must stay
    BITWISE identical to the original float32 round-trip it replaced:
    base is integer so floor(base + b) == base + floor(b), and the sum is
    provably < 256 so the uint8 add cannot wrap."""
    ds = SyntheticAVDataset(DATA, MEL)
    for vid in ds.video_ids():
        idx = int(vid.split("_")[-1])
        rng = np.random.RandomState(ds.seed * 10_007 + idx)
        n = ds.frames_per_video
        t_frame = np.arange(n) / DATA.fps
        fv, fa = rng.uniform(0.05, 0.2, 2)
        pv, pa = rng.uniform(0, 2 * np.pi, 2)
        valence = 0.9 * np.sin(2 * np.pi * fv * t_frame + pv)
        base = rng.randint(0, 64, (n, ds.size, ds.size, 3), dtype=np.uint8)
        brightness = ((valence + 1.0) * 0.5 * 160.0)[:, None, None, None]
        ref = (base.astype(np.float32) + brightness).astype(np.uint8)
        np.testing.assert_array_equal(ds.load_video(vid)["frames"], ref)


def test_synthetic_memo_cache_exact_and_isolated():
    """The memo cache returns arrays equal to fresh generation, and a caller
    adding keys to the returned dict must not corrupt the cached entry."""
    cached = SyntheticAVDataset(DATA, MEL)
    fresh = SyntheticAVDataset(DATA, MEL, cache=False)
    vid = cached.video_ids()[0]
    v1 = cached.load_video(vid)
    v1["fps"] = 25.0  # what Predictor-style callers do to THEIR dict
    v2 = cached.load_video(vid)
    assert "fps" not in v2
    vf = fresh.load_video(vid)
    for k in vf:
        np.testing.assert_array_equal(v2[k], vf[k])


def test_window_sequencer_shapes_per_frame():
    """Default (per_frame=True): per-frame labels [W, L, 2] + mask [W, L]."""
    ds = SyntheticAVDataset(DATA, MEL)
    v = ds.load_video("synth_0000")
    seq = WindowSequencer(WIN, MEL)
    ex = seq.cut(v, 0)
    W, L = WIN.windows_per_clip, WIN.window_frames
    assert ex["video"].shape == (W, L, 32, 32, 3)
    assert ex["wav"].shape == (W, samples_per_window(MEL, 16))
    assert ex["labels"].shape == (W, L, 2)
    assert ex["mask"].shape == (W, L)
    # per-frame labels/mask are exact slices of the video timeline
    np.testing.assert_array_equal(ex["labels"][0], v["labels"][:L])
    np.testing.assert_array_equal(ex["mask"][0], v["valid"][:L])
    np.testing.assert_array_equal(ex["labels"][1],
                                  v["labels"][WIN.train_stride:WIN.train_stride + L])


def test_window_sequencer_shapes_per_window():
    ds = SyntheticAVDataset(DATA, MEL)
    v = ds.load_video("synth_0000")
    seq = WindowSequencer(WIN, MEL, per_frame=False)
    ex = seq.cut(v, 0)
    W, L = WIN.windows_per_clip, WIN.window_frames
    assert ex["labels"].shape == (W, 2)
    assert ex["mask"].shape == (W,)
    # window labels are means of valid frame labels
    w0 = v["labels"][:L][v["valid"][:L]]
    np.testing.assert_allclose(ex["labels"][0], w0.mean(axis=0), rtol=1e-5)


def test_mel_frames_per_window_exact():
    # samples_per_window must yield exactly mel_frames frames from the frontend
    import jax.numpy as jnp
    from m3f.pytorch_tpu.ops.melspec import log_mel_spectrogram
    spw = samples_per_window(MEL, 16)
    wav = jnp.zeros((2, spw))
    mel = log_mel_spectrogram(wav, MEL)
    assert mel.shape == (2, 16, MEL.n_mels)


def test_example_stream_batching():
    ds = SyntheticAVDataset(DATA, MEL)
    seq = WindowSequencer(WIN, MEL)
    it = example_stream(ds, seq, batch_size=3, seed=0)
    b = next(it)
    assert b["video"].shape[0] == 3
    assert b["labels"].shape == (3, WIN.windows_per_clip, WIN.window_frames, 2)
    b2 = next(it)
    assert not np.array_equal(b["video"], b2["video"])


def test_shuffle_buffer_mixes_and_preserves_examples():
    ds = SyntheticAVDataset(DATA, MEL)
    seq = WindowSequencer(WIN, MEL)
    # finite stream: same multiset of labels with and without buffer
    def collect(buf):
        out = []
        for b in example_stream(ds, seq, batch_size=1, seed=0, loop=False,
                                shuffle_buffer=buf):
            out.append(b["labels"].tobytes())
        return out
    plain = collect(0)
    mixed = collect(64)
    assert sorted(plain) == sorted(mixed)
    assert len(plain) == len(mixed)


def test_example_starts_respect_bounds():
    seq = WindowSequencer(WIN, MEL)
    starts = seq.example_starts(200)
    span = seq.frames_per_example
    assert all(s + span <= 200 for s in starts)
    assert seq.example_starts(span - 1) == []
