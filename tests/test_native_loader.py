"""Native C++ JPEG loader vs cv2 parity + prefetcher semantics."""

import numpy as np
import pytest

from m3f.pytorch_tpu.data import native_loader as nl


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    import cv2
    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.RandomState(0)
    paths = []
    for i, size in enumerate([(112, 112), (112, 112), (64, 80)]):
        img = rng.randint(0, 256, size + (3,), dtype=np.uint8)
        p = str(d / f"{i:05d}.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(p)
    return paths


def test_native_lib_builds_and_loads():
    assert nl.native_available(), (
        "native loader not built — run: make -C native/loader")


def test_native_vs_cv2_decode(jpeg_dir):
    import cv2
    out_n, ok_n = nl.decode_jpeg_batch(jpeg_dir, 112)
    assert ok_n.all()
    for i, p in enumerate(jpeg_dir):
        img = cv2.imread(p, cv2.IMREAD_COLOR)
        if img.shape[:2] != (112, 112):
            img = cv2.resize(img, (112, 112), interpolation=cv2.INTER_LINEAR)
        want = img[..., ::-1]
        # same JPEG decoder family; resize is matched-convention bilinear.
        # allow ±2 LSB for IDCT/rounding differences
        diff = np.abs(out_n[i].astype(int) - want.astype(int))
        assert diff.max() <= 2, f"frame {i}: max abs diff {diff.max()}"


def test_missing_file_masked(jpeg_dir):
    paths = [jpeg_dir[0], "/nonexistent/x.jpg", jpeg_dir[1]]
    out, ok = nl.decode_jpeg_batch(paths, 112)
    assert ok.tolist() == [True, False, True]
    assert (out[1] == 0).all()


def test_corrupt_jpeg_masked(tmp_path, jpeg_dir):
    corrupt = str(tmp_path / "bad.jpg")
    with open(corrupt, "wb") as f:
        f.write(b"\xff\xd8\xff\xe0not really a jpeg")
    truncated = str(tmp_path / "trunc.jpg")
    with open(truncated, "wb") as f:
        f.write(open(jpeg_dir[0], "rb").read()[:200])
    out, ok = nl.decode_jpeg_batch([jpeg_dir[0], corrupt, truncated], 112)
    assert ok[0] and not ok[1]
    assert (out[1] == 0).all()
    # a truncated file may decode partially or fail — either way no crash,
    # and a hard failure must be flagged
    if not ok[2]:
        assert (out[2] == 0).all()


def test_prefetcher_order_and_exception():
    pf = nl.Prefetcher(iter(range(5)), depth=2)
    assert list(pf) == [0, 1, 2, 3, 4]

    def boom():
        yield 1
        raise RuntimeError("decode failed")

    pf = nl.Prefetcher(boom(), depth=2)
    assert next(pf) == 1
    with pytest.raises(RuntimeError):
        next(pf)
        next(pf)


def test_prefetcher_close_unblocks_producer():
    """close() must stop a producer blocked on the full queue (an endless
    stream whose consumer quit early — every `m3f train` fit()) instead of
    leaving the thread pinned with `depth` buffered batches for process
    life; the thread must actually exit and iteration must end."""
    import itertools
    import time

    started = time.time()
    pf = nl.Prefetcher(itertools.count(), depth=2)
    assert next(pf) == 0
    # producer is now parked on a full queue (give it a tick to fill)
    time.sleep(0.05)
    pf.close()
    assert not pf._thread.is_alive(), "producer thread still running"
    with pytest.raises(StopIteration):
        next(pf)
    pf.close()   # idempotent
    assert time.time() - started < 5.0


def test_prefetcher_close_after_exhaustion():
    pf = nl.Prefetcher(iter([1, 2]), depth=2)
    assert list(pf) == [1, 2]
    pf.close()
    assert not pf._thread.is_alive()


def test_fit_closes_factory_stream(tmp_path):
    """fit() owns streams it built from the factory form and must close()
    them on exit; caller-supplied iterators stay untouched."""
    from m3f.pytorch_tpu.data.synthetic import SyntheticAVDataset
    from m3f.pytorch_tpu.data.windowing import WindowSequencer, example_stream
    from m3f.pytorch_tpu.train.loop import Trainer
    from test_train_integration import tiny_audio_cfg

    cfg = tiny_audio_cfg(num_steps=2, ckpt_dir=str(tmp_path))
    tr = Trainer(cfg)
    ds = SyntheticAVDataset(cfg.data, cfg.model.mel)
    seq = WindowSequencer(cfg.window, cfg.model.mel,
                          mel_frames=cfg.model.audio.mel_frames_per_window)
    made = []

    def factory(skip_batches: int = 0):
        pf = nl.Prefetcher(example_stream(ds, seq, cfg.train.batch_size,
                                          seed=0, skip_batches=skip_batches),
                           depth=2)
        made.append(pf)
        return pf

    state, _ = tr.fit(factory, log=lambda s: None)
    assert int(state.step) == 2
    assert len(made) == 1
    assert made[0]._stop and not made[0]._thread.is_alive()


def test_degenerate_tiny_sources(tmp_path):
    """1-pixel-wide/tall sources must not read out of bounds in the bilinear
    resize (ADVICE r1: p10/p01 dereferenced past the buffer when sh/sw == 1;
    neighbors are clamped now)."""
    import cv2
    paths = []
    rng = np.random.RandomState(7)
    for i, size in enumerate([(1, 64), (64, 1), (1, 1), (2, 2)]):
        img = rng.randint(0, 256, size + (3,), dtype=np.uint8)
        p = str(tmp_path / f"tiny{i}.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 100])
        paths.append(p)
    out, ok = nl.decode_jpeg_batch(paths, 16)
    assert ok.all()
    assert out.shape == (4, 16, 16, 3)
    assert np.isfinite(out.astype(np.float64)).all()
