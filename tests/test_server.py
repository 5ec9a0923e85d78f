"""HTTP serving frontend (infer/server.py, `m3f serve`)."""

import io
import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from m3f.pytorch_tpu.config import apply_overrides
from m3f.pytorch_tpu.infer import Predictor
from m3f.pytorch_tpu.infer.server import PredictServer

from test_predictor import _wav, tiny_cfg


@pytest.fixture(scope="module")
def server():
    cfg = apply_overrides(tiny_cfg(use_video=False),
                          {"train.mesh.num_data": 1})
    p = Predictor(cfg=cfg)
    srv = PredictServer(p, port=0)  # OS-assigned port
    srv.start_background()
    yield p, f"http://127.0.0.1:{srv.port}"
    srv.shutdown()


def _post(url, body, headers=None):
    req = urllib.request.Request(url, data=body, headers=headers or {})
    return urllib.request.urlopen(req, timeout=120)


def test_healthz(server):
    _, base = server
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        h = json.load(r)
    assert h["ok"] and h["uses_audio"] and not h["uses_video"]
    assert h["sample_rate"] == 16_000


def test_predict_matches_inprocess(server):
    p, base = server
    wav = _wav(30, p.cfg, seed=4)
    want = p.predict_video(waveform=wav)["pred"]

    buf = io.BytesIO()
    np.savez(buf, waveform=wav)
    with _post(base + "/predict", buf.getvalue()) as r:
        pred = np.asarray(json.load(r)["pred"], np.float32)
    np.testing.assert_allclose(pred, want, rtol=1e-5, atol=1e-6)

    # binary response path
    with _post(base + "/predict", buf.getvalue(),
               {"Accept": "application/x-npy"}) as r:
        pred2 = np.load(io.BytesIO(r.read()))
    np.testing.assert_allclose(pred2, want, rtol=1e-5, atol=1e-6)

    # smoothing via query param == smooth_window in-process
    want_s = p.predict_video(waveform=wav, smooth_window=5)["pred"]
    with _post(base + "/predict?smooth=5", buf.getvalue()) as r:
        pred3 = np.asarray(json.load(r)["pred"], np.float32)
    np.testing.assert_allclose(pred3, want_s, rtol=1e-5, atol=1e-6)


def test_client_errors_are_400s(server):
    _, base = server
    # garbage body
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/predict", b"not an npz")
    assert e.value.code == 400
    assert "npz" in json.load(e.value)["error"]
    # missing required modality (audio model, no waveform)
    buf = io.BytesIO()
    np.savez(buf, frames=np.zeros((4, 8, 8, 3), np.uint8))
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/predict", buf.getvalue())
    assert e.value.code == 400
    # unknown path
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/nope", b"x")
    assert e.value.code == 404


def test_stream_endpoints_match_offline(server):
    p, base = server
    wav = _wav(30, p.cfg, seed=11)
    want = p.predict_video(waveform=wav)["pred"]

    with _post(base + "/stream/open", b"") as r:
        o = json.load(r)
    sid = o["id"]
    assert o["latency_frames"] > 0
    got = []
    for i in range(0, len(wav), 9000):
        buf = io.BytesIO()
        np.savez(buf, waveform=wav[i:i + 9000])
        with _post(f"{base}/stream/{sid}/push", buf.getvalue()) as r:
            out = json.load(r)
        assert out["start"] == sum(len(g) for g in got)
        got.append(out["pred"])
    with _post(f"{base}/stream/{sid}/flush", b"") as r:
        got.append(json.load(r)["pred"])
    pred = np.concatenate([np.asarray(g, np.float32).reshape(-1, 2)
                           for g in got])
    np.testing.assert_allclose(pred, want, rtol=1e-5, atol=1e-5)

    # flushed stream is gone
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{base}/stream/{sid}/push", b"")
    assert e.value.code == 404


def test_concurrent_streams_micro_batched(server):
    """Concurrent pushes from several live streams go through the
    SessionGroup micro-batcher and still reproduce offline exactly."""
    import threading

    p, base = server
    n_streams = 3
    wavs = [_wav(24 + 6 * i, p.cfg, seed=20 + i) for i in range(n_streams)]
    want = [p.predict_video(waveform=w)["pred"] for w in wavs]
    sids = []
    for _ in range(n_streams):
        with _post(base + "/stream/open", b"") as r:
            sids.append(json.load(r)["id"])

    results = [[] for _ in range(n_streams)]
    errs = []

    def run(i):
        try:
            for j in range(0, len(wavs[i]), 8000):
                buf = io.BytesIO()
                np.savez(buf, waveform=wavs[i][j:j + 8000])
                with _post(f"{base}/stream/{sids[i]}/push",
                           buf.getvalue()) as r:
                    results[i].append(json.load(r)["pred"])
            with _post(f"{base}/stream/{sids[i]}/flush", b"") as r:
                results[i].append(json.load(r)["pred"])
        except Exception as e:  # surface thread failures in the test
            errs.append((i, e))

    threads = [threading.Thread(target=run, args=(i,))
               for i in range(n_streams)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errs, errs
    for i in range(n_streams):
        pred = np.concatenate([np.asarray(g, np.float32).reshape(-1, 2)
                               for g in results[i]])
        np.testing.assert_allclose(pred, want[i], rtol=1e-5, atol=1e-5,
                                   err_msg=f"stream {i}")
