"""Hot weight reload (Predictor.reload + POST /reload) and checkpoint-load
device residency (round 4).

Properties:
1. checkpoint-loaded Predictor state is DEVICE-resident (jax.Array leaves)
   — host-numpy leaves would re-upload the whole parameter set on every
   jitted dispatch (Trainer.commit_state docstring);
2. reload(ckpt_b) serves exactly what a fresh Predictor(ckpt_b) serves,
   reusing the already-compiled buckets;
3. a failed reload (missing file / architecture mismatch) leaves the old
   weights serving untouched;
4. HTTP: /reload is 403 unless the server opted in, 200 + changed
   predictions when enabled, 400 on bad path/body; a live stream opened
   before a reload keeps pushing after it (mid-stream weight swap).
"""

import io
import json
import urllib.error
import urllib.request

import numpy as np
import jax
import pytest

from m3f.pytorch_tpu.config import apply_overrides
from m3f.pytorch_tpu.infer import Predictor
from m3f.pytorch_tpu.infer.server import PredictServer
from m3f.pytorch_tpu.train.checkpoint import Checkpointer
from m3f.pytorch_tpu.train.loop import Trainer

from test_predictor import _wav, tiny_cfg


def _save_ckpt(tmp_path, cfg, seed, name):
    trainer = Trainer(cfg)
    state = trainer.init_state(seed=seed)
    ck = Checkpointer(str(tmp_path / name), keep=1, cfg=cfg)
    ck.save(jax.device_get(state))
    return ck._path(0)


@pytest.fixture(scope="module")
def two_ckpts(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("reload")
    cfg = apply_overrides(tiny_cfg(use_video=False),
                          {"train.mesh.num_data": 1})
    return cfg, _save_ckpt(tmp, cfg, 0, "a"), _save_ckpt(tmp, cfg, 1, "b")


def test_checkpoint_load_is_device_resident(two_ckpts):
    cfg, ckpt_a, _ = two_ckpts
    p = Predictor(cfg=cfg, checkpoint=ckpt_a)
    for leaf in jax.tree_util.tree_leaves(p.state.params):
        assert isinstance(leaf, jax.Array), type(leaf)
    for leaf in jax.tree_util.tree_leaves(p.state.bn_state):
        assert isinstance(leaf, jax.Array), type(leaf)


def test_reload_swaps_to_exactly_the_new_checkpoint(two_ckpts):
    cfg, ckpt_a, ckpt_b = two_ckpts
    wav = _wav(30, cfg, seed=3)
    p = Predictor(cfg=cfg, checkpoint=ckpt_a)
    pred_a = p.predict_video(waveform=wav)["pred"]
    info = p.reload(ckpt_b)
    assert info["reloads"] == 1 and info["checkpoint"] == ckpt_b
    assert p.checkpoint_path == ckpt_b
    pred_b = p.predict_video(waveform=wav)["pred"]
    assert not np.array_equal(pred_a, pred_b)
    fresh = Predictor(cfg=cfg, checkpoint=ckpt_b)
    np.testing.assert_array_equal(pred_b,
                                  fresh.predict_video(waveform=wav)["pred"])


def test_failed_reload_keeps_old_weights(two_ckpts, tmp_path):
    cfg, ckpt_a, _ = two_ckpts
    wav = _wav(25, cfg, seed=5)
    p = Predictor(cfg=cfg, checkpoint=ckpt_a)
    before = p.predict_video(waveform=wav)["pred"]
    with pytest.raises(FileNotFoundError):
        p.reload(str(tmp_path / "missing.npz"))
    # architecture mismatch: a checkpoint from a WIDER model
    import dataclasses
    big = cfg.replace(model=dataclasses.replace(
        cfg.model, gru=dataclasses.replace(cfg.model.gru, hidden_size=16)))
    bad = _save_ckpt(tmp_path, big, 2, "big")
    with pytest.raises(ValueError):
        p.reload(bad)
    assert p.reload_count == 0 and p.checkpoint_path == ckpt_a
    np.testing.assert_array_equal(before,
                                  p.predict_video(waveform=wav)["pred"])


def test_eval_only_residency_and_locked_swap(two_ckpts):
    """Serving states carry NO opt moments / ema alias (round-4 review:
    a k-model ensemble pinned k sets of Adam moments + duplicate EMA
    uploads), and reload's expensive load runs outside the lock — only the
    swap is serialized (passing a lock must work and stay consistent)."""
    import threading
    cfg, ckpt_a, ckpt_b = two_ckpts
    p = Predictor(cfg=cfg, checkpoint=ckpt_a)
    assert p.state.opt_state is None and p.state.ema is None
    lock = threading.Lock()
    info = p.reload(ckpt_b, lock=lock)
    assert info["reloads"] == 1 and not lock.locked()
    assert p.state.opt_state is None and p.state.ema is None
    wav = _wav(20, cfg, seed=11)
    np.testing.assert_array_equal(
        p.predict_video(waveform=wav)["pred"],
        Predictor(cfg=cfg, checkpoint=ckpt_b)
        .predict_video(waveform=wav)["pred"])


def test_eval_only_commit_folds_ema(two_ckpts):
    """commit_state(eval_only=True) serves the EMA shadow as params and
    drops the device-side duplicate."""
    cfg, _, _ = two_ckpts
    cfg_ema = apply_overrides(cfg, {"train.ema_decay": "0.99"})
    tr = Trainer(cfg_ema)
    state = jax.device_get(tr.init_state(seed=0))
    shadow = jax.tree_util.tree_map(lambda x: x + 1.0, state.params)
    committed = tr.commit_state(state._replace(ema=shadow), eval_only=True)
    assert committed.opt_state is None and committed.ema is None
    for got, want in zip(jax.tree_util.tree_leaves(committed.params),
                         jax.tree_util.tree_leaves(shadow)):
        np.testing.assert_array_equal(np.asarray(got), want)


def _post(url, body, headers=None):
    req = urllib.request.Request(url, data=body, headers=headers or {})
    return urllib.request.urlopen(req, timeout=120)


def test_http_reload_route(two_ckpts):
    cfg, ckpt_a, ckpt_b = two_ckpts
    wav = _wav(30, cfg, seed=7)
    buf = io.BytesIO()
    np.savez(buf, waveform=wav)
    body = buf.getvalue()

    # disabled by default -> 403
    p0 = Predictor(cfg=cfg, checkpoint=ckpt_a)
    srv0 = PredictServer(p0, port=0)
    srv0.start_background()
    base0 = f"http://127.0.0.1:{srv0.port}"
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base0 + "/reload",
              json.dumps({"checkpoint": ckpt_b}).encode())
    assert e.value.code == 403
    srv0.shutdown()

    p = Predictor(cfg=cfg, checkpoint=ckpt_a)
    srv = PredictServer(p, port=0, allow_reload=True)
    srv.start_background()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        with _post(base + "/predict", body) as r:
            pred_a = np.asarray(json.load(r)["pred"], np.float32)

        # a live stream survives the swap (mid-stream weight push)
        with _post(base + "/stream/open", b"") as r:
            sid = json.load(r)["id"]
        chunk = io.BytesIO()
        np.savez(chunk, waveform=wav[:9000])
        _post(f"{base}/stream/{sid}/push", chunk.getvalue()).close()

        # bad bodies / paths -> 400, old weights keep serving
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base + "/reload", b"not json")
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base + "/reload",
                  json.dumps({"checkpoint": "/nope/missing.npz"}).encode())
        assert e.value.code == 400
        # non-string checkpoint value: a client error, not a 500 from
        # np.load(123) deep inside (round-4 review)
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base + "/reload",
                  json.dumps({"checkpoint": 123}).encode())
        assert e.value.code == 400
        # raw client, non-numeric Content-Length -> JSON 400, not a
        # dropped connection (urllib always sets the header, so raw HTTP)
        import socket
        from urllib.parse import urlparse
        u = urlparse(base)
        with socket.create_connection((u.hostname, u.port), timeout=30) as s:
            s.sendall(b"POST /reload HTTP/1.1\r\nHost: x\r\n"
                      b"Content-Length: abc\r\n\r\n")
            resp = b""
            while True:          # read to close: body may arrive in a
                d = s.recv(4096)  # second segment after the headers
                if not d:
                    break
                resp += d
        resp = resp.decode()
        assert " 400 " in resp.splitlines()[0] and "error" in resp, resp
        with _post(base + "/predict", body) as r:
            still = np.asarray(json.load(r)["pred"], np.float32)
        np.testing.assert_array_equal(pred_a, still)

        with _post(base + "/reload",
                   json.dumps({"checkpoint": ckpt_b}).encode()) as r:
            out = json.load(r)
        assert out["ok"] and out["reloads"] == 1

        with _post(base + "/predict", body) as r:
            pred_b = np.asarray(json.load(r)["pred"], np.float32)
        assert not np.array_equal(pred_a, pred_b)
        want = Predictor(cfg=cfg,
                         checkpoint=ckpt_b).predict_video(waveform=wav)["pred"]
        np.testing.assert_array_equal(pred_b, want)

        # the pre-reload stream keeps accepting pushes
        chunk2 = io.BytesIO()
        np.savez(chunk2, waveform=wav[9000:18000])
        _post(f"{base}/stream/{sid}/push", chunk2.getvalue()).close()
        _post(f"{base}/stream/{sid}/flush", b"").close()

        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            h = json.load(r)
        assert h["checkpoint"] == ckpt_b and h["reloads"] == 1
    finally:
        srv.shutdown()
