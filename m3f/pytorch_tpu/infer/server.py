"""Minimal HTTP serving frontend over :class:`Predictor` (``m3f serve``).

The reference repo has no serving story (SURVEY §2.1 — inference is a
Lightning test pass); this closes the deployment loop for the rebuild: one
process owns the compiled model and answers per-video prediction requests
over HTTP. Deliberately stdlib-only (no framework deps in the image) and
single-model: one Predictor, shape-bucketed compiles warmed at startup,
requests serialized through the device (the chip is one queue anyway;
concurrency belongs to SessionGroup / predict_many, not HTTP threads).

Protocol (binary-first — videos are big, JSON base64 would triple them):

    POST /predict   body = .npz with optional arrays:
                      frames   uint8 [N, S, S, 3]  (S = data.image_size)
                      waveform float32/float64 [T] (16 kHz mono)
                    query: ?smooth=K  (odd moving-average window, optional)
                    response: application/json {"pred": [[v, a], ...]}
                    (or x-npy raw float32 [N,2] with Accept: application/x-npy)
    GET  /healthz   {"ok": true, "model": ..., "image_size": ..., ...}

    Live streams (bounded-latency online inference; concurrent sessions'
    ready window-groups run as ONE batched forward via SessionGroup):

    POST /stream/open          -> {"id": "..."}
    POST /stream/<id>/push     body = .npz chunk (frames/waveform)
                               -> {"start": i, "pred": [[v, a], ...]}
                                  (frames finalized by this chunk; the
                                  emission lags `latency_frames` behind)
    POST /stream/<id>/flush    -> same shape; closes the session

Example client:

    buf = io.BytesIO(); np.savez(buf, frames=crops, waveform=wav)
    r = urllib.request.urlopen("http://HOST:PORT/predict", buf.getvalue())
    pred = np.asarray(json.load(r)["pred"])
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class PredictServer:
    def __init__(self, predictor, host: str = "127.0.0.1", port: int = 8321,
                 max_body: int = 1 << 30, max_streams: int = 64):
        from m3f.pytorch_tpu.infer.predictor import SessionGroup

        self.predictor = predictor
        # one device queue -> one request at a time through the model; HTTP
        # threads only overlap parsing/serialization with device compute
        self._lock = threading.Lock()
        self._group = SessionGroup(predictor)
        self._streams = {}          # id -> StreamingSession
        self._next_id = 0
        self.max_streams = max_streams
        # micro-batching of concurrent /push requests: the first arrival
        # becomes the leader, sleeps batch_window_s so concurrent sessions'
        # chunks pile up, then runs ONE SessionGroup.push_many for all of
        # them (the 3.5x measured in BASELINE.md "serving throughput")
        self.batch_window_s = 0.003
        self._pending = []          # (session, data, event, slot)
        self._pending_lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet by default
                pass

            def _send(self, code: int, body: bytes,
                      ctype: str = "application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _fail(self, code: int, msg: str):
                self._send(code, json.dumps({"error": msg}).encode())

            def do_GET(self):
                if self.path.rstrip("/") in ("", "/healthz"):
                    cfg = outer.predictor.cfg
                    self._send(200, json.dumps({
                        "ok": True, "model": cfg.name,
                        "uses_video": cfg.model.use_video,
                        "uses_audio": cfg.model.use_audio,
                        "image_size": cfg.data.image_size,
                        "sample_rate": cfg.model.mel.sample_rate,
                        "fps": cfg.data.fps,
                    }).encode())
                else:
                    self._fail(404, f"unknown path {self.path}")

            def _read_npz(self):
                n = int(self.headers.get("Content-Length", 0))
                if n > max_body:
                    self._fail(413, f"body too large ({n})")
                    return None
                raw = self.rfile.read(n)
                try:
                    with np.load(io.BytesIO(raw)) as z:
                        return {k: (z[k].astype(np.float32)
                                    if k == "waveform" else z[k])
                                for k in z.files}
                except Exception as e:  # noqa: BLE001 — client error
                    self._fail(400, f"body is not a readable npz: {e}")
                    return None

            def _stream_routes(self, path: str) -> bool:
                parts = path.strip("/").split("/")
                if parts[0] != "stream":
                    return False
                if parts[1:] == ["open"]:
                    with outer._pending_lock:
                        if len(outer._streams) >= outer.max_streams:
                            self._fail(429, "too many open streams")
                            return True
                        sid = f"s{outer._next_id}"
                        outer._next_id += 1
                        try:
                            outer._streams[sid] = outer._group.open()
                        except ValueError as e:  # e.g. eval_smooth set
                            self._fail(400, str(e))
                            return True
                    self._send(200, json.dumps({
                        "id": sid,
                        "latency_frames": outer._streams[sid].latency_frames,
                    }).encode())
                    return True
                if len(parts) == 3 and parts[2] in ("push", "flush"):
                    sess = outer._streams.get(parts[1])
                    if sess is None:
                        self._fail(404, f"unknown stream {parts[1]}")
                        return True
                    if parts[2] == "push":
                        data = self._read_npz()
                        if data is None:
                            return True
                        try:
                            lo, pred = outer._stream_push(sess, data)
                        except (AssertionError, ValueError) as e:
                            self._fail(400, str(e))
                            return True
                    else:
                        try:
                            with outer._lock:
                                lo, pred = sess.flush()
                        except (AssertionError, ValueError) as e:
                            # a failed flush means the session is dead
                            # either way — don't leak its slot
                            outer._streams.pop(parts[1], None)
                            self._fail(400, str(e))
                            return True
                        outer._streams.pop(parts[1], None)
                    self._send(200, json.dumps({
                        "start": int(lo),
                        "pred": np.asarray(pred, np.float32).tolist(),
                    }).encode())
                    return True
                self._fail(404, f"unknown path /{path.strip('/')}")
                return True

            def do_POST(self):
                from urllib.parse import parse_qs, urlparse
                url = urlparse(self.path)
                if self._stream_routes(url.path):
                    return
                if url.path.rstrip("/") != "/predict":
                    return self._fail(404, f"unknown path {url.path}")
                n = int(self.headers.get("Content-Length", 0))
                if not 0 < n <= max_body:
                    return self._fail(413 if n else 400,
                                      f"bad Content-Length {n}")
                raw = self.rfile.read(n)
                try:
                    with np.load(io.BytesIO(raw)) as z:
                        frames = z["frames"] if "frames" in z.files else None
                        wav = (z["waveform"].astype(np.float32)
                               if "waveform" in z.files else None)
                except Exception as e:  # noqa: BLE001 — client error, report
                    return self._fail(400, f"body is not a readable npz: {e}")
                q = parse_qs(url.query)
                smooth = int(q.get("smooth", ["0"])[0])
                try:
                    with outer._lock:
                        out = outer.predictor.predict_video(
                            frames=frames, waveform=wav,
                            smooth_window=smooth)
                except (AssertionError, ValueError) as e:
                    return self._fail(400, str(e))
                pred = np.asarray(out["pred"], np.float32)
                if "application/x-npy" in self.headers.get("Accept", ""):
                    buf = io.BytesIO()
                    np.save(buf, pred)
                    return self._send(200, buf.getvalue(),
                                      "application/x-npy")
                self._send(200, json.dumps(
                    {"pred": pred.tolist()}).encode())

        self._httpd = ThreadingHTTPServer((host, port), Handler)

    # -- streaming micro-batcher ------------------------------------------

    def _stream_push(self, sess, data):
        """Batch this push with whatever else arrives inside the window.

        Two pushes for the SAME session in one window can't share one
        push_many dict — the later one is deferred to the next round, which
        also serializes a client that (against the contract) pipelines
        pushes for one stream.
        """
        import time as _time

        ev = threading.Event()
        slot = {}
        with self._pending_lock:
            self._pending.append((sess, data, ev, slot))
            leader = len(self._pending) == 1
        while leader:
            _time.sleep(self.batch_window_s)
            with self._pending_lock:
                batch, dup = [], []
                seen = set()
                for item in self._pending:
                    (dup if id(item[0]) in seen else batch).append(item)
                    seen.add(id(item[0]))
                self._pending = dup
            # fail cheap per-item preconditions individually so one dead
            # session can't poison every other push in its 3 ms window
            live = []
            for item in batch:
                if getattr(item[0], "_flushed", False):
                    item[3]["err"] = AssertionError("session already flushed")
                    item[2].set()
                else:
                    live.append(item)
            try:
                if live:
                    with self._lock:
                        outs = self._group.push_many(
                            {s: d for s, d, _, _ in live})
                    for s, _, e, sl in live:
                        sl["out"] = outs[s]
                        e.set()
            except BaseException as exc:
                for _, _, e, sl in live:
                    sl.setdefault("err", exc)
                    e.set()
            with self._pending_lock:
                # keep leading until the queue is EMPTY (deferred same-
                # session duplicates have no other leader; new arrivals only
                # self-elect when they find an empty queue)
                leader = bool(self._pending)
        if not ev.wait(timeout=600):
            raise RuntimeError("stream push timed out behind the batcher")
        if "err" in slot:
            raise slot["err"]
        return slot["out"]

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def serve_forever(self):
        self._httpd.serve_forever()

    def start_background(self) -> threading.Thread:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self._httpd.shutdown()
        self._httpd.server_close()


def run_server(predictor, host: str = "127.0.0.1", port: int = 8321,
               warmup_frames: Optional[int] = 1024, log=print):
    """CLI entry body: warm the shape buckets, then serve until SIGINT."""
    if warmup_frames:
        log(f"warming shape buckets up to {warmup_frames} frames ...")
        predictor.warmup(max_frames=warmup_frames)
    srv = PredictServer(predictor, host=host, port=port)
    log(f"serving {predictor.cfg.name} on http://{host}:{srv.port} "
        "(POST /predict, GET /healthz)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        log("shutting down")
        srv.shutdown()
    return 0
