"""Serving-throughput measurement (VERDICT r2 weak #7 / r3 item 8).

Three serving shapes on the real chip, full fusion model:
  single   — one StreamingSession, chunked pushes (latency-optimal path)
  group-S  — S concurrent sessions through SessionGroup's batched forward
  batch    — predict_many pipelined whole-video eval (throughput path)

Prints one JSON line per row: frames/s (wall, through the tunnel on this
host — H2D dominates for video inputs; the cross-row RATIOS are the
batching story and transfer volume per frame is identical across rows).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from m3f.pytorch_tpu.cache import enable_persistent_cache

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, default=8)
    ap.add_argument("--frames", type=int, default=256,
                    help="frames pushed per session")
    ap.add_argument("--audio-only", action="store_true",
                    help="audio-only model: isolates the compute-side "
                         "batching gain from tunnel H2D")
    args = ap.parse_args()

    from m3f.pytorch_tpu.config import PRESETS, apply_overrides
    from m3f.pytorch_tpu.infer import Predictor, SessionGroup

    cfg = PRESETS["fusion"]()
    if args.audio_only:
        cfg = apply_overrides(cfg, {"model.use_video": False})
    p = Predictor(cfg=cfg)
    S = cfg.data.image_size
    sr, fps = cfg.model.mel.sample_rate, cfg.data.fps
    n = args.frames
    chunk_f = 16
    chunk_a = int(chunk_f / fps * sr)
    rng = np.random.RandomState(0)

    def mk_stream(seed):
        r = np.random.RandomState(seed)
        frames = (r.randint(0, 256, (n, S, S, 3), np.uint8)
                  if cfg.model.use_video else None)
        wav = r.randn(int(n / fps * sr) + sr).astype(np.float32)
        return frames, wav

    def push_kwargs(frames, wav, i):
        kw = {}
        if frames is not None:
            kw["frames"] = frames[i:i + chunk_f]
        kw["waveform"] = wav[int(i / fps * sr):int((i + chunk_f) / fps * sr)]
        return kw

    rows = []

    # -- single session (warm the forward first: push PAST the latency
    # horizon so the [1, W, ...] group forward actually compiles) --
    frames, wav = mk_stream(1)
    sess = p.stream()
    for i in range(0, 2 * sess.latency_frames + chunk_f, chunk_f):
        sess.push(**push_kwargs(frames, wav, i))
    sess2 = p.stream()
    t0 = time.perf_counter()
    total = 0
    for i in range(0, n, chunk_f):
        _, preds = sess2.push(**push_kwargs(frames, wav, i))
        total += len(preds)
    total += len(sess2.flush()[1])
    dt = time.perf_counter() - t0
    assert total == n, (total, n)
    rows.append({"mode": "single", "frames_per_sec": round(n / dt, 1)})

    # -- S concurrent sessions, batched --
    g = SessionGroup(p, max_batch=args.sessions)
    streams = [mk_stream(10 + i) for i in range(args.sessions)]
    sessions = [g.open() for _ in range(args.sessions)]
    # warm the batched-shape compile (bucket = sessions count)
    warm = {s: push_kwargs(*st, 0) for s, st in zip(sessions, streams)}
    for i in range(0, 4 * chunk_f, chunk_f):
        g.push_many({s: push_kwargs(*st, i)
                     for s, st in zip(sessions, streams)})
    sessions = [g.open() for _ in range(args.sessions)]
    t0 = time.perf_counter()
    total = 0
    for i in range(0, n, chunk_f):
        outs = g.push_many({s: push_kwargs(*st, i)
                            for s, st in zip(sessions, streams)})
        total += sum(len(v[1]) for v in outs.values())
    for s in sessions:
        total += len(g.flush(s)[1])
    dt = time.perf_counter() - t0
    assert total == n * args.sessions, (total, n * args.sessions)
    rows.append({"mode": f"group-{args.sessions}",
                 "frames_per_sec": round(n * args.sessions / dt, 1)})

    # -- batch eval (predict_many) over the same total volume --
    vids = []
    for i in range(args.sessions):
        frames, wav = streams[i]
        v = {"waveform": wav[:int(n / fps * sr)]}
        if frames is not None:
            v["frames"] = frames
        vids.append((f"v{i}", v))
    list(p.predict_many(iter(vids[:1])))        # compile
    t0 = time.perf_counter()
    out = list(p.predict_many(iter(vids)))
    dt = time.perf_counter() - t0
    assert sum(len(pr) for _, pr in out) == n * args.sessions
    rows.append({"mode": f"predict_many-{args.sessions}",
                 "frames_per_sec": round(n * args.sessions / dt, 1)})

    for r in rows:
        r["model"] = "audio_only" if args.audio_only else "fusion"
        print(json.dumps(r))


if __name__ == "__main__":
    main()
