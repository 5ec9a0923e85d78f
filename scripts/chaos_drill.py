"""ONE asserted operator chaos drill over the full field loop (VERDICT r4
next #5): every stage an operator actually runs, chained end-to-end through
the REAL CLI in subprocesses, each asserted — so "the pieces all exist" is
demonstrated as "the loop survives", on whatever backend the environment
gives (the real chip under axon; CPU when JAX_PLATFORMS=cpu).

Stages (the parent process never imports jax — on a single-chip rig each
subprocess must own the device exclusively):

  1. doctor      `m3f doctor` over a fabricated mini ABAW tree -> rc 0
  2. control     uninterrupted `m3f train` (async checkpoints + EMA +
                 plateau schedule + periodic eval/best.npz), N steps
  3. chaos       same run in a fresh dir, SIGTERM mid-run -> rc 143 + a
                 preemption/cadence checkpoint on disk
  4. resume      same dir, runs to N; final ckpt_N is LEAF-BITWISE equal
                 to the control run's (the exact-resume contract:
                 data-stream fast-forward + state-carried EMA/lr_mult)
  5. ensemble    `m3f eval --checkpoint best.npz,ckpt_N.npz` (prediction-
                 level ensemble) -> finite CCCs
  6. serve       `m3f serve --allow-reload` on the trained ckpt; 3
                 concurrent live streams push chunks while POST /reload
                 hot-swaps to best.npz mid-traffic -> all 2xx, 0 5xx,
                 reload count visible in /healthz
  7. submission  `m3f predict --out <dir>` -> one ABAW txt per video,
                 header + exactly one row per frame

Usage:
    python scripts/chaos_drill.py [--steps 12] [--sigterm-step 6]
                                  [--workdir DIR] [--out DRILL.json]

Prints one summary JSON line; exit 0 only if every stage held. Reference
parity note: the reference repo has none of this surface (SURVEY §4-§5 —
no tests, no preemption story, no serving); the drill is rebuild-only
operational evidence.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import signal
import subprocess
import sys
import tempfile
import threading
import time
import urllib.request
import wave

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# tiny audio-only model: the drill exercises the OPERATOR loop, not the
# model; small shapes keep 6 subprocess boots + compiles tractable on a
# 1-core host behind the tunnel
OVR = [
    "data.synthetic=true",
    "data.synthetic_num_videos=2",
    "data.synthetic_video_frames=96",
    "model.audio.channels=[4,8]",
    "model.audio.feature_dim=8",
    "model.gru.hidden_size=8",
    "train.batch_size=2",
    "train.log_every=1",
    "train.mesh.num_data=1",
]


def _env():
    env = dict(os.environ, PYTHONUNBUFFERED="1",
               M3F_JAX_CACHE=os.environ.get("M3F_JAX_CACHE",
                                            "/tmp/m3f_jax_cache"))
    env.pop("XLA_FLAGS", None)   # no fake-device count from a test shell
    return env


def _run(args, log_path, timeout=900):
    """Run one CLI stage to completion; returns (rc, log_text)."""
    with open(log_path, "w") as log:
        rc = subprocess.call([sys.executable, "-m", "m3f.pytorch_tpu.main",
                              *args], cwd=REPO, env=_env(), stdout=log,
                             stderr=subprocess.STDOUT, timeout=timeout)
    return rc, open(log_path).read()


def _spawn(args, log_path):
    log = open(log_path, "w")
    return subprocess.Popen([sys.executable, "-m", "m3f.pytorch_tpu.main",
                             *args], cwd=REPO, env=_env(), stdout=log,
                            stderr=subprocess.STDOUT)


def _wait_for(log_path, needle, proc=None, timeout=900):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if os.path.exists(log_path) and needle in open(log_path).read():
            return
        if proc is not None and proc.poll() is not None:
            raise AssertionError(
                f"process died (rc={proc.returncode}) before {needle!r}:\n"
                + open(log_path).read()[-2000:])
        time.sleep(0.25)
    raise AssertionError(f"no {needle!r} in {log_path} after {timeout}s:\n"
                         + open(log_path).read()[-2000:])


def _train_args(ckpt_dir, steps):
    # eval stays ON: best.npz + plateau + early-stop state are the point
    return ["train", "--preset", "audio_only", *OVR,
        f"train.num_steps={steps}",
        f"train.checkpoint_dir={ckpt_dir}",
        "train.checkpoint_every=4",
        "train.eval_every=4",
        "train.ema_decay=0.999",
        "train.optim.schedule=plateau",
    ]


# ---- stages ----------------------------------------------------------------

def stage_doctor(work):
    """Fabricate a tiny on-disk ABAW tree and pre-flight it."""
    try:
        import cv2
    except ImportError:
        return {"skipped": "cv2 unavailable — no JPEG encoder for the tree"}
    root = os.path.join(work, "abaw")
    size, fps, sr, n = 16, 30.0, 16_000, 48
    rng = np.random.RandomState(0)
    for split in ("Train_Set", "Validation_Set"):
        os.makedirs(os.path.join(root, "annotations",
                                 "VA_Estimation_Challenge", split),
                    exist_ok=True)
    os.makedirs(os.path.join(root, "audio"), exist_ok=True)
    for vid in ("drill_a", "drill_b"):
        crop = os.path.join(root, "cropped_aligned", vid)
        os.makedirs(crop, exist_ok=True)
        for i in range(n):
            img = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
            assert cv2.imwrite(os.path.join(crop, f"{i + 1:05d}.jpg"), img)
        for split in ("Train_Set", "Validation_Set"):
            with open(os.path.join(root, "annotations",
                                   "VA_Estimation_Challenge", split,
                                   vid + ".txt"), "w") as f:
                f.write("valence,arousal\n")
                f.writelines(f"{0.1:.3f},{-0.2:.3f}\n" for _ in range(n))
        wav = 0.2 * np.sin(2 * np.pi * 440 * np.arange(int(n / fps * sr)) / sr)
        with wave.open(os.path.join(root, "audio", vid + ".wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes((wav * 32767).astype("<i2").tobytes())
    rc, out = _run(["doctor", "--preset", "audio_only", "--splits",
                    "train,val", f"data.root={root}", "data.synthetic=false",
                    f"data.image_size={size}", f"data.fps={fps}"],
                   os.path.join(work, "doctor.log"))
    assert rc == 0, f"doctor rc={rc}:\n{out[-2000:]}"
    assert "0 with errors" in out, out[-2000:]
    return {"rc": rc, "videos": 2}


def stage_control(work, steps, report=None):
    ckpt_dir = os.path.join(work, "control")
    rc, out = _run(_train_args(ckpt_dir, steps),
                   os.path.join(work, "control.log"))
    if report is not None:
        # the parent never imports jax; the child's xla_bridge banner says
        # which platform the container's sitecustomize actually pinned
        # (JAX_PLATFORMS=cpu in the env does NOT override it)
        report["backend"] = ("tpu (axon)" if "Platform 'axon'" in out
                             else "cpu")
    assert rc == 0, f"control train rc={rc}:\n{out[-2000:]}"
    final = os.path.join(ckpt_dir, f"ckpt_{steps:08d}.npz")
    assert os.path.exists(final), f"no final checkpoint {final}"
    assert os.path.exists(os.path.join(ckpt_dir, "best.npz")), \
        "eval cadence produced no best.npz"
    return {"rc": rc, "ckpt": final}


def stage_chaos(work, steps, sigterm_step):
    ckpt_dir = os.path.join(work, "chaos")
    log = os.path.join(work, "chaos.log")
    proc = _spawn(_train_args(ckpt_dir, steps), log)
    try:
        _wait_for(log, f"step {sigterm_step}/", proc)
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)
    assert rc == 143, f"SIGTERM rc={rc} (want 143):\n" \
        + open(log).read()[-2000:]
    ckpts = sorted(f for f in os.listdir(ckpt_dir) if f.startswith("ckpt_"))
    assert ckpts, "no checkpoint on disk after SIGTERM"
    return {"rc": rc, "ckpts_after_sigterm": ckpts}


def stage_resume(work, steps, control_ckpt):
    ckpt_dir = os.path.join(work, "chaos")   # same dir -> auto-resume
    rc, out = _run(_train_args(ckpt_dir, steps),
                   os.path.join(work, "resume.log"))
    assert rc == 0, f"resume rc={rc}:\n{out[-2000:]}"
    resumed = os.path.join(ckpt_dir, f"ckpt_{steps:08d}.npz")
    assert os.path.exists(resumed), f"resume never reached step {steps}"
    # the exact-resume contract, end to end through SIGTERM: leaf-bitwise
    # equality of the interrupted+resumed state vs the uninterrupted one
    # (npz FILE bytes differ by zip timestamps; the arrays must not)
    with np.load(control_ckpt) as a, np.load(resumed) as b:
        keys_a, keys_b = set(a.files), set(b.files)
        assert keys_a == keys_b, (
            f"leaf sets differ: {sorted(keys_a ^ keys_b)[:5]}")
        diffs = [k for k in sorted(keys_a - {"__meta__"})
                 if not (a[k].dtype == b[k].dtype
                         and np.array_equal(a[k], b[k]))]
    assert not diffs, f"resume is not bitwise: {len(diffs)} leaves differ, " \
                      f"e.g. {diffs[:5]}"
    return {"rc": rc, "bitwise_equal_leaves": len(keys_a) - 1}


def stage_ensemble(work, steps):
    best = os.path.join(work, "control", "best.npz")
    last = os.path.join(work, "control", f"ckpt_{steps:08d}.npz")
    rc, out = _run(["eval", "--preset", "audio_only", *OVR,
                    "--checkpoint", f"{best},{last}", "--split", "val"],
                   os.path.join(work, "ensemble.log"))
    assert rc == 0, f"ensemble eval rc={rc}:\n{out[-2000:]}"
    res = json.loads([ln for ln in out.splitlines()
                      if ln.startswith("{")][-1])
    assert np.isfinite([res["ccc_v"], res["ccc_a"]]).all(), res
    return {"rc": rc, "ccc_v": res["ccc_v"], "ccc_a": res["ccc_a"]}


def stage_serve(work, steps, port=8417):
    ckpt = os.path.join(work, "control", f"ckpt_{steps:08d}.npz")
    best = os.path.join(work, "control", "best.npz")
    log = os.path.join(work, "serve.log")
    proc = _spawn(["serve", "--preset", "audio_only", *OVR,
                   "--checkpoint", ckpt, "--port", str(port),
                   "--warmup-frames", "0", "--allow-reload",
                   "--push-timeout", "120"], log)
    base = f"http://127.0.0.1:{port}"
    results = {"push_codes": [], "flush_codes": []}
    try:
        _wait_for(log, "serving", proc, timeout=600)

        def post(path, body=b"", timeout=600):
            req = urllib.request.Request(base + path, data=body)
            with urllib.request.urlopen(req, timeout=timeout) as r:
                return r.status, json.load(r)

        sr = 16_000
        lock = threading.Lock()
        errors = []

        def stream_worker(i):
            try:
                _, o = post("/stream/open")
                rng = np.random.RandomState(i)
                for _ in range(4):
                    buf = io.BytesIO()
                    np.savez(buf, waveform=rng.randn(sr).astype(np.float32)
                             * 0.1)
                    code, _r = post(f"/stream/{o['id']}/push", buf.getvalue())
                    with lock:
                        results["push_codes"].append(code)
                code, _r = post(f"/stream/{o['id']}/flush")
                with lock:
                    results["flush_codes"].append(code)
            except Exception as e:  # noqa: BLE001 — drill assertion below
                with lock:
                    errors.append(f"stream {i}: {type(e).__name__}: {e}")

        threads = [threading.Thread(target=stream_worker, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        # hot reload mid-traffic: swaps to best.npz while pushes in flight
        time.sleep(0.5)
        code, rl = post("/reload",
                        json.dumps({"checkpoint": best}).encode(),
                        timeout=600)
        assert code == 200 and rl["ok"], rl
        for t in threads:
            t.join(timeout=900)
        assert not errors, errors[:3]
        assert results["push_codes"] == [200] * 12, results
        assert results["flush_codes"] == [200] * 3, results
        h = json.load(urllib.request.urlopen(base + "/healthz", timeout=60))
        assert h["reloads"] == 1, h
        st = json.load(urllib.request.urlopen(base + "/statz", timeout=60))
        fives = {k: v for k, v in st["responses"].items()
                 if k.endswith("5xx")}
        assert not fives, fives
        results.update(reloads=h["reloads"],
                       micro_batch_hist=st["micro_batch_hist"])
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
    return results


def stage_submission(work, steps):
    ckpt = os.path.join(work, "control", f"ckpt_{steps:08d}.npz")
    out_dir = os.path.join(work, "submission")
    rc, out = _run(["predict", "--preset", "audio_only", *OVR,
                    "--checkpoint", ckpt, "--split", "val",
                    "--out", out_dir, "--smooth", "5"],
                   os.path.join(work, "predict.log"))
    assert rc == 0, f"predict rc={rc}:\n{out[-2000:]}"
    txts = sorted(f for f in os.listdir(out_dir) if f.endswith(".txt"))
    assert len(txts) == 2, txts     # synthetic_num_videos
    for t in txts:
        lines = open(os.path.join(out_dir, t)).read().splitlines()
        assert lines[0] == "valence,arousal", lines[0]
        assert len(lines) == 1 + 96, (t, len(lines))   # header + per-frame
        va = np.array([ln.split(",") for ln in lines[1:]], dtype=np.float32)
        assert np.isfinite(va).all() and (np.abs(va) <= 1).all()
    return {"rc": rc, "files": txts}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--sigterm-step", type=int, default=6)
    ap.add_argument("--workdir", default="")
    ap.add_argument("--out", default="DRILL.json")
    args = ap.parse_args(argv)
    work = args.workdir or tempfile.mkdtemp(prefix="m3f_drill_")
    os.makedirs(work, exist_ok=True)

    t0 = time.time()
    report = {"workdir": work, "steps": args.steps, "stages": {}}
    stages = [
        ("doctor", lambda: stage_doctor(work)),
        ("control", lambda: stage_control(work, args.steps, report)),
        ("chaos", lambda: stage_chaos(work, args.steps, args.sigterm_step)),
        ("resume", lambda: stage_resume(
            work, args.steps,
            os.path.join(work, "control", f"ckpt_{args.steps:08d}.npz"))),
        ("ensemble", lambda: stage_ensemble(work, args.steps)),
        ("serve", lambda: stage_serve(work, args.steps)),
        ("submission", lambda: stage_submission(work, args.steps)),
    ]
    ok = True
    for name, fn in stages:
        print(f"drill: {name} ...", flush=True)
        t = time.time()
        try:
            r = fn()
            r["seconds"] = round(time.time() - t, 1)
            report["stages"][name] = r
            print(f"  ok {r}", flush=True)
        except BaseException as e:  # noqa: BLE001 — report and stop
            report["stages"][name] = {"failed": f"{type(e).__name__}: {e}",
                                      "seconds": round(time.time() - t, 1)}
            print(f"  FAILED {e}", flush=True)
            ok = False
            break
    report["ok"] = ok
    report["total_seconds"] = round(time.time() - t0, 1)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps({"ok": ok, "total_seconds": report["total_seconds"],
                      "out": args.out}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
