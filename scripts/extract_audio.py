"""Extract 16 kHz mono WAV tracks from Aff-Wild2 videos (host-side, once).

Capability parity: reference C3's offline audio-extraction step —
"ffmpeg extract 16 kHz mono WAV per video" (SURVEY.md §2.1 C3, §3.1;
reconstructed — reference mount empty). Only THIS host-side decode step
survives from the reference's offline pipeline: the mel-spectrogram
precompute (`.npy` files) is gone, replaced by the fused on-device log-mel
frontend (m3f/pytorch_tpu/ops/melspec.py) running inside the train-step jit.

Usage:
    python scripts/extract_audio.py <video_dir> <out_audio_dir> [--sr 16000]
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

VIDEO_EXTS = (".mp4", ".avi", ".mkv", ".mov", ".webm")


def extract(video_path: str, wav_path: str, sr: int) -> bool:
    cmd = ["ffmpeg", "-nostdin", "-y", "-i", video_path,
           "-vn", "-ac", "1", "-ar", str(sr), "-f", "wav", wav_path]
    r = subprocess.run(cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return r.returncode == 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("video_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--sr", type=int, default=16000)
    args = ap.parse_args(argv)

    if shutil.which("ffmpeg") is None:
        print("ffmpeg not found on PATH — install it or extract audio elsewhere",
              file=sys.stderr)
        return 1

    os.makedirs(args.out_dir, exist_ok=True)
    n_ok = n_fail = 0
    for name in sorted(os.listdir(args.video_dir)):
        stem, ext = os.path.splitext(name)
        if ext.lower() not in VIDEO_EXTS:
            continue
        out = os.path.join(args.out_dir, stem + ".wav")
        if os.path.exists(out):
            continue
        if extract(os.path.join(args.video_dir, name), out, args.sr):
            n_ok += 1
        else:
            n_fail += 1
            print(f"FAILED: {name}", file=sys.stderr)
    print(f"extracted {n_ok} ok, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
