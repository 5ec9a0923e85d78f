"""Fused on-device log-mel spectrogram frontend.

Capability parity: the reference's *offline* preprocessing stack —
``scripts/extract_audio.* / compute_mels.py`` using ffmpeg + librosa
(SURVEY.md §2.1 C3, §3.1; reconstructed, reference mount empty).  The rebuild
collapses that whole stack into ONE jit region executed on-device per batch
(BASELINE.json north_star: "log-mel spectrogram extraction become[s] fused
JAX/Pallas preprocessing kernels"):

    framing → Hann window → rFFT → |·|² → mel filterbank matmul → log

TPU notes:
- ``jnp.fft.rfft`` lowers to XLA FFT, which is supported on TPU.
- Framing is expressed as a strided gather; XLA turns it into a dynamic-slice
  loop that the fusion pass folds into the window multiply. A Pallas variant
  (ops/pallas/melspec_pallas.py) exists behind a flag for when framing shows up
  in profiles.
- The mel filterbank is a small constant [n_bins, n_mels] fp32 matrix computed
  once on host (numpy) and closed over — the per-batch work is a single MXU
  matmul.
- Formulas follow librosa's defaults (Slaney mel scale, Slaney area-norm,
  reflect-pad centering, periodic Hann) so that precomputed reference ``.npy``
  features match; pinned in MelConfig as UNVERIFIED vs reference.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from m3f.pytorch_tpu.config import MelConfig


# ---------------------------------------------------------------------------
# Host-side constant construction (numpy, computed once per config)
# ---------------------------------------------------------------------------

def hz_to_mel(hz, scale: str = "slaney"):
    hz = np.asarray(hz, dtype=np.float64)
    if scale == "htk":
        return 2595.0 * np.log10(1.0 + hz / 700.0)
    # Slaney: linear below 1 kHz, log above.
    f_min, f_sp = 0.0, 200.0 / 3
    mel = (hz - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(hz >= min_log_hz,
                    min_log_mel + np.log(np.maximum(hz, 1e-10) / min_log_hz) / logstep,
                    mel)


def mel_to_hz(mel, scale: str = "slaney"):
    mel = np.asarray(mel, dtype=np.float64)
    if scale == "htk":
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    hz = f_min + f_sp * mel
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(mel >= min_log_mel,
                    min_log_hz * np.exp(logstep * (mel - min_log_mel)),
                    hz)


@functools.lru_cache(maxsize=8)
def mel_filterbank(cfg: MelConfig) -> np.ndarray:
    """Triangular mel filterbank, shape [n_fft//2 + 1, n_mels], float32.

    Matches librosa.filters.mel(htk=False, norm='slaney') up to float error.
    """
    n_bins = cfg.n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, cfg.sample_rate / 2.0, n_bins)
    mel_min = hz_to_mel(cfg.fmin, cfg.mel_scale)
    mel_max = hz_to_mel(cfg.fmax, cfg.mel_scale)
    mel_pts = np.linspace(mel_min, mel_max, cfg.n_mels + 2)
    hz_pts = mel_to_hz(mel_pts, cfg.mel_scale)          # [n_mels + 2]

    fdiff = np.diff(hz_pts)                              # [n_mels + 1]
    ramps = hz_pts[:, None] - fft_freqs[None, :]         # [n_mels+2, n_bins]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))       # [n_mels, n_bins]

    if cfg.norm == "slaney":
        enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
        fb *= enorm[:, None]
    return np.ascontiguousarray(fb.T, dtype=np.float32)  # [n_bins, n_mels]


@functools.lru_cache(maxsize=8)
def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann (librosa/scipy fftbins=True convention)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def num_frames(num_samples: int, cfg: MelConfig) -> int:
    if cfg.center:
        return 1 + num_samples // cfg.hop_length
    return 1 + (num_samples - cfg.n_fft) // cfg.hop_length


# ---------------------------------------------------------------------------
# Device-side fused transform
# ---------------------------------------------------------------------------

def _frame(x: jnp.ndarray, n_fft: int, hop: int, n_frames: int) -> jnp.ndarray:
    """[..., T] → [..., n_frames, n_fft] strided framing via gather."""
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :])
    return x[..., idx]


def _frame_dynamic(x: jnp.ndarray, hop: jnp.ndarray, n_fft: int,
                   n_frames: int) -> jnp.ndarray:
    """Per-example-hop centered framing: [..., S_max] → [..., n_frames, n_fft].

    ``hop`` is a TRACED int32 (broadcastable over x's leading dims): the
    per-video mel hop that keeps one mel frame per video frame at the
    video's true rate (config.MelConfig.hop_for_fps). Shapes stay static —
    the buffer is sized for max_hop_length and only indices are dynamic —
    so ONE compiled program covers every frame rate, including mixed-rate
    batches; no per-rate compile buckets.

    The librosa reflect-pad centering is expressed in INDEX space (−k ↦ k
    on the left, T−1+k ↦ T−1−k about the per-example signal end
    T = (n_frames−1)·hop) instead of jnp.pad, so each example reflects at
    its OWN window end and never reads the buffer's zero tail. For
    hop == cfg.hop_length this gathers bitwise the same samples as the
    static path (same reflection, same centers).
    """
    hop = jnp.asarray(hop, jnp.int32)
    # pad hop with trailing singleton dims so it broadcasts over any
    # remaining leading dims of x plus the [n_frames, n_fft] frame axes
    hop = hop.reshape(hop.shape + (1,) * (x.ndim - 1 - hop.ndim) + (1, 1))
    i = jnp.arange(n_frames, dtype=jnp.int32)[:, None]
    j = jnp.arange(n_fft, dtype=jnp.int32)[None, :]
    idx = hop * i + (j - n_fft // 2)             # centered, signal coords
    idx = jnp.abs(idx)                           # left reflect: −k ↦ k
    end = hop * (n_frames - 1) - 1               # last in-window sample
    idx = jnp.where(idx > end, 2 * end - idx, idx)
    return jnp.take_along_axis(x[..., None, :], idx, axis=-1)


def log_mel_spectrogram(waveform: jnp.ndarray, cfg: MelConfig,
                        out_dtype=jnp.float32, hop=None,
                        n_frames_out: Optional[int] = None) -> jnp.ndarray:
    """[..., num_samples] float wav in [-1,1] → [..., n_frames, n_mels] log-mel.

    Pure function of statically-shaped input — safe inside jit/pjit; batch
    dims vmap for free via broadcasting.

    ``hop``: optional traced per-example hop (int32, broadcastable over the
    leading dims) for the per-video-rate audio time base; requires
    ``n_frames_out`` (the buffer is max-hop-sized, so the frame count can
    no longer derive from its length) and cfg.center. None = the static
    cfg.hop_length path, byte-identical to all prior rounds.
    """
    x = waveform.astype(jnp.float32)
    t = x.shape[-1]
    if hop is not None:
        assert cfg.center, "dynamic hop requires centered framing"
        assert n_frames_out is not None, "dynamic hop needs n_frames_out"
        frames = _frame_dynamic(x, hop, cfg.n_fft, n_frames_out)
    else:
        if cfg.center:
            pad = cfg.n_fft // 2
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)],
                        mode="reflect")
        frames = _frame(x, cfg.n_fft, cfg.hop_length, num_frames(t, cfg))
    win = jnp.asarray(hann_window(cfg.win_length))
    if cfg.win_length < cfg.n_fft:  # centre-pad window to n_fft (librosa)
        lpad = (cfg.n_fft - cfg.win_length) // 2
        win = jnp.pad(win, (lpad, cfg.n_fft - cfg.win_length - lpad))
    spec = jnp.fft.rfft(frames * win, n=cfg.n_fft, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2      # [..., F, n_bins]
    fb = jnp.asarray(mel_filterbank(cfg))                   # [n_bins, n_mels]
    # precision pinned: TPU DEFAULT would run this fp32 matmul as a single
    # bf16 pass, breaking the librosa-parity claim (same as stitch.py)
    mel = jnp.einsum("...fb,bm->...fm", power, fb,
                     precision=jax.lax.Precision.HIGHEST)   # MXU matmul
    return jnp.log(mel + cfg.log_eps).astype(out_dtype)
