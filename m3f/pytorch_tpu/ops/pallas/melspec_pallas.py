"""Pallas kernel: fused framing → windowed real-DFT → power → mel → log.

Replaces the XLA path in ops/melspec.py (SURVEY.md §7 step 8: "Pallas
candidates … fused STFT+mel (framing is gather-heavy)").  The XLA version
frames via a [F·n_fft] gather then calls the FFT custom-call — two extra HBM
round-trips for the framed/windowed intermediates.  This kernel keeps one
waveform row in VMEM and produces log-mels directly:

- **Framing** = 16 static VMEM slices (hop-strided) into an [F, n_fft]
  register tile — no gather, no materialized frames in HBM.
- **Windowed DFT as MXU matmuls**: rFFT(w·x) == x @ (diag(w)·C) ,
  x @ (diag(w)·S) with C/S the real/imag DFT bases — the Hann window is
  folded into the constant matrices on host, so the kernel is two
  [F, n_fft]×[n_fft, n_bins] MXU matmuls instead of an FFT custom call.
  For n_fft=1024 the matmul does ~50× the FLOPs of an FFT butterfly, but the
  op is bandwidth- not FLOP-bound at these sizes (the MXU is idle during the
  frontend anyway) and it fuses power+mel+log in the same VMEM residency.
- **mel + log** fused on the [F, n_bins] tile before a single [F, n_mels]
  result row is written back.

n_bins (513) is zero-padded to a lane multiple; the zero rows of the padded
mel filterbank make the padding inert.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from m3f.pytorch_tpu.config import MelConfig
from m3f.pytorch_tpu.ops.melspec import (hann_window, mel_filterbank,
                                         num_frames)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=8)
def _windowed_dft_mats(cfg: MelConfig):
    """(C', S', fb_pad): window-folded DFT bases and padded mel filterbank.

    C'[k, b] = win[k]·cos(-2πkb/n), S'[k, b] = win[k]·sin(-2πkb/n),
    shapes [n_fft, n_bins_pad]; fb_pad [n_bins_pad, n_mels] zero-padded.
    """
    n = cfg.n_fft
    n_bins = n // 2 + 1
    n_pad = _round_up(n_bins, 128)
    win = hann_window(cfg.win_length).astype(np.float64)
    if cfg.win_length < n:
        lpad = (n - cfg.win_length) // 2
        win = np.pad(win, (lpad, n - cfg.win_length - lpad))
    k = np.arange(n, dtype=np.float64)[:, None]
    b = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * k * b / n
    c = np.zeros((n, n_pad), np.float32)
    s = np.zeros((n, n_pad), np.float32)
    c[:, :n_bins] = (win[:, None] * np.cos(ang)).astype(np.float32)
    s[:, :n_bins] = (win[:, None] * np.sin(ang)).astype(np.float32)
    fb = mel_filterbank(cfg)                       # [n_bins, n_mels]
    fb_pad = np.zeros((n_pad, fb.shape[1]), np.float32)
    fb_pad[:n_bins] = fb
    return c, s, fb_pad


_ROWS = 8  # waveform rows per program: 8 rows × 16 frames = 128 MXU sublanes


def _kernel(wav_ref, c_ref, s_ref, fb_ref, out_ref, frames_scratch,
            *, n_fft: int, hop: int, n_frames: int, log_eps: float):
    # frame _ROWS padded waveform rows into [_ROWS·F, n_fft] VMEM scratch
    for r in range(_ROWS):
        for j in range(n_frames):
            frames_scratch[r * n_frames + j, :] = wav_ref[r, pl.ds(j * hop, n_fft)]
    x = frames_scratch[:]
    re = jnp.dot(x, c_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(x, s_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im                       # [R·F, n_bins_pad]
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log(mel + log_eps).reshape(out_ref.shape)


def log_mel_spectrogram_pallas(waveform: jnp.ndarray, cfg: MelConfig,
                               out_dtype=jnp.float32,
                               interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ops.melspec.log_mel_spectrogram.

    [..., num_samples] → [..., n_frames, n_mels]; same numerics as the XLA
    path up to fp32 round-off (DFT-matmul vs FFT butterfly order).
    """
    lead = waveform.shape[:-1]
    t = waveform.shape[-1]
    x = waveform.reshape((-1, t)).astype(jnp.float32)
    if cfg.center:
        pad = cfg.n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n = x.shape[0]
    n_pad = _round_up(max(n, 1), _ROWS)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    f = num_frames(t, cfg)
    c, s, fb = _windowed_dft_mats(cfg)
    n_mels = fb.shape[1]

    kernel = functools.partial(_kernel, n_fft=cfg.n_fft, hop=cfg.hop_length,
                               n_frames=f, log_eps=cfg.log_eps)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, x.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.n_fft, c.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.n_fft, s.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb.shape[0], n_mels), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, f, n_mels), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, f, n_mels), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_ROWS * f, cfg.n_fft), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_pad * f * cfg.n_fft * c.shape[1]
                  + 2 * n_pad * f * c.shape[1] * n_mels,
            bytes_accessed=4 * n_pad * (x.shape[1] + f * n_mels),
            transcendentals=n_pad * f * n_mels,
        ),
        interpret=interpret,
    )(x, jnp.asarray(c), jnp.asarray(s), jnp.asarray(fb))
    return out[:n].reshape(lead + (f, n_mels)).astype(out_dtype)
