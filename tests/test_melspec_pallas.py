"""Pallas fused log-mel kernel vs the XLA reference path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from m3f.pytorch_tpu.config import MelConfig
from m3f.pytorch_tpu.ops.melspec import log_mel_spectrogram
from m3f.pytorch_tpu.ops.pallas.melspec_pallas import (
    _windowed_dft_mats, log_mel_spectrogram_pallas)

CFG = MelConfig()


def test_windowed_dft_matches_rfft():
    """x @ C' + i·x @ S' == rfft(win * x) for a random frame."""
    c, s, fb = _windowed_dft_mats(CFG)
    rng = np.random.RandomState(0)
    x = rng.randn(CFG.n_fft).astype(np.float32)
    from m3f.pytorch_tpu.ops.melspec import hann_window
    want = np.fft.rfft(hann_window(CFG.n_fft) * x)
    n_bins = CFG.n_fft // 2 + 1
    got = x @ c[:, :n_bins] + 1j * (x @ s[:, :n_bins])
    np.testing.assert_allclose(got.real, want.real, atol=2e-3)
    np.testing.assert_allclose(got.imag, want.imag, atol=2e-3)
    # padding columns are inert
    assert (c[:, n_bins:] == 0).all() and (fb[n_bins:] == 0).all()


def test_pallas_matches_xla_path():
    rng = np.random.RandomState(1)
    spw = (16 - 1) * CFG.hop_length
    wav = rng.randn(2, 3, spw).astype(np.float32) * 0.3
    with jax.default_matmul_precision("highest"):
        want = np.asarray(log_mel_spectrogram(jnp.asarray(wav), CFG))
        got = np.asarray(log_mel_spectrogram_pallas(jnp.asarray(wav), CFG,
                                                    interpret=True))
    assert got.shape == want.shape == (2, 3, 16, CFG.n_mels)
    # log-domain agreement; DFT-matmul vs FFT butterfly round-off
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-4)
