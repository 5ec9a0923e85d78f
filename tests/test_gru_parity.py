"""BiGRU vs torch.nn.GRU golden parity (SURVEY §4; converter per §3.5)."""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

# This XLA CPU backend mirrors TPU matmul precision semantics: DEFAULT is a
# single bf16 pass (~1e-2 error). Golden parity runs at HIGHEST (true fp32).
highest = lambda: jax.default_matmul_precision("highest")

from m3f.pytorch_tpu.models.gru import GRU, BiGRU
from m3f.pytorch_tpu.train.convert import convert_gru, export_gru


def _torch_gru(in_dim, hidden, bidirectional, num_layers=1, seed=0):
    torch.manual_seed(seed)
    return torch.nn.GRU(in_dim, hidden, num_layers=num_layers,
                        batch_first=True, bidirectional=bidirectional)


def test_unidirectional_parity():
    tg = _torch_gru(32, 48, bidirectional=False)
    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}
    params = convert_gru(sd, "", num_layers=1, bidirectional=False)
    # convert_gru expects "prefix.weight..." keys; empty prefix yields ".weight..."
    x = np.random.RandomState(0).randn(4, 10, 32).astype(np.float32)
    want, _ = tg(torch.from_numpy(x))
    with highest():
        got = GRU(32, 48).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=1e-3, atol=5e-5)


def test_bidirectional_parity():
    tg = _torch_gru(24, 40, bidirectional=True, seed=1)
    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}
    params = convert_gru(sd, "", num_layers=1, bidirectional=True)
    x = np.random.RandomState(1).randn(3, 16, 24).astype(np.float32)
    want, _ = tg(torch.from_numpy(x))
    with highest():
        got = BiGRU(24, 40).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=1e-3, atol=5e-5)


def test_two_layer_bidirectional_parity():
    tg = _torch_gru(16, 32, bidirectional=True, num_layers=2, seed=2)
    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}
    params = convert_gru(sd, "", num_layers=2, bidirectional=True)
    x = np.random.RandomState(2).randn(2, 12, 16).astype(np.float32)
    want, _ = tg(torch.from_numpy(x))
    with highest():
        got = BiGRU(16, 32, num_layers=2).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=1e-3, atol=5e-5)


def test_bigru_unidirectional_flag_parity():
    """BiGRU(bidirectional=False) — the gru.bidirectional config path."""
    tg = _torch_gru(20, 24, bidirectional=False, seed=4)
    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}
    uni = BiGRU(20, 24, bidirectional=False)
    params = {"layers": [{"fwd": convert_gru(sd, "", 1, False)}]}
    x = np.random.RandomState(4).randn(2, 9, 20).astype(np.float32)
    want, _ = tg(torch.from_numpy(x))
    with highest():
        got = uni.apply(params, jnp.asarray(x))
    assert got.shape == (2, 9, 24)  # H, not 2H
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=1e-3, atol=5e-5)


def test_converter_round_trip():
    tg = _torch_gru(8, 12, bidirectional=True, seed=3)
    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}
    params = convert_gru(sd, "", num_layers=1, bidirectional=True)
    out = {}
    export_gru(params, "", out)
    for k, v in sd.items():
        np.testing.assert_array_equal(out[k], v)


def test_long_sequence_stability():
    # 512-step scan in bf16 compute must stay finite and bounded
    key_params = BiGRU(16, 32).init(__import__("jax").random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(3).randn(2, 512, 16), jnp.bfloat16)
    y = BiGRU(16, 32).apply(key_params, x)
    assert y.shape == (2, 512, 64)
    assert np.isfinite(np.asarray(y, np.float32)).all()
    assert np.abs(np.asarray(y, np.float32)).max() <= 1.0 + 1e-2  # GRU h bounded by tanh dynamics
