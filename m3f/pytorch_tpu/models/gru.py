"""Bidirectional GRU as a TPU-friendly ``lax.scan``.

Capability parity: the reference's cuDNN ``torch.nn.GRU`` temporal-fusion head
(installed-torch anchor ``torch/nn/modules/rnn.py:1206``; SURVEY.md §2.2).
Equations and weight layout follow torch exactly so checkpoints convert by a
transpose (SURVEY §3.5, §7 "Weight converter correctness"):

    r = σ(x W_ir + b_ir + h W_hr + b_hr)
    z = σ(x W_iz + b_iz + h W_hz + b_hz)
    n = tanh(x W_in + b_in + r ⊙ (h W_hn + b_hn))
    h' = (1 − z) ⊙ n + z ⊙ h

gate order (r, z, n), separate b_ih / b_hh (the n-gate needs b_hn inside the
r-product, so the two biases are NOT foldable).

TPU design (SURVEY §7 "BiGRU on TPU"):
- The input projection ``x @ W_ih`` for ALL timesteps is hoisted out of the
  scan as ONE [B·T, D]×[D, 3H] MXU matmul.
- The scan body does only the [B, H]×[H, 3H] recurrent matmul + VPU
  elementwise — the minimum sequential work the recurrence permits.
- Both directions share one scan: the input is stacked [2, T, B, 3H] with the
  second lane time-reversed, so forward and backward run as a single batched
  recurrence (one [2B, H]×[H·…] step), halving scan overhead vs two scans.
- ``unroll=4`` amortizes loop overhead; h is carried in fp32 for stability,
  matmuls run in the compute dtype.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from m3f.pytorch_tpu.nn import Params, _fan_in_uniform


def _gru_scan(x_proj: jnp.ndarray, h0: jnp.ndarray, w_hh: jnp.ndarray,
              b_hh: jnp.ndarray, unroll: int = 4) -> jnp.ndarray:
    """Run the GRU recurrence.

    x_proj: [T, B, 3H]  (input projection + b_ih already added)
    h0:     [B, H] fp32
    w_hh:   [H, 3H], b_hh: [3H]
    returns [T, B, H] hidden states (compute dtype of x_proj).
    """
    hdim = h0.shape[-1]
    dtype = x_proj.dtype

    def step(h, xp):
        hp = (h.astype(dtype) @ w_hh.astype(dtype)).astype(jnp.float32) + b_hh
        xr, xz, xn = xp[..., :hdim], xp[..., hdim:2 * hdim], xp[..., 2 * hdim:]
        hr, hz, hn = hp[..., :hdim], hp[..., hdim:2 * hdim], hp[..., 2 * hdim:]
        r = jax.nn.sigmoid(xr.astype(jnp.float32) + hr)
        z = jax.nn.sigmoid(xz.astype(jnp.float32) + hz)
        n = jnp.tanh(xn.astype(jnp.float32) + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new.astype(dtype)

    _, ys = jax.lax.scan(step, h0, x_proj, unroll=unroll)
    return ys


@dataclass(frozen=True)
class GRU:
    """Single-direction, single-layer GRU (building block)."""

    in_dim: int
    hidden: int

    def init(self, key) -> Params:
        k = jax.random.split(key, 4)
        fan = self.hidden  # torch initializes all GRU weights U(-1/sqrt(H), ...)
        return {
            "w_ih": _fan_in_uniform(k[0], (self.in_dim, 3 * self.hidden), fan),
            "w_hh": _fan_in_uniform(k[1], (self.hidden, 3 * self.hidden), fan),
            "b_ih": _fan_in_uniform(k[2], (3 * self.hidden,), fan),
            "b_hh": _fan_in_uniform(k[3], (3 * self.hidden,), fan),
        }

    def apply(self, params: Params, x: jnp.ndarray,
              h0: Optional[jnp.ndarray] = None, reverse: bool = False) -> jnp.ndarray:
        """x: [B, T, D] → [B, T, H]."""
        b, t, _ = x.shape
        if h0 is None:
            h0 = jnp.zeros((b, self.hidden), jnp.float32)
        xp = x @ params["w_ih"].astype(x.dtype) + params["b_ih"].astype(x.dtype)
        xp = jnp.swapaxes(xp, 0, 1)  # [T, B, 3H]
        if reverse:
            xp = xp[::-1]
        ys = _gru_scan(xp, h0.astype(jnp.float32), params["w_hh"], params["b_hh"])
        if reverse:
            ys = ys[::-1]
        return jnp.swapaxes(ys, 0, 1)


@dataclass(frozen=True)
class BiGRU:
    """Bidirectional multi-layer GRU, torch ``nn.GRU(bidirectional=True)`` parity.

    Output is [B, T, 2H] (forward‖backward concat per timestep). Both
    directions of a layer run as ONE batched scan over a [T, 2B, ...] stack.

    ``backend="pallas"`` routes the recurrence through the VMEM-resident
    pallas kernel (ops/pallas/gru_pallas.py) — two calls per layer, one per
    direction; default stays on the XLA scan.
    """

    in_dim: int
    hidden: int
    num_layers: int = 1
    backend: str = "xla"
    bidirectional: bool = True

    def layer_dims(self):
        out_mult = 2 if self.bidirectional else 1
        dims = [self.in_dim] + [out_mult * self.hidden] * (self.num_layers - 1)
        return dims

    def init(self, key) -> Params:
        layers = []
        for li, d in enumerate(self.layer_dims()):
            kf, kb, key = jax.random.split(key, 3)
            layer = {"fwd": GRU(d, self.hidden).init(kf)}
            if self.bidirectional:
                layer["bwd"] = GRU(d, self.hidden).init(kb)
            layers.append(layer)
        return {"layers": layers}

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        b, t, _ = x.shape
        h = x
        for li, layer in enumerate(params["layers"]):
            if not self.bidirectional:
                # torch nn.GRU(bidirectional=False) parity: forward scan only
                gru = GRU(self.layer_dims()[li], self.hidden)
                h = gru.apply(layer["fwd"], h)
                continue
            pf, pb = layer["fwd"], layer["bwd"]
            # fused input projections for both directions: two MXU matmuls
            xp_f = h @ pf["w_ih"].astype(h.dtype) + pf["b_ih"].astype(h.dtype)
            xp_b = h @ pb["w_ih"].astype(h.dtype) + pb["b_ih"].astype(h.dtype)
            if self.backend == "pallas":
                from m3f.pytorch_tpu.ops.pallas.gru_pallas import gru_scan_pallas
                ys_f = gru_scan_pallas(jnp.swapaxes(xp_f, 0, 1),
                                       pf["w_hh"], pf["b_hh"])
                ys_b = gru_scan_pallas(jnp.swapaxes(xp_b, 0, 1)[::-1],
                                       pb["w_hh"], pb["b_hh"])
                h = jnp.concatenate([jnp.swapaxes(ys_f, 0, 1),
                                     jnp.swapaxes(ys_b[::-1], 0, 1)], axis=-1)
                continue
            # stack [T, 2B, 3H]: lane 0 = forward in time order, lane 1 = reversed
            xp = jnp.concatenate([
                jnp.swapaxes(xp_f, 0, 1),
                jnp.swapaxes(xp_b, 0, 1)[::-1],
            ], axis=1)
            w_hh = jnp.stack([pf["w_hh"], pb["w_hh"]])      # [2, H, 3H]
            b_hh = jnp.stack([pf["b_hh"], pb["b_hh"]])      # [2, 3H]
            hdim = self.hidden
            dtype = h.dtype

            def step(hc, xp_t, _w=w_hh, _b=b_hh):
                # hc: [2, B, H] fp32;  xp_t: [2B, 3H] → [2, B, 3H]
                xp2 = xp_t.reshape(2, b, 3 * hdim)
                hp = jnp.einsum("dbh,dhg->dbg", hc.astype(dtype), _w.astype(dtype)
                                ).astype(jnp.float32) + _b[:, None, :]
                xr, xz, xn = jnp.split(xp2.astype(jnp.float32), 3, axis=-1)
                hr, hz, hn = jnp.split(hp, 3, axis=-1)
                r = jax.nn.sigmoid(xr + hr)
                z = jax.nn.sigmoid(xz + hz)
                n = jnp.tanh(xn + r * hn)
                h_new = (1.0 - z) * n + z * hc
                return h_new, h_new.astype(dtype)

            h0 = jnp.zeros((2, b, hdim), jnp.float32)
            _, ys = jax.lax.scan(step, h0, xp.reshape(t, 2 * b, 3 * hdim), unroll=4)
            # ys: [T, 2, B, H] → forward lane in time order, backward lane un-reversed
            y_f = jnp.swapaxes(ys[:, 0], 0, 1)            # [B, T, H]
            y_b = jnp.swapaxes(ys[::-1, 1], 0, 1)         # [B, T, H]
            h = jnp.concatenate([y_f, y_b], axis=-1)      # [B, T, 2H]
        return h
