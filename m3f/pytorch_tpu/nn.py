"""Minimal functional NN core: explicit pytree params, TPU-first layouts.

The reference leans on ``torch.nn`` (SURVEY.md §1 L0).  Rather than translate
torch modules, this is a small hand-rolled functional layer library designed
around XLA:

- **Layouts:** channels-last everywhere — NHWC for 2D, NDHWC for 3D — so XLA
  convolutions tile onto the MXU without transposes (torch is NCHW/NCDHW; the
  weight converter in ``train/convert.py`` handles the permutation).
- **Params vs state:** learnable params and mutable state (BatchNorm running
  stats) are separate pytrees; ``apply`` is pure:
  ``y, new_state = layer.apply(params, state, x, train=...)``.
- **dtypes:** params fp32, compute bf16 by default ("bf16 compute / fp32
  params", SURVEY §7 design stance); normalization statistics in fp32.

Each layer is a frozen dataclass: hashable, static under jit closure.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Params = Dict[str, Any]
State = Dict[str, Any]


def _fan_in_uniform(key, shape, fan_in, dtype=jnp.float32):
    """torch-style kaiming-uniform-ish default init: U(-1/sqrt(fan_in), +)."""
    bound = 1.0 / np.sqrt(max(fan_in, 1))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


@dataclass(frozen=True)
class Dense:
    in_dim: int
    out_dim: int
    use_bias: bool = True

    def init(self, key) -> Params:
        kw, kb = jax.random.split(key)
        p = {"kernel": _fan_in_uniform(kw, (self.in_dim, self.out_dim), self.in_dim)}
        if self.use_bias:
            p["bias"] = _fan_in_uniform(kb, (self.out_dim,), self.in_dim)
        return p

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        y = x @ params["kernel"].astype(x.dtype)
        if self.use_bias:
            y = y + params["bias"].astype(x.dtype)
        return y


@dataclass(frozen=True)
class Conv:
    """N-dimensional convolution, channels-last.

    Kernel layout is ``spatial... + (in, out)`` — i.e. HWIO / DHWIO — which is
    XLA's native rhs layout for channels-last convs (torch OIHW/OIDHW is
    permuted by the converter).
    """

    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...] = ()
    padding: Any = "SAME"
    use_bias: bool = False
    feature_group_count: int = 1

    def _strides(self):
        return self.strides or (1,) * len(self.kernel_size)

    def init(self, key) -> Params:
        kw, kb = jax.random.split(key)
        shape = tuple(self.kernel_size) + (self.in_channels // self.feature_group_count,
                                           self.out_channels)
        fan_in = int(np.prod(self.kernel_size)) * self.in_channels // self.feature_group_count
        p = {"kernel": _fan_in_uniform(kw, shape, fan_in)}
        if self.use_bias:
            p["bias"] = _fan_in_uniform(kb, (self.out_channels,), fan_in)
        return p

    def _norm_pad(self):
        pad = self.padding
        nd = len(self.kernel_size)
        if isinstance(pad, int):
            pad = [(pad, pad)] * nd
        elif isinstance(pad, (tuple, list)) and pad and isinstance(pad[0], int):
            pad = [(p, p) for p in pad]
        return pad

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Channels-last conv via one XLA conv_general_dilated call.

        Perf note (measured on v5e, round 1): lowering the degenerate
        R(2+1)D convs to 2D (1×k×k → batched NHWC; t×1×1 → (T, H·W)) is
        10-40% faster in ISOLATION but 2.8× slower in the full training
        graph — the reshapes around every conv break XLA's layout
        assignment and fusion. Keep the straight 3D form.
        """
        nd = len(self.kernel_size)
        kernel = params["kernel"].astype(x.dtype)
        pad = self._norm_pad()
        strides = self._strides()

        # NHWC-style dimension numbers for any rank:  N + spatial + C
        spatial = "".join("DHW"[-nd:])  # 1D->W, 2D->HW, 3D->DHW
        lhs = "N" + spatial + "C"
        rhs = spatial + "IO"
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                            (lhs, rhs, lhs))
        y = jax.lax.conv_general_dilated(
            x, kernel, strides, pad,
            dimension_numbers=dn, feature_group_count=self.feature_group_count,
            preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
        )
        y = y.astype(x.dtype)
        if self.use_bias:
            y = y + params["bias"].astype(x.dtype)
        return y


@dataclass(frozen=True)
class BatchNorm:
    """BatchNorm over the trailing channel axis (stats over all other axes).

    Matches torch BatchNorm semantics: biased batch variance for
    normalization, unbiased variance into the running estimate, fp32 stats.
    """

    num_features: int
    momentum: float = 0.1
    eps: float = 1e-5
    # two_pass=True computes var = E[(x-μ)²] (torch's order) instead of the
    # one-pass E[x²]−E[x]². The one-pass form is the TPU throughput choice
    # (stats ride ONE fused reduction; +14% train step) but cancels
    # catastrophically when σ² ≪ μ², costing ~2 digits of batch-statistics
    # accuracy — measured as ~3e-2 relative drift on the DEEPEST gradients
    # vs torch (eval mode and shallow grads agree to 1e-5). Flip on for
    # tight cross-framework training-parity checks or reduce-order-sensitive
    # studies; identical parameters/state either way.
    two_pass: bool = False

    def init(self, key) -> Tuple[Params, State]:
        del key
        p = {"scale": jnp.ones(self.num_features, jnp.float32),
             "bias": jnp.zeros(self.num_features, jnp.float32)}
        s = {"mean": jnp.zeros(self.num_features, jnp.float32),
             "var": jnp.ones(self.num_features, jnp.float32)}
        return p, s

    def apply(self, params: Params, state: State, x: jnp.ndarray,
              train: bool) -> Tuple[jnp.ndarray, State]:
        """Perf-critical on TPU: profiling showed BN statistics at 50% of the
        fusion train step when computed as mean-then-var with an fp32 affine.
        This form does (a) ONE fused pass for sum and sum-of-squares
        (var = E[x²] − E[x]², the cuDNN/torch training recipe) and (b) the
        normalize as a compute-dtype multiply-add with precomputed per-channel
        scalars, so the big activation tensor is never materialized in fp32.
        """
        axes = tuple(range(x.ndim - 1))
        if train:
            xf = x.astype(jnp.float32)
            n = float(np.prod([x.shape[a] for a in axes]))
            mean = jnp.sum(xf, axis=axes) / n
            if self.two_pass:
                d = xf - mean
                var = jnp.sum(d * d, axis=axes) / n
            else:
                s2 = jnp.sum(xf * xf, axis=axes)
                var = jnp.maximum(s2 / n - mean * mean, 0.0)
            unbiased = var * (n / max(n - 1.0, 1.0))
            new_state = {
                "mean": (1 - self.momentum) * state["mean"] + self.momentum * mean,
                "var": (1 - self.momentum) * state["var"] + self.momentum * unbiased,
            }
        else:
            mean, var = state["mean"], state["var"]
            new_state = state
        inv = jax.lax.rsqrt(var + self.eps) * params["scale"]   # fp32 [C]
        shift = params["bias"] - mean * inv                      # fp32 [C]
        y = x * inv.astype(x.dtype) + shift.astype(x.dtype)
        return y, new_state

    def affine_from_stats(self, params: Params, state: State,
                          s1: jnp.ndarray, s2: jnp.ndarray, count: float,
                          train: bool) -> Tuple[jnp.ndarray, jnp.ndarray, State]:
        """Per-channel (inv, shift) from PRECOMPUTED channel sums.

        Used by the fused conv+BN Pallas path (ops/pallas/conv_bn.py): the
        producing conv emits s1 = Σx, s2 = Σx² in its epilogue, this computes
        the same normalize affine as ``apply`` (identical formulas), and the
        affine is folded into the CONSUMING op's prologue — the activation
        never makes a standalone normalize/stats pass over HBM.
        """
        if train:
            mean = s1 / count
            var = jnp.maximum(s2 / count - mean * mean, 0.0)
            unbiased = var * (count / max(count - 1.0, 1.0))
            new_state = {
                "mean": (1 - self.momentum) * state["mean"] + self.momentum * mean,
                "var": (1 - self.momentum) * state["var"] + self.momentum * unbiased,
            }
        else:
            mean, var = state["mean"], state["var"]
            new_state = state
        inv = jax.lax.rsqrt(var + self.eps) * params["scale"]
        shift = params["bias"] - mean * inv
        return inv, shift, new_state


def relu(x):
    return jnp.maximum(x, 0)


def global_avg_pool(x: jnp.ndarray, keep_batch_dims: int = 1) -> jnp.ndarray:
    """Mean over all spatial axes: [N, *spatial, C] → [N, C]."""
    axes = tuple(range(keep_batch_dims, x.ndim - 1))
    return jnp.mean(x, axis=axes)
