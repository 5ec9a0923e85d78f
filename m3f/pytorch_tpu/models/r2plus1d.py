"""R(2+1)D visual backbone over 16x112x112 face clips, NDHWC.

Capability parity: reference ``models/r2plus1d.py`` — "3D-CNN
(R(2+1)D/3D-ResNet-style) visual backbone", pretrained-video-weights lineage
(SURVEY.md §2.1 C4, §3.4; BASELINE.json north_star). Architecture follows the
standard R(2+1)D-18 recipe (Tran et al. 2018, as in torchvision
``video/resnet.py`` — the layout golden-parity tests convert those weights):

- stem: 1x7x7 s(1,2,2) conv → 45 mid → BN/ReLU → 3x1x1 conv → 64 → BN/ReLU
- 4 stages of 2 basic blocks, channels (64, 128, 256, 512), stages 2-4
  downsample by (2,2,2) with a 1x1x1 projection shortcut
- every 3x3x3 conv is factorized spatial(1x3x3) → BN/ReLU → temporal(3x1x1)
  with the FLOP-matched midplane count
  M = ⌊ t·d²·Cin·Cout / (d²·Cin + t·Cout) ⌋  (t = d = 3)
- global average pool → [B, 512]

TPU design: NDHWC throughout so XLA lowers each conv to MXU-tiled
convolutions without layout transposes; BN+ReLU fuse into the conv epilogues;
bf16 activations with fp32 BN statistics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from m3f.pytorch_tpu.config import VisualNetConfig
from m3f.pytorch_tpu.nn import (BatchNorm, Conv, Dense, Params, State, relu,
                                global_avg_pool)


def midplanes(in_c: int, out_c: int, t: int = 3, d: int = 3,
              mode: str = "flops") -> int:
    """Intermediate width of the (2+1)D factorization.

    ``flops``: torchvision's FLOP-matched formula (checkpoint compatible).
    ``lane``: that value rounded to the nearest multiple of 128 (min 128) so
    the mid tensors fill whole TPU lane tiles — a 144-channel stage-1 tensor
    tiles as 2×128 lanes (56% occupancy); 128 tiles exactly. Measured impact
    in BASELINE.md.
    """
    mid = (t * d * d * in_c * out_c) // (d * d * in_c + t * out_c)
    if mode == "lane":
        return max(128, ((mid + 63) // 128) * 128)
    if mode != "flops":
        raise ValueError(f"unknown mid_mode {mode!r}")
    return mid


def space_to_depth_hw(x: jnp.ndarray) -> jnp.ndarray:
    """[B, T, H, W, C] → [B, T, H/2, W/2, 4C], packing each 2x2 spatial tile
    into channels ordered (py, px, c) — the layout `s2d_stem_kernel` matches."""
    B, T, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0, \
        f"stem_s2d needs even spatial dims, got {H}x{W}"
    x = x.reshape(B, T, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(B, T, H // 2, W // 2, 4 * C)


def s2d_stem_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """Re-tile a [kt, 7, 7, ci, co] stride-2 stem kernel for s2d input.

    A 7x7 stride-2 conv with padding 3 equals an 8x8 stride-2 conv whose
    leading row/col are zero; over 2x2-packed input that is a 4x4 stride-1
    conv with channel depth 4·ci and padding (2, 1): tap (ky, py) of the
    packed kernel reads original row 2·ky + py − 1. Exact math — only the
    within-dot summation order changes.
    """
    kt, kh, kw, ci, co = k.shape
    assert (kh, kw) == (7, 7), f"s2d stem expects a 7x7 kernel, got {kh}x{kw}"
    k = jnp.pad(k, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
    k = k.reshape(kt, 4, 2, 4, 2, ci, co)
    k = k.transpose(0, 1, 3, 2, 4, 5, 6)        # [kt, ky, kx, py, px, ci, co]
    return k.reshape(kt, 4, 4, 4 * ci, co)


@dataclass(frozen=True)
class Conv2Plus1D:
    """Factorized 3D conv: spatial 1xdxd → BN → ReLU → temporal tx1x1.

    ``mid`` (the factorization width) is supplied by the caller: torchvision's
    BasicBlock computes midplanes ONCE from (block_in, block_out) and reuses
    it for BOTH convs of the block (video/resnet.py), so checkpoint
    compatibility requires taking it as a parameter, not deriving it here.
    """

    in_c: int
    out_c: int
    mid: int
    stride: Tuple[int, int, int] = (1, 1, 1)
    bn_two_pass: bool = False

    def _layers(self):
        mid = self.mid
        st, sh, sw = self.stride
        spatial = Conv(self.in_c, mid, (1, 3, 3), strides=(1, sh, sw),
                       padding=((0, 0), (1, 1), (1, 1)))
        temporal = Conv(mid, self.out_c, (3, 1, 1), strides=(st, 1, 1),
                        padding=((1, 1), (0, 0), (0, 0)))
        return spatial, BatchNorm(mid, two_pass=self.bn_two_pass), temporal

    def init(self, key):
        ks, kt = jax.random.split(key)
        spatial, bn, temporal = self._layers()
        bp, bs = bn.init(None)
        return ({"spatial": spatial.init(ks), "bn_mid": bp, "temporal": temporal.init(kt)},
                {"bn_mid": bs})

    def apply(self, params, state, x, train):
        spatial, bn, temporal = self._layers()
        x = spatial.apply(params["spatial"], x)
        x, ns = bn.apply(params["bn_mid"], state["bn_mid"], x, train)
        x = relu(x)
        x = temporal.apply(params["temporal"], x)
        return x, {"bn_mid": ns}

    def apply_fused(self, params, state, x, train, inv_in=None, shift_in=None):
        """Fused-kernel path (stride-1 only): spatial conv_unit → mid-BN affine
        folded into the temporal conv_unit's prologue. Returns the temporal
        conv's output plus ITS channel stats (for the caller's BatchNorm).
        Identical parameters and math as ``apply`` (ops/pallas/conv_bn.py)."""
        from m3f.pytorch_tpu.ops.pallas.conv_bn import conv_unit
        assert self.stride == (1, 1, 1), "fused path is stride-1 only"
        ws = params["spatial"]["kernel"][0]           # (1,3,3,ci,mid) → [3,3,ci,mid]
        y1, s1, s2 = conv_unit(x, ws, inv_in, shift_in, kind="spatial")
        count = float(np.prod(y1.shape[:-1]))
        inv_m, shift_m, ns = BatchNorm(self.mid).affine_from_stats(
            params["bn_mid"], state["bn_mid"], s1, s2, count, train)
        wt = params["temporal"]["kernel"][:, 0, 0]    # (3,1,1,mid,co) → [3,mid,co]
        y2, s1b, s2b = conv_unit(y1, wt, inv_m, shift_m, kind="temporal")
        return y2, (s1b, s2b), {"bn_mid": ns}


@dataclass(frozen=True)
class BasicBlock:
    in_c: int
    out_c: int
    stride: Tuple[int, int, int] = (1, 1, 1)
    bn_two_pass: bool = False
    # Squeeze-excitation side branch after bn2 (SURVEY §3.4 notes the
    # reference MAY carry an SE variant — flag-gated so the default stays
    # exactly the torchvision recipe and checkpoint-compatible). >0 = the
    # channel reduction ratio (16 is the SE-Net default).
    se_ratio: int = 0
    mid_mode: str = "flops"
    # conv family of this block: "2plus1d" (factorized, the default) |
    # "3d" (3x3x3, r3d_18) | "no_temporal" ((1,3,3), mc3_18 stages 2-4)
    conv_kind: str = "2plus1d"

    @property
    def has_downsample(self) -> bool:
        return self.stride != (1, 1, 1) or self.in_c != self.out_c

    def _layers(self):
        if self.conv_kind == "2plus1d":
            # ONE midplane count per block, from (in_c, out_c), shared by both
            # convs — the torchvision VideoResNet recipe (checkpoint compat)
            mid = midplanes(self.in_c, self.out_c, mode=self.mid_mode)
            conv1 = Conv2Plus1D(self.in_c, self.out_c, mid, self.stride,
                                bn_two_pass=self.bn_two_pass)
            conv2 = Conv2Plus1D(self.out_c, self.out_c, mid,
                                bn_two_pass=self.bn_two_pass)
        elif self.conv_kind in ("3d", "no_temporal"):
            k, pad = (((3, 3, 3), ((1, 1), (1, 1), (1, 1)))
                      if self.conv_kind == "3d"
                      else ((1, 3, 3), ((0, 0), (1, 1), (1, 1))))
            conv1 = Conv(self.in_c, self.out_c, k, strides=self.stride,
                         padding=pad)
            conv2 = Conv(self.out_c, self.out_c, k, padding=pad)
        else:
            raise ValueError(f"unknown conv_kind {self.conv_kind!r} "
                             "(2plus1d | 3d | no_temporal)")
        down = Conv(self.in_c, self.out_c, (1, 1, 1), strides=self.stride,
                    padding="VALID") if self.has_downsample else None
        bn = lambda: BatchNorm(self.out_c, two_pass=self.bn_two_pass)
        return conv1, bn(), conv2, bn(), down

    def _se(self):
        r = max(self.out_c // self.se_ratio, 1)
        return Dense(self.out_c, r), Dense(r, self.out_c)

    def init(self, key):
        k1, k2, kd, ks1, ks2 = jax.random.split(key, 5)
        conv1, bn1, conv2, bn2, down = self._layers()
        if self.conv_kind == "2plus1d":
            p1, s1 = conv1.init(k1)
            p2, s2 = conv2.init(k2)
        else:  # plain convs carry no inner BN state
            p1, s1 = conv1.init(k1), None
            p2, s2 = conv2.init(k2), None
        bp1, bs1 = bn1.init(None)
        bp2, bs2 = bn2.init(None)
        params = {"conv1": p1, "bn1": bp1, "conv2": p2, "bn2": bp2}
        state = {"bn1": bs1, "bn2": bs2}
        if s1 is not None:
            state["conv1"] = s1
            state["conv2"] = s2
        if down is not None:
            params["down"] = down.init(kd)
            bpd, bsd = BatchNorm(self.out_c, two_pass=self.bn_two_pass).init(None)
            params["bn_down"] = bpd
            state["bn_down"] = bsd
        if self.se_ratio:
            fc1, fc2 = self._se()
            params["se"] = {"fc1": fc1.init(ks1), "fc2": fc2.init(ks2)}
        return params, state

    def apply(self, params, state, x, train):
        conv1, bn1, conv2, bn2, down = self._layers()
        ns = {}
        if self.conv_kind == "2plus1d":
            y, ns["conv1"] = conv1.apply(params["conv1"], state["conv1"], x, train)
        else:
            y = conv1.apply(params["conv1"], x)
        y, ns["bn1"] = bn1.apply(params["bn1"], state["bn1"], y, train)
        y = relu(y)
        if self.conv_kind == "2plus1d":
            y, ns["conv2"] = conv2.apply(params["conv2"], state["conv2"], y, train)
        else:
            y = conv2.apply(params["conv2"], y)
        y, ns["bn2"] = bn2.apply(params["bn2"], state["bn2"], y, train)
        if self.se_ratio:
            # squeeze: GAP over (T, H, W) → [B, C]; excite: bottleneck MLP →
            # per-channel sigmoid gate on the residual branch (fp32 gate math)
            fc1, fc2 = self._se()
            w = jnp.mean(y.astype(jnp.float32), axis=(1, 2, 3))
            w = fc2.apply(params["se"]["fc2"],
                          relu(fc1.apply(params["se"]["fc1"], w)))
            y = y * jax.nn.sigmoid(w)[:, None, None, None, :].astype(y.dtype)
        if down is not None:
            sc = down.apply(params["down"], x)
            sc, ns["bn_down"] = BatchNorm(self.out_c, two_pass=self.bn_two_pass).apply(
                params["bn_down"], state["bn_down"], sc, train)
        else:
            sc = x
        return relu(y + sc), ns

    def apply_fused(self, params, state, x, train):
        """Fused-kernel block (identity-shortcut, stride-1 blocks only):
        both Conv2Plus1D units run as Pallas conv_units with the BN affines
        riding prologues/epilogues; only bn2's normalize + residual add +
        relu remain as (fusable) XLA elementwise ops."""
        conv1, bn1, conv2, bn2, down = self._layers()
        assert down is None and self.stride == (1, 1, 1)
        ns = {}
        y, (s1a, s2a), ns["conv1"] = conv1.apply_fused(
            params["conv1"], state["conv1"], x, train)
        count = float(np.prod(x.shape[:-1]))
        inv1, shift1, ns["bn1"] = bn1.affine_from_stats(
            params["bn1"], state["bn1"], s1a, s2a, count, train)
        y2, (s1b, s2b), ns["conv2"] = conv2.apply_fused(
            params["conv2"], state["conv2"], y, train, inv1, shift1)
        inv2, shift2, ns["bn2"] = bn2.affine_from_stats(
            params["bn2"], state["bn2"], s1b, s2b, count, train)
        y2n = y2 * inv2.astype(y2.dtype) + shift2.astype(y2.dtype)
        return relu(y2n + x), ns


@dataclass(frozen=True)
class R2Plus1D:
    cfg: VisualNetConfig

    def _stem(self):
        if self.cfg.conv_mode != "2plus1d":
            # torchvision BasicStem (r3d_18 / mc3_18): ONE (3,7,7) conv
            return (Conv(3, self.cfg.stem_channels, (3, 7, 7),
                         strides=(1, 2, 2),
                         padding=((1, 1), (3, 3), (3, 3))),
                    BatchNorm(self.cfg.stem_channels,
                              two_pass=self.cfg.bn_two_pass),
                    None, None)
        return (Conv(3, 45, (1, 7, 7), strides=(1, 2, 2),
                     padding=((0, 0), (3, 3), (3, 3))),
                BatchNorm(45, two_pass=self.cfg.bn_two_pass),
                Conv(45, self.cfg.stem_channels, (3, 1, 1),
                     padding=((1, 1), (0, 0), (0, 0))),
                BatchNorm(self.cfg.stem_channels,
                          two_pass=self.cfg.bn_two_pass))

    def _block_kind(self, si: int) -> str:
        if self.cfg.mid_mode != "flops" and self.cfg.conv_mode != "2plus1d":
            # the lane midplanes variant only exists for the factorized
            # family — silently ignoring it would fake the +35% variant
            raise ValueError(
                f"mid_mode={self.cfg.mid_mode!r} has no effect with "
                f"conv_mode={self.cfg.conv_mode!r} (midplanes are a (2+1)D "
                "factorization concept) — drop one of the two")
        if self.cfg.conv_mode == "2plus1d":
            return "2plus1d"
        if self.cfg.conv_mode == "3d":
            return "3d"
        if self.cfg.conv_mode == "mc3":
            # mc3_18: full 3d in stage 1, spatial-only convs after
            return "3d" if si == 0 else "no_temporal"
        raise ValueError(f"unknown conv_mode {self.cfg.conv_mode!r}")

    def _blocks(self):
        blocks = []
        in_c = self.cfg.stem_channels
        for si, (out_c, n) in enumerate(zip(self.cfg.block_channels,
                                            self.cfg.blocks_per_stage)):
            kind = self._block_kind(si)
            for bi in range(n):
                if si > 0 and bi == 0:
                    # no-temporal stages downsample spatially only
                    # (torchvision Conv3DNoTemporal.get_downsample_stride)
                    stride = (1, 2, 2) if kind == "no_temporal" else (2, 2, 2)
                else:
                    stride = (1, 1, 1)
                blocks.append(BasicBlock(in_c, out_c, stride,
                                         bn_two_pass=self.cfg.bn_two_pass,
                                         se_ratio=self.cfg.se_ratio,
                                         mid_mode=self.cfg.mid_mode,
                                         conv_kind=kind))
                in_c = out_c
        return blocks

    def init(self, key) -> Tuple[Params, State]:
        s_conv1, s_bn1, s_conv2, s_bn2 = self._stem()
        blocks = self._blocks()
        keys = jax.random.split(key, len(blocks) + 2)
        bp1, bs1 = s_bn1.init(None)
        params = {"stem": {"conv1": s_conv1.init(keys[0]), "bn1": bp1},
                  "blocks": []}
        state = {"stem": {"bn1": bs1}, "blocks": []}
        if s_conv2 is not None:
            bp2, bs2 = s_bn2.init(None)
            params["stem"]["conv2"] = s_conv2.init(keys[1])
            params["stem"]["bn2"] = bp2
            state["stem"]["bn2"] = bs2
        for i, blk in enumerate(blocks):
            p, s = blk.init(keys[i + 2])
            params["blocks"].append(p)
            state["blocks"].append(s)
        return params, state

    def apply(self, params: Params, state: State, clips: jnp.ndarray,
              train: bool = False, per_frame: bool = False) -> Tuple[jnp.ndarray, State]:
        """clips: [B, T=16, H=112, W=112, 3] → [B, feature_dim].

        ``per_frame=True`` pools SPATIAL axes only, keeping the backbone's
        temporal feature map [B, T', feature_dim]. T' depends on the conv
        family: 2plus1d/3d stride time by 2 per stage after the first
        (T' = T / 2^(stages-1)); mc3 never strides time (T' = T). The
        per-frame head upsamples T' → T generically outside; no parameters
        differ from the pooled mode.
        """
        s_conv1, s_bn1, s_conv2, s_bn2 = self._stem()
        if self.cfg.stem_s2d:
            # exact-math space-to-depth rewrite of the stride-(1,2,2) stem
            # conv (config docstring); parameters stay in checkpoint layout,
            # the kernel is re-tiled at trace time
            k = params["stem"]["conv1"]["kernel"]
            kt = k.shape[0]
            conv = Conv(4 * k.shape[3], k.shape[4], (kt, 4, 4),
                        strides=(1, 1, 1),
                        padding=((kt // 2, kt // 2), (2, 1), (2, 1)))
            x = conv.apply({"kernel": s2d_stem_kernel(k)},
                           space_to_depth_hw(clips))
        else:
            x = s_conv1.apply(params["stem"]["conv1"], clips)
        x, ns1 = s_bn1.apply(params["stem"]["bn1"], state["stem"]["bn1"], x, train)
        x = relu(x)
        new_state = {"stem": {"bn1": ns1}, "blocks": []}
        if s_conv2 is not None:
            x = s_conv2.apply(params["stem"]["conv2"], x)
            x, ns2 = s_bn2.apply(params["stem"]["bn2"], state["stem"]["bn2"],
                                 x, train)
            x = relu(x)
            new_state["stem"]["bn2"] = ns2
        # the fused conv path computes BN stats as s1/s2 epilogues — one-pass
        # by construction — so two-pass BN routes through the XLA composition
        # (and only exists for the factorized (2+1)D conv units)
        fused = self.cfg.conv_backend == "pallas_fused" \
            and not self.cfg.bn_two_pass and self.cfg.conv_mode == "2plus1d"
        if fused:
            from m3f.pytorch_tpu.ops.pallas import conv_bn
            # the all-Pallas backward needs its dW accumulator in VMEM —
            # only viable for the small-channel stages; the default hybrid
            # (Pallas fwd + XLA bwd) has no such limit
            max_c = 128 if conv_bn.backward_impl == "pallas" else 1 << 30
        for blk, bp, bs in zip(self._blocks(), params["blocks"], state["blocks"]):
            if fused and not blk.has_downsample and blk.out_c <= max_c \
                    and not blk.se_ratio:
                x, ns = blk.apply_fused(bp, bs, x, train)
            else:
                x, ns = blk.apply(bp, bs, x, train)
            new_state["blocks"].append(ns)
        if per_frame:
            return jnp.mean(x, axis=(2, 3)), new_state  # [B, T', C]
        return global_avg_pool(x), new_state
