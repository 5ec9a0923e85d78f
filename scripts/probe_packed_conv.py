"""Packed-layout (channels-major) stage-1 spatial conv probe — VERDICT r3 #1.

The bar (BASELINE.md "Corrected kernel-level probe"): in-graph XLA runs the
stage-1 spatial conv [32,16,56,56,64]->144 at 2.83 ms (94 TF/s, 24% of bf16
peak). The loss is the lane-padding wall: with channels minor, the implicit
GEMM pads N=144->256 (56%) and K per tap 64->128 (50%).

This probe flips the layout: X stored CHANNELS-MAJOR [BT, C, H*W] so
positions ride the LANE dim (3136 -> 25 whole tiles) and output channels
ride SUBLANES (144 = 18x8, zero pad). The conv becomes
    Y^T[144, N] = W^T[144, 576] @ P[576, N]
with im2col patches P built in VMEM from 9 lane-shifted slabs of the
(margin-padded) image. MXU pad waste is then only K=576->640 (90% ceiling
= ~354 TF/s) instead of ~51%.

Run on the real chip:  python scripts/probe_packed_conv.py [--iters 30]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from m3f.pytorch_tpu.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# stage-1 shape (BASELINE.md bar); M3F_PROBE_COUT=128 probes the
# lane-variant shape (whole stationary MXU tiles, no COUT pad)
import os as _os
B, T, H, W, CIN, COUT = 32, 16, 56, 56, 64, int(
    _os.environ.get("M3F_PROBE_COUT", "144"))
BT = B * T
HW = H * W                      # 3136
HWP = ((HW + 127) // 128) * 128  # 3200 (25 lane tiles)
MARGIN = 128                    # halo >= 57 AND lane-tile aligned
HWM = HWP + 2 * MARGIN          # stored lane extent per image
TAPS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
K = len(TAPS) * CIN             # 576


def _conv_kernel(x_ref, w_ref, y_ref, p_ref, *, out_f32: bool):
    """One (b,t) image: im2col in VMEM + one MXU matmul.

    x_ref: [CIN, HWM] bf16, margins (MARGIN lanes each side) AND the
           HW..HWP tail pre-zeroed by the caller.
    w_ref: [COUT, K] bf16 (w_cm[o, t*CIN+c] = torch-layout W[dy,dx,c,o]).
    y_ref: [COUT, HWP] f32/bf16.
    """
    # column masks for the x-edge wrap (position p = y*W + x; dx=-1 at x=0
    # and dx=+1 at x=W-1 read the neighboring row's opposite edge) — built
    # in-kernel from a lane iota (pallas kernels can't capture constants)
    p = jax.lax.broadcasted_iota(jnp.int32, (1, HWP), 1)
    x_col = p % W
    mask_l = (x_col != 0).astype(jnp.bfloat16)
    mask_r = (x_col != W - 1).astype(jnp.bfloat16)
    # im2col into VMEM scratch: 9 lane-shifted slabs stacked on sublanes.
    # (A jnp.concatenate of the shifted views trips Mosaic — each view
    # carries a different lane-offset layout; the stores normalize them.)
    for t, (dy, dx) in enumerate(TAPS):
        s = dy * W + dx
        slab = x_ref[0, :, MARGIN + s: MARGIN + s + HWP]
        if dx == -1:
            slab = slab * mask_l
        elif dx == 1:
            slab = slab * mask_r
        p_ref[t * CIN:(t + 1) * CIN, :] = slab
    acc = jnp.dot(w_ref[:], p_ref[:],
                  preferred_element_type=jnp.float32)   # [COUT, HWP]
    y_ref[0] = acc if out_f32 else acc.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("out_f32",))
def packed_conv(x_cm: jax.Array, w_cm: jax.Array, out_f32: bool = False):
    """x_cm [BT, CIN, HWM] bf16 (margins zeroed) -> y [BT, COUT, HWP]."""
    out_dtype = jnp.float32 if out_f32 else jnp.bfloat16
    return pl.pallas_call(
        functools.partial(_conv_kernel, out_f32=out_f32),
        out_shape=jax.ShapeDtypeStruct((BT, COUT, HWP), out_dtype),
        grid=(BT,),
        in_specs=[
            pl.BlockSpec((1, CIN, HWM), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((COUT, K), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, COUT, HWP), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K, HWP), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=2 * BT * HW * K * COUT,
            bytes_accessed=BT * (CIN * HWM + COUT * HWP) * 2,
            transcendentals=0,
        ),
    )(x_cm, w_cm)


# --------------------------------------------------------------------------
# Ablations: where does the time go?
# --------------------------------------------------------------------------

def _slab_only_kernel(x_ref, w_ref, y_ref, p_ref):
    """im2col build WITHOUT the matmul (VPU shifted-copy cost)."""
    p = jax.lax.broadcasted_iota(jnp.int32, (1, HWP), 1)
    x_col = p % W
    mask_l = (x_col != 0).astype(jnp.bfloat16)
    mask_r = (x_col != W - 1).astype(jnp.bfloat16)
    for t, (dy, dx) in enumerate(TAPS):
        s = dy * W + dx
        slab = x_ref[0, :, MARGIN + s: MARGIN + s + HWP]
        if dx == -1:
            slab = slab * mask_l
        elif dx == 1:
            slab = slab * mask_r
        p_ref[t * CIN:(t + 1) * CIN, :] = slab
    # consume P cheaply so nothing is DCE'd (copies 1/4 of it once)
    y_ref[0] = p_ref[:COUT, :]


def _matmul_only_kernel(p_in_ref, w_ref, y_ref):
    """The [COUT,K]x[K,HWP] matmul alone, P pre-resident (pure MXU cost)."""
    y_ref[0] = jnp.dot(w_ref[:], p_in_ref[:],
                       preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)


@jax.jit
def ablate_slabs(x_cm, w_cm):
    return pl.pallas_call(
        _slab_only_kernel,
        out_shape=jax.ShapeDtypeStruct((BT, COUT, HWP), jnp.bfloat16),
        grid=(BT,),
        in_specs=[
            pl.BlockSpec((1, CIN, HWM), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((COUT, K), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, COUT, HWP), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K, HWP), jnp.bfloat16)],
    )(x_cm, w_cm)


@jax.jit
def ablate_matmul(p_const, w_cm):
    """p_const [K, HWP] stays VMEM-resident across all BT grid steps."""
    return pl.pallas_call(
        _matmul_only_kernel,
        out_shape=jax.ShapeDtypeStruct((BT, COUT, HWP), jnp.bfloat16),
        grid=(BT,),
        in_specs=[
            pl.BlockSpec((K, HWP), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((COUT, K), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, COUT, HWP), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )(p_const, w_cm)


# --------------------------------------------------------------------------
# v2: chunked grid — input row resident per image, output in lane chunks so
# Mosaic pipelines the (smaller) im2col + matmul across grid steps
# --------------------------------------------------------------------------

CHUNK = 640  # 5 lane tiles; HWP/CHUNK = 5 chunks


def _conv_kernel_chunked(x_ref, w_ref, y_ref, p_ref):
    """STATIC in-body chunk loop: per-chunk im2col into a small scratch,
    per-chunk matmul. All slice offsets are Python constants (Mosaic
    rejects dynamic unaligned lane offsets), and alternating small
    VPU-build / MXU-dot stages gives the scheduler room to interleave."""
    for ci in range(HWP // CHUNK):
        base = ci * CHUNK
        p = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1) + base
        x_col = p % W
        mask_l = (x_col != 0).astype(jnp.bfloat16)
        mask_r = (x_col != W - 1).astype(jnp.bfloat16)
        for t, (dy, dx) in enumerate(TAPS):
            s = dy * W + dx
            slab = x_ref[0, :, MARGIN + base + s: MARGIN + base + s + CHUNK]
            if dx == -1:
                slab = slab * mask_l
            elif dx == 1:
                slab = slab * mask_r
            p_ref[t * CIN:(t + 1) * CIN, :] = slab
        y_ref[0, :, base:base + CHUNK] = jnp.dot(
            w_ref[:], p_ref[:],
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)


@jax.jit
def packed_conv_chunked(x_cm, w_cm):
    return pl.pallas_call(
        _conv_kernel_chunked,
        out_shape=jax.ShapeDtypeStruct((BT, COUT, HWP), jnp.bfloat16),
        grid=(BT,),
        in_specs=[
            pl.BlockSpec((1, CIN, HWM), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((COUT, K), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, COUT, HWP), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K, CHUNK), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=2 * BT * HW * K * COUT,
            bytes_accessed=BT * (CIN * HWM + COUT * HWP) * 2,
            transcendentals=0,
        ),
    )(x_cm, w_cm)


def pack_x(x_ndhwc: np.ndarray) -> np.ndarray:
    """[B,T,H,W,C] -> channels-major [BT, C, HWM] bf16 with zero margins."""
    xt = x_ndhwc.reshape(BT, HW, CIN).transpose(0, 2, 1)
    out = np.zeros((BT, CIN, HWM), np.float32)
    out[:, :, MARGIN:MARGIN + HW] = xt
    return out


def pack_w(w_hwio: np.ndarray) -> np.ndarray:
    """[3,3,CIN,COUT] -> [COUT, K] with K ordered like TAPS x CIN."""
    rows = []
    for dy, dx in TAPS:
        rows.append(w_hwio[dy + 1, dx + 1])      # [CIN, COUT]
    return np.concatenate(rows, axis=0).T        # [COUT, K]


def xla_reference(x_ndhwc: jax.Array, w_hwio: jax.Array) -> jax.Array:
    """Same conv via XLA on the model's native NDHWC layout (the 94 TF/s
    path, measured standalone here for a like-for-like harness)."""
    return jax.lax.conv_general_dilated(
        x_ndhwc.reshape(BT, H, W, CIN), w_hwio,
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def measure(fn, *args, iters: int = 30) -> float:
    """Tunnel-safe seconds/iter: in-order device queue + final scalar fetch."""
    y = fn(*args)
    float(jnp.sum(y.astype(jnp.float32)))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    float(jnp.sum(y.astype(jnp.float32)))  # executions are in-order
    return (time.perf_counter() - t0) / iters


@jax.jit
def _device_rel_err(got_cm, want_nd):
    """max |got - want| / max|want| computed ON DEVICE (scalar fetch only —
    the full outputs are ~1.7 GB, ~40 s through the remote tunnel)."""
    got_nd = got_cm[:, :, :HW].astype(jnp.float32) \
        .transpose(0, 2, 1).reshape(BT, H, W, COUT)
    return (jnp.max(jnp.abs(got_nd - want_nd))
            / jnp.maximum(jnp.max(jnp.abs(want_nd)), 1e-6))


# --------------------------------------------------------------------------
# GEMM-ceiling probe: what does the BEST pure matmul at this op's shape run
# at, using XLA's own (maximally tuned) matmul machinery? The conv's
# implicit GEMM is [M=BT*HW, K=576] x [K, N=144]; if even a pure XLA GEMM
# at that (M, K, N) cannot beat the 94 TF/s in-graph conv, the "lane
# padding wall" is really a stationary-MXU-tile wall that no im2col layout
# can tunnel through, and the bar is unbeatable at COUT=144.
# --------------------------------------------------------------------------

def gemm_ceiling(iters: int = 30):
    rng = np.random.RandomState(1)
    M = 131072  # big enough to amortize; small enough to stay compute-led
    for (name, a_shape, b_shape, contract) in (
        ("positions-major [M,576]x[576,144]", (M, K), (K, COUT), "mk,kn->mn"),
        ("positions-major [M,576]x[576,128]", (M, K), (K, 128), "mk,kn->mn"),
        ("channels-major  [144,576]x[576,M]", (COUT, K), (K, M), "mk,kn->mn"),
    ):
        a = jnp.asarray(rng.randn(*a_shape), jnp.bfloat16)
        b = jnp.asarray(rng.randn(*b_shape), jnp.bfloat16)
        f = jax.jit(lambda a, b, e=contract: jnp.einsum(
            e, a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
        t = measure(f, a, b, iters=iters)
        fl = 2 * a_shape[0] * a_shape[1] * b_shape[1]
        print(f"gemm {name}: {t*1e3:.3f} ms  {fl/t/1e12:.1f} TF/s")


VARIANTS = {
    "v1": lambda x_cm, w_cm: packed_conv(x_cm, w_cm),
    "v2-chunked": packed_conv_chunked,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--run", default="check,xla,v1,v2-chunked,ablate,gemm",
                    help="comma list: check, xla, ablate, and/or variants "
                         f"({', '.join(VARIANTS)})")
    args = ap.parse_args()
    todo = args.run.split(",")

    rng = np.random.RandomState(0)
    x = rng.randn(B, T, H, W, CIN).astype(np.float32)
    w = (rng.randn(3, 3, CIN, COUT) / np.sqrt(K)).astype(np.float32)

    x_cm = jnp.asarray(pack_x(x), jnp.bfloat16)
    w_cm = jnp.asarray(pack_w(w), jnp.bfloat16)
    x_nd = jnp.asarray(x.reshape(BT, H, W, CIN), jnp.bfloat16)
    w_nd = jnp.asarray(w, jnp.bfloat16)
    flops = 2 * BT * HW * K * COUT

    if "check" in todo:
        want = jax.jit(xla_reference)(x_nd, w_nd)
        for name, fn in VARIANTS.items():
            err = float(_device_rel_err(fn(x_cm, w_cm).astype(jnp.float32),
                                        want))
            print(f"{name}: max rel err vs XLA conv {err:.2e}")
            assert err < 2e-2, f"{name} mismatch"

    rows = []
    if "xla" in todo:
        rows.append(("xla standalone (NDHWC)",
                     measure(jax.jit(xla_reference), x_nd, w_nd,
                             iters=args.iters)))
    for name, fn in VARIANTS.items():
        if name in todo:
            rows.append((f"pallas {name}",
                         measure(fn, x_cm, w_cm, iters=args.iters)))
    if "ablate" in todo:
        rows.append(("ablate: im2col slabs only (VPU)",
                     measure(ablate_slabs, x_cm, w_cm, iters=args.iters)))
        p_const = jnp.asarray(
            rng.randn(K, HWP).astype(np.float32), jnp.bfloat16)
        rows.append(("ablate: matmul only (MXU)",
                     measure(ablate_matmul, p_const, w_cm,
                             iters=args.iters)))
    if "gemm" in todo:
        gemm_ceiling(iters=args.iters)
    bar = 94.0
    for name, t in rows:
        print(f"{name}: {t*1e3:.3f} ms  {flops/t/1e12:.1f} TF/s"
              + ("  <-- BEATS the 94 TF/s bar" if "pallas" in name
                 and flops / t / 1e12 > bar else ""))


if __name__ == "__main__":
    main()
