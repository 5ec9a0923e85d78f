"""Probe: does int8 MXU compute beat bf16 on this chip for OUR shapes?

v5e peaks: ~197 TF/s bf16, ~394 TOP/s int8 — IF XLA lowers s8xs8->s32
conv/dot natively to the MXU. The round-3 packed-conv probe
(scripts/probe_packed_conv.py) established the bf16 ceiling mechanism
(128x128 stationary-tile padding at C<128); int8 is a different axis:
same tiles, half the bytes, double the nominal MACs.

Timing methodology (hard-won; see BASELINE.md round-1 sync caveat):
through the axon tunnel, neither block_until_ready NOR a scalar fetch of
a repeated identical call measures execution — three earlier versions of
this probe measured the ~30 ms round-trip for every shape (one even read
"831 TF/s", 4x above physical peak). The only reliable pattern is the one
bench.py uses: a DEPENDENT CHAIN — each op's output feeds the next op's
input (inside the jit via fori_loop AND across jit calls), dispatch all
iterations async, sync ONCE at the end with a scalar fetch. Nothing can
be cached or elided because no two ops ever see the same input, and the
final fetch forces the whole chain. A doubling self-check validates that
measured wall scales with op count.

Run: python scripts/probe_int8.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

INNER = 16   # chained ops per jit call
CALLS = 16   # chained jit calls per measurement (output feeds next input)


def _measure(make_fn, x0, k, inner=INNER, calls=CALLS):
    """Wall-seconds per op for a chained kernel. make_fn(inner) returns a
    jitted f(x, k) -> x' that applies the op `inner` times, each output fed
    back (reshaped/cast) as the next input."""
    f = make_fn(inner)
    x = f(x0, k)
    float(jnp.asarray(x).ravel()[0].astype(jnp.float32))  # compile+warm sync
    x = x0
    t0 = time.perf_counter()
    for _ in range(calls):
        x = f(x, k)
    float(jnp.asarray(x).ravel()[0].astype(jnp.float32))  # ONE sync
    return (time.perf_counter() - t0) / (inner * calls)


def _chain_dot(a8, b8, int8: bool):
    """Square GEMM chain: y = x @ B, renormalized back to input dtype."""
    if int8:
        def step(x, k):
            y = lax.dot_general(x, k, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            return lax.shift_right_arithmetic(y, jnp.int32(12)).astype(jnp.int8)
    else:
        def step(x, k):
            y = jnp.dot(x, k, preferred_element_type=jnp.float32)
            return (y * jnp.float32(2e-4)).astype(jnp.bfloat16)

    def make(inner):
        @jax.jit
        def f(x, k):
            return lax.fori_loop(0, inner, lambda i, xx: step(xx, k), x)
        return f
    return make


def _chain_conv(dn, cin, int8: bool):
    """Conv chain: output [..., cout] sliced/tiled back to [..., cin] and
    cast to the input dtype — cheap (input-sized memory traffic) next to
    the conv itself."""
    def to_in(y):
        # MUST consume every output channel: a pure y[..., :cin] lets XLA
        # rewrite slice(conv) into a conv over kernel[..., :cin] and the
        # measurement silently times a narrower conv (v5 of this probe
        # read 296 TF/s on a 288-channel conv — above physical peak —
        # because only 128 channels were ever computed). The all-channel
        # reduction makes every output lane live.
        full = jnp.sum(y, axis=-1, keepdims=True)
        cout = y.shape[-1]
        if cout < cin:
            reps = -(-cin // cout)
            y = jnp.concatenate([y] * reps, axis=-1)
        return y[..., :cin] + full

    if int8:
        def step(x, k):
            y = lax.conv_general_dilated(x, k, (1, 1, 1), "SAME",
                                         dimension_numbers=dn,
                                         preferred_element_type=jnp.int32)
            return lax.shift_right_arithmetic(to_in(y), jnp.int32(10)).astype(jnp.int8)
    else:
        def step(x, k):
            y = lax.conv_general_dilated(x, k, (1, 1, 1), "SAME",
                                         dimension_numbers=dn,
                                         preferred_element_type=jnp.float32)
            return (to_in(y) * jnp.float32(1e-3)).astype(jnp.bfloat16)

    def make(inner):
        @jax.jit
        def f(x, k):
            return lax.fori_loop(0, inner, lambda i, xx: step(xx, k), x)
        return f
    return make


def probe_dot(m, k_dim):
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (m, k_dim), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-127, 127, (k_dim, k_dim), dtype=np.int8))
    tb = _measure(_chain_dot(a8, b8, False), a8.astype(jnp.bfloat16),
                  b8.astype(jnp.bfloat16))
    ti = _measure(_chain_dot(a8, b8, True), a8, b8)
    flops = 2 * m * k_dim * k_dim
    print(f"dot [{m},{k_dim}]x[{k_dim},{k_dim}]: "
          f"bf16 {tb*1e3:6.2f} ms ({flops/tb/1e12:6.1f} TF/s)  "
          f"int8 {ti*1e3:6.2f} ms ({flops/ti/1e12:6.1f} TOP/s)  "
          f"speedup {tb/ti:4.2f}x")
    return tb


def probe_conv(b, d, h, w, cin, cout, kern, label):
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 127, (b, d, h, w, cin), dtype=np.int8))
    k8 = jnp.asarray(rng.integers(-3, 3, (*kern, cin, cout), dtype=np.int8))
    dn = lax.conv_dimension_numbers(x8.shape, k8.shape, ("NDHWC", "DHWIO", "NDHWC"))
    tb = _measure(_chain_conv(dn, cin, False), x8.astype(jnp.bfloat16),
                  k8.astype(jnp.bfloat16))
    ti = _measure(_chain_conv(dn, cin, True), x8, k8)
    flops = 2 * b * d * h * w * cout * int(np.prod(kern)) * cin
    print(f"conv {label}: bf16 {tb*1e3:6.2f} ms ({flops/tb/1e12:6.1f} TF/s)  "
          f"int8 {ti*1e3:6.2f} ms ({flops/ti/1e12:6.1f} TOP/s)  "
          f"speedup {tb/ti:4.2f}x")


def main():
    print(f"backend: {jax.devices()[0].platform} {jax.devices()[0].device_kind}",
          flush=True)

    # methodology self-check: doubling the chain must ~double the wall.
    # Shape must be big enough that total device time clears the ~30-60 ms
    # tunnel floor even at the short setting (4096 dot, 64 ops ≈ 45 ms).
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(-127, 127, (4096, 4096), dtype=np.int8))
    mk = _chain_dot(a, a, False)
    ab = a.astype(jnp.bfloat16)
    t1 = _measure(mk, ab, ab, inner=8, calls=8)
    t2 = _measure(mk, ab, ab, inner=8, calls=16)
    ratio = (t2 * 8 * 16) / (t1 * 8 * 8)
    print(f"self-check: 2x ops -> {ratio:.2f}x wall "
          f"({'OK' if 1.6 < ratio < 2.6 else 'BROKEN — numbers below are latency, not compute'})",
          flush=True)

    probe_dot(4096, 4096)
    probe_dot(8192, 2048)
    # backbone hot shapes (BASELINE.md): stage-1 spatial/temporal units.
    probe_conv(32, 16, 56, 56, 64, 144, (1, 3, 3), "s1-spatial [32,16,56,56,64]->144 (1,3,3)")
    probe_conv(32, 16, 56, 56, 144, 64, (3, 1, 1), "s1-temporal [32,16,56,56,144]->64 (3,1,1)")
    # lane-aligned control (the packed-conv probe's COUT=128 case).
    probe_conv(32, 8, 28, 28, 128, 288, (1, 3, 3), "s2-spatial [32,8,28,28,128]->288 (1,3,3)")
    probe_conv(32, 4, 14, 14, 256, 512, (1, 3, 3), "s3-spatial [32,4,14,14,256]->512 (1,3,3)")


if __name__ == "__main__":
    main()
