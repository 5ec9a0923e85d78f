"""C-P2: sequence-parallel sliding-window evaluation.

Capability parity: the reference handles long videos with host-looped
chunked 16-frame sliding windows + overlap stitching — it has NO sequence
parallelism (SURVEY.md §2.3 "SP / CP", §3.3).  TPU-native upgrade, per
SURVEY §2.3 C-P2:

1. ``sharded_eval_forward`` — a whole video's window-sequence batch is
   sharded across the mesh's ``data`` axis, so the conv backbones (~90% of
   FLOPs, SURVEY §3.2) run embarrassingly parallel across chips; per-sequence
   GRU reset matches the reference's chunked semantics; predictions gather
   back replicated for on-device stitching.

2. ``gru_seq_parallel`` — the stretch variant: the RNN analog of context
   parallelism.  The time axis is sharded contiguously across devices
   (``shard_map``); the true hidden-state carry crosses chip boundaries via
   ``ppermute`` in a sequential wavefront.  After ``k`` rounds, device ``k``
   holds the exact carry, so the result is bitwise-equivalent (up to reduce
   order) to the unsharded scan — total sequential depth is unchanged (an
   RNN's recurrence cannot be shortened without changing semantics), but all
   per-step matmul/elementwise work and the entire non-recurrent input
   projection run sharded.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from m3f.pytorch_tpu.parallel.mesh import batch_sharding, replicated


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0) -> Tuple[np.ndarray, int]:
    """Pad axis 0 by repeating the last element so jit shapes stay static."""
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, 0
    last = np.take(x, [-1], axis=axis)
    reps = [1] * x.ndim
    reps[axis] = pad
    return np.concatenate([x, np.tile(last, reps)], axis=axis), pad


def make_sharded_eval_forward(mesh: Mesh, apply_fn: Callable) -> Callable:
    """Jitted eval forward with the window-sequence batch sharded on 'data'.

    ``apply_fn(params, bn_state, batch) -> preds``; returned callable has the
    same signature but annotates batch in-shardings so GSPMD splits the
    backbone work across devices and all-gathers only the tiny [B, W, 2]
    prediction tensor.
    """
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    @functools.partial(jax.jit,
                       in_shardings=(rep, rep, bsh),
                       out_shardings=rep)
    def fwd(params, bn_state, batch):
        return apply_fn(params, bn_state, batch)

    def run(params, bn_state, host_batch: dict) -> np.ndarray:
        d = mesh.shape["data"]
        lens = {k: len(np.asarray(v)) for k, v in host_batch.items()}
        if len(set(lens.values())) != 1:
            # n_pad below is shared — mismatched leading dims would silently
            # mis-trim the result depending on dict iteration order
            raise ValueError(f"batch entries disagree on leading dim: {lens}")
        padded = {}
        n_pad = 0
        for k, v in host_batch.items():
            padded[k], n_pad = pad_to_multiple(np.asarray(v), d)
        batch = {k: jax.device_put(v, bsh) for k, v in padded.items()}
        preds = np.asarray(fwd(params, bn_state, batch))
        return preds[: len(preds) - n_pad] if n_pad else preds

    return run


# ---------------------------------------------------------------------------
# Stretch: exact GRU over a device-sharded time axis (ppermute wavefront)
# ---------------------------------------------------------------------------

def _gru_cell(h, xp_t, w_hh, b_hh):
    """One torch-parity GRU step. h: [B,H] fp32, xp_t: [B,3H] (x@W_ih+b_ih)."""
    hdim = h.shape[-1]
    # round the fp32 carry to the weight/compute dtype for the recurrent
    # matmul — models/gru.py's scan does the same, and skipping the round
    # would compound a per-step divergence under bf16 compute
    hp = (h.astype(w_hh.dtype) @ w_hh).astype(jnp.float32) + b_hh
    xr, xz, xn = jnp.split(xp_t.astype(jnp.float32), 3, axis=-1)
    hr, hz, hn = hp[..., :hdim], hp[..., hdim:2 * hdim], hp[..., 2 * hdim:]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def gru_seq_parallel(params: dict, x: jnp.ndarray, mesh: Mesh,
                     axis: str = "data", reverse: bool = False) -> jnp.ndarray:
    """Single-direction GRU over a time-sharded sequence, exact semantics.

    x: [B, T, D] with T divisible by the axis size. Returns [B, T, H].

    Each device scans its contiguous T/d chunk; the carry crosses devices by
    ``ppermute`` in a wavefront: round r propagates the true carry into
    device r. Devices re-scan each round (SPMD — no per-device branching),
    so wall-clock matches the unsharded scan's sequential depth while the
    input projection and all per-step work stay sharded; the win is memory
    (activations sharded d-ways) and overlap with neighboring sharded ops.
    """
    d = mesh.shape[axis]
    w_ih, b_ih = params["w_ih"], params["b_ih"]
    w_hh, b_hh = params["w_hh"], params["b_hh"]
    hidden = w_hh.shape[0]
    b, t, _ = x.shape
    assert t % d == 0, f"T={t} must divide over '{axis}'={d}"

    def local(x_chunk):
        # x_chunk: [B, T/d, D] — this device's contiguous slice
        xp = x_chunk @ w_ih.astype(x_chunk.dtype) + b_ih.astype(x_chunk.dtype)
        xp = jnp.swapaxes(xp, 0, 1)                     # [Tl, B, 3H]
        if reverse:
            xp = xp[::-1]

        def scan_chunk(h0):
            def step(h, xp_t):
                h_new = _gru_cell(h, xp_t, w_hh.astype(xp.dtype), b_hh)
                return h_new, h_new
            # unroll=1: the wavefront already replicates the scan d times in
            # the HLO; unrolling would blow up compile time for ~no gain
            return jax.lax.scan(step, h0, xp)

        idx = jax.lax.axis_index(axis)
        shift = -1 if reverse else 1
        perm = [((i - shift) % d, i) for i in range(d)]
        # the sequence-edge device (0 forward, d-1 backward) always starts
        # from a zero carry — mask the ppermute wraparound
        is_edge = idx == (d - 1 if reverse else 0)

        h_in = jnp.zeros((b, hidden), jnp.float32)
        # mark the carry as device-varying up front (shard_map VMA typing:
        # the scan output is varying over 'data', so the input must be too)
        h_in = jax.lax.pcast(h_in, (axis,), to="varying")
        ys = None
        for r in range(d):
            _carry, ys = scan_chunk(h_in)
            if r + 1 < d:
                h_in = jax.lax.ppermute(_carry, axis, perm)
                h_in = jnp.where(is_edge, 0.0, h_in)
            # after round r, devices 0..r (in scan order) hold exact results;
            # re-scanning with the now-exact carry is idempotent for them
        ys = jnp.swapaxes(ys, 0, 1)                     # [B, Tl, H]
        if reverse:
            ys = ys[:, ::-1]
        return ys.astype(x_chunk.dtype)

    fn = shard_map(local, mesh=mesh,
                   in_specs=P(None, axis, None),
                   out_specs=P(None, axis, None))
    return fn(x)


def bigru_seq_parallel(params: dict, x: jnp.ndarray, mesh: Mesh,
                       axis: str = "data") -> jnp.ndarray:
    """Bidirectional wrapper over ``gru_seq_parallel`` (layer 0 weights).

    params: BiGRU params ({"layers": [{"fwd": ..., "bwd": ...}, ...]}).
    Multi-layer stacks simply chain; output [B, T, 2H] matches
    ``models.gru.BiGRU.apply`` on the gathered sequence.
    """
    h = x
    for layer in params["layers"]:
        yf = gru_seq_parallel(layer["fwd"], h, mesh, axis, reverse=False)
        yb = gru_seq_parallel(layer["bwd"], h, mesh, axis, reverse=True)
        h = jnp.concatenate([yf, yb], axis=-1)
    return h
