"""Measure the train-loop stall of a periodic checkpoint save.

Motivation (SURVEY §5 "orbax-style async checkpoint"): ``Checkpointer.save``
blocks on the full device→host fetch + npz write. ``save_async`` snapshots
the state ON-DEVICE (HBM copy) and backgrounds the fetch+write, so the only
loop-blocking cost is enqueueing the copies. On a rig with a slow
device→host link (this one: ~35 MB/s axon tunnel) the difference is the
whole transfer time of a fusion-sized TrainState.

Prints: sync save stall, async save stall (return time), async drain time,
and verifies the async file is byte-identical to the sync one while a
DONATING train step runs concurrently with the background fetch.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from m3f.pytorch_tpu.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    from m3f.pytorch_tpu.config import fusion
    from m3f.pytorch_tpu.data.windowing import samples_per_window
    from m3f.pytorch_tpu.parallel.mesh import shard_batch
    from m3f.pytorch_tpu.train.checkpoint import Checkpointer
    from m3f.pytorch_tpu.train.loop import Trainer

    cfg = fusion()
    import dataclasses
    B = 8 if jax.devices()[0].platform == "tpu" else 2
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, batch_size=B))
    W, L, S = (cfg.window.windows_per_clip, cfg.window.window_frames,
               cfg.data.image_size)
    spw = samples_per_window(cfg.model.mel, cfg.model.audio.mel_frames_per_window)

    trainer = Trainer(cfg)
    state = trainer.init_state()
    step = trainer.make_train_step()
    rng = np.random.RandomState(0)
    batch = shard_batch(trainer.mesh, {
        "video": rng.randint(0, 256, (B, W, L, S, S, 3)).astype(np.uint8),
        "wav": rng.randn(B, W, spw).astype(np.float32),
        "labels": rng.uniform(-1, 1, (B, W, L, 2)).astype(np.float32),
        "mask": np.ones((B, W, L), dtype=bool),
    })
    state, m = step(state, batch)  # compile + warmup
    float(m["loss"])

    nbytes = sum(int(np.prod(x.shape)) * x.dtype.itemsize
                 for x in jax.tree_util.tree_leaves(state))
    import tempfile
    d = tempfile.mkdtemp(prefix="m3f_ckpt_bench_")
    ck_sync, ck_async = Checkpointer(d + "/sync"), Checkpointer(d + "/async")

    t0 = time.perf_counter()
    sync_path = ck_sync.save(state)
    t_sync = time.perf_counter() - t0

    # cold async save of the SAME state: pays the one-time snapshot-program
    # compile; its file must be byte-identical to the sync one
    t0 = time.perf_counter()
    async_path = ck_async.save_async(state)
    t_async_cold = time.perf_counter() - t0
    ck_async.wait()
    import hashlib
    h = lambda p: hashlib.sha256(open(p, "rb").read()).hexdigest()
    npz_equal = h(sync_path) == h(async_path)

    # steady-state async save (what every later periodic save costs), with
    # the train loop continuing immediately — and DONATING state's buffers:
    state, m = step(state, batch)
    float(m["loss"])
    t0 = time.perf_counter()
    ck_async.save_async(state)
    t_async_return = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, m = step(state, batch)  # donates the just-snapshotted state
    float(m["loss"])
    t_overlapped_step = time.perf_counter() - t0
    t0 = time.perf_counter()
    ck_async.wait()
    t_drain = time.perf_counter() - t0

    print(json.dumps({
        "state_mb": round(nbytes / 1e6, 1),
        "sync_save_stall_s": round(t_sync, 3),
        "async_save_stall_cold_s": round(t_async_cold, 3),
        "async_save_stall_s": round(t_async_return, 3),
        "overlapped_train_step_s": round(t_overlapped_step, 3),
        "async_drain_s": round(t_drain, 3),
        "async_equals_sync_npz": npz_equal,
    }))
    assert npz_equal, "async checkpoint diverged from sync save"


if __name__ == "__main__":
    main()
