"""Worker for test_dist_init.py::test_real_two_process_rendezvous — one rank
of a REAL ``jax.distributed`` job on the CPU backend (Gloo collectives).

Not a test file: launched as a subprocess, twice, by the test. Runs the
PRODUCT multi-host path end-to-end: ``maybe_initialize_distributed`` reads
``M3F_COORDINATOR`` (parallel/mesh.py), each rank feeds its disjoint
``process_sharded_stream`` shard, ``shard_batch`` assembles the global array
via ``make_array_from_process_local_data``, and the jitted train step's
GSPMD-inserted psum runs over the cross-process Gloo backend. Prints one
``RESULT process=i loss=...`` line the parent asserts on (replicated state
=> the loss must be IDENTICAL on every rank).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from m3f.pytorch_tpu.config import apply_overrides, audio_only
from m3f.pytorch_tpu.data.synthetic import SyntheticAVDataset
from m3f.pytorch_tpu.data.windowing import (WindowSequencer,
                                            process_sharded_stream)
from m3f.pytorch_tpu.parallel.mesh import (maybe_initialize_distributed,
                                           shard_batch)
from m3f.pytorch_tpu.train.loop import Trainer


def main() -> int:
    plan = maybe_initialize_distributed()
    assert plan.initialize, plan
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2 and len(jax.local_devices()) == 1

    cfg = apply_overrides(audio_only(), {
        "train.batch_size": 4, "train.num_steps": 2,
        "train.mesh.num_data": 2,
        "data.synthetic": True, "data.synthetic_num_videos": 4,
        "data.synthetic_video_frames": 64,
        "model.audio.channels": [4, 8], "model.audio.feature_dim": 8,
        "model.gru.hidden_size": 8})
    tr = Trainer(cfg)
    state = tr.init_state()
    step = tr.make_train_step()
    ds = SyntheticAVDataset(cfg.data, cfg.model.mel)
    seq = WindowSequencer(cfg.window, cfg.model.mel,
                          mel_frames=cfg.model.audio.mel_frames_per_window)
    pc, pi = jax.process_count(), jax.process_index()
    stream = process_sharded_stream(ds, seq, cfg.train.batch_size // pc,
                                    seed=0, process_index=pi,
                                    process_count=pc)
    for _ in range(2):
        local = next(stream)
        feed = {k: local[k] for k in ("wav", "labels", "mask")}
        state, m = step(state, shard_batch(tr.mesh, feed))
    loss = float(m["loss"])
    assert np.isfinite(loss)
    # repr(float) round-trips exactly: the parent compares ranks bitwise
    print(f"RESULT process={pi} loss={loss!r}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
