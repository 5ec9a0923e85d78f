"""Multi-host input partitioning (SURVEY §2.4; VERDICT r1 missing #4):
per-process streams must be DISJOINT and together COVER the dataset."""

import numpy as np
import pytest

from m3f.pytorch_tpu.config import DataConfig, MelConfig, WindowConfig
from m3f.pytorch_tpu.data.synthetic import SyntheticAVDataset
from m3f.pytorch_tpu.data.windowing import (WindowSequencer, example_stream,
                                            partition_video_ids,
                                            process_sharded_stream)

MEL = MelConfig()
WIN = WindowConfig(windows_per_clip=2)


@pytest.mark.parametrize("n_ids,pc", [(8, 2), (8, 3), (5, 4), (16, 8), (3, 3)])
def test_partition_disjoint_and_covering(n_ids, pc):
    ids = [f"v{i}" for i in range(n_ids)]
    parts = [partition_video_ids(ids, pi, pc) for pi in range(pc)]
    flat = [v for p in parts for v in p]
    assert sorted(flat) == sorted(ids)          # coverage, no duplicates
    assert len(set(flat)) == len(flat)          # disjoint


def _collect_examples(stream):
    """Split each batch back into single examples keyed by label bytes."""
    out = []
    for b in stream:
        for i in range(b["labels"].shape[0]):
            out.append(b["labels"][i].tobytes())
    return out


def _make(num_videos):
    data = DataConfig(synthetic_num_videos=num_videos,
                      synthetic_video_frames=96, image_size=16)
    ds = SyntheticAVDataset(data, MEL)
    seq = WindowSequencer(WIN, MEL)
    return ds, seq


def test_video_level_sharding_disjoint_and_covering():
    ds, seq = _make(4)
    per_proc = [
        _collect_examples(process_sharded_stream(
            ds, seq, 2, seed=0, loop=False, process_index=pi, process_count=2))
        for pi in range(2)
    ]
    assert per_proc[0] and per_proc[1]
    assert not set(per_proc[0]) & set(per_proc[1])       # disjoint
    full = _collect_examples(example_stream(ds, seq, 2, seed=0, loop=False))
    assert sorted(per_proc[0] + per_proc[1]) == sorted(full)  # coverage


def test_example_level_fallback_when_fewer_videos_than_processes():
    ds, seq = _make(1)
    per_proc = [
        _collect_examples(process_sharded_stream(
            ds, seq, 1, seed=0, loop=False, process_index=pi, process_count=2))
        for pi in range(2)
    ]
    union = per_proc[0] + per_proc[1]
    full = _collect_examples(example_stream(ds, seq, 1, seed=0, loop=False))
    # disjoint; covers all but at most (pc·local_batch - 1) tail examples
    assert not set(per_proc[0]) & set(per_proc[1])
    assert set(union) <= set(full)
    assert len(full) - len(union) < 2 * 1
    assert abs(len(per_proc[0]) - len(per_proc[1])) <= 1


def test_single_process_passthrough():
    ds, seq = _make(2)
    a = _collect_examples(process_sharded_stream(
        ds, seq, 2, seed=0, loop=False, process_index=0, process_count=1))
    b = _collect_examples(example_stream(ds, seq, 2, seed=0, loop=False))
    assert a == b
