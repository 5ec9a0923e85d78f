"""Multi-slice (DCN) mesh layout (SURVEY §2.4/§5 "DCN only if multi-slice").

`order_devices_for_mesh` arranges a multi-slice device set so every
tensor-parallel row is intra-slice (TP collectives ride ICI) and the data
axis is slice-major (the once-per-step gradient psum decomposes into an
ICI reduce + one DCN exchange). The fake-CPU backend has no slices, so the
pure layout function is tested on mock devices and the end-to-end contract
on the 8-device backend with explicit ``slice_ids``.
"""

from types import SimpleNamespace

import numpy as np
import jax
import pytest

from m3f.pytorch_tpu.parallel.mesh import (create_mesh,
                                           order_devices_for_mesh,
                                           shard_batch)
from m3f.pytorch_tpu.train.loop import Trainer
from tests.test_tensor_parallel import make_batch, tiny_cfg


def mock_devices(slice_ids):
    return [SimpleNamespace(slice_index=s, id=i)
            for i, s in enumerate(slice_ids)]


def test_single_slice_layout_unchanged():
    """No slice info (CPU devices / slice_index None) == historical reshape."""
    devs = [SimpleNamespace(slice_index=None, id=i) for i in range(8)]
    arr = order_devices_for_mesh(devs, 4, 2)
    assert [[d.id for d in row] for row in arr] == \
        [[0, 1], [2, 3], [4, 5], [6, 7]]


def test_interleaved_slices_regrouped():
    """Devices reported interleaved across 2 slices: TP rows stay
    intra-slice and the data axis comes out slice-major."""
    arr = order_devices_for_mesh(mock_devices([0, 1] * 4), 4, 2)
    slices = [[d.slice_index for d in row] for row in arr]
    assert slices == [[0, 0], [0, 0], [1, 1], [1, 1]]
    ids = [[d.id for d in row] for row in arr]
    assert ids == [[0, 2], [4, 6], [1, 3], [5, 7]]  # ICI order kept in-slice


def test_tp_group_across_dcn_rejected():
    """A slice contributing a non-multiple of num_model must fail loudly."""
    with pytest.raises(ValueError, match="cross DCN"):
        order_devices_for_mesh(mock_devices([0] * 3 + [1] * 5), 4, 2)


def test_too_few_rows_rejected():
    with pytest.raises(ValueError, match="rows"):
        order_devices_for_mesh(mock_devices([0] * 2 + [1] * 2), 4, 2)
    with pytest.raises(ValueError, match="needs"):
        order_devices_for_mesh(mock_devices([0] * 4), 4, 2)


@pytest.mark.slow  # ~6 s (suite budget): re-runs test_tensor_parallel's
# dp4×tp2-vs-single numerics under the reordered device assignment; the
# lean layout tests above pin the ordering logic itself
def test_create_mesh_synthetic_slices_matches_single_device():
    """dp=4 x tp=2 over a synthetic 2-slice interleaved device order trains
    identically to one device — the re-ordered mesh changes WHERE collectives
    run, never what they compute."""
    cfg = tiny_cfg(4, 2)
    tr1 = Trainer(tiny_cfg(1, 1))
    tr1.mesh = create_mesh(1, 1, devices=jax.devices()[:1])
    trm = Trainer(cfg)
    trm.mesh = create_mesh(4, 2, slice_ids=[0, 1] * 4)
    # the mesh really is re-ordered (not the identity layout)
    ids = [d.id for d in trm.mesh.devices.ravel()]
    assert ids == [0, 2, 4, 6, 1, 3, 5, 7]

    s1, sm = tr1.init_state(), trm.init_state()
    step1, stepm = tr1.make_train_step(), trm.make_train_step()
    for i in range(2):
        batch = make_batch(cfg, seed=i)
        s1, m1 = step1(s1, shard_batch(tr1.mesh, batch))
        sm, mm = stepm(sm, shard_batch(trm.mesh, batch))
        np.testing.assert_allclose(float(m1["loss"]), float(mm["loss"]),
                                   rtol=2e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(sm.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)
