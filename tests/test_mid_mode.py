"""Lane-rounded (2+1)D midplanes (`visual.mid_mode="lane"`).

The TPU-native capacity-similar variant rounds each block's factorization
width to a multiple of 128 so stage tensors fill whole lane tiles (measured
+35% train throughput on-chip, BASELINE.md). The default ("flops") stays the
torchvision FLOP-matched formula — torch-checkpoint-compatible — and is
golden-parity tested in test_model_parity.py.
"""

import jax
import numpy as np
import pytest

from m3f.pytorch_tpu.config import ExperimentConfig, apply_overrides
from m3f.pytorch_tpu.models.r2plus1d import BasicBlock, R2Plus1D, midplanes
from m3f.pytorch_tpu.config import VisualNetConfig


def test_midplanes_lane_rounding():
    # (in_c, out_c) -> (flops value, lane value)
    cases = {
        (64, 64): (144, 128),
        (64, 128): (230, 256),
        (128, 128): (288, 256),
        (128, 256): (460, 512),
        (256, 256): (576, 512),
        (256, 512): (921, 896),
        (512, 512): (1152, 1152),
    }
    for (i, o), (flops, lane) in cases.items():
        assert midplanes(i, o) == flops
        assert midplanes(i, o, mode="lane") == lane
        assert midplanes(i, o, mode="lane") % 128 == 0


def test_midplanes_unknown_mode_raises():
    with pytest.raises(ValueError):
        midplanes(64, 64, mode="mxu")


def test_lane_block_param_shapes():
    blk = BasicBlock(64, 64, mid_mode="lane")
    params, _ = blk.init(jax.random.PRNGKey(0))
    assert params["conv1"]["spatial"]["kernel"].shape == (1, 3, 3, 64, 128)
    assert params["conv1"]["temporal"]["kernel"].shape == (3, 1, 1, 128, 64)


def test_lane_backbone_initializes_and_mid_mode_changes_hash():
    cfg = ExperimentConfig()
    lane = apply_overrides(cfg, {"model.visual.mid_mode": "lane"})
    assert lane.model.visual.mid_mode == "lane"
    # parameter shapes differ -> resuming across the flip must abort
    assert cfg.config_hash() != lane.config_hash()
    params, _ = R2Plus1D(lane.model.visual).init(jax.random.PRNGKey(0))
    mids = [np.asarray(b["conv1"]["spatial"]["kernel"]).shape[-1]
            for b in params["blocks"]]
    assert all(m % 128 == 0 for m in mids)
