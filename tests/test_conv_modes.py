"""Backbone conv-family variants (`visual.conv_mode`): "3d" (r3d_18) and
"mc3" (mc3_18) alongside the default factorized "2plus1d" — SURVEY §2.1 C4
pins only "R(2+1)D/3D-ResNet-style", so all three torchvision video/resnet
families are supported. Golden torch parity for 3d/mc3 lives in
test_model_parity.py (slow); these are the fast structural checks."""

import dataclasses

import jax
import numpy as np
import pytest

from m3f.pytorch_tpu.config import ExperimentConfig, VisualNetConfig, apply_overrides
from m3f.pytorch_tpu.models.r2plus1d import R2Plus1D
from m3f.pytorch_tpu.train.convert import (convert_r2plus1d,
                                           detect_visual_mode,
                                           export_r2plus1d)


def _tiny(mode):
    return VisualNetConfig(block_channels=(4, 8), blocks_per_stage=(1, 1),
                           stem_channels=4, feature_dim=8, conv_mode=mode)


@pytest.mark.parametrize("mode,tprime", [("3d", 4), ("mc3", 8)])
def test_forward_shapes(mode, tprime):
    model = R2Plus1D(_tiny(mode))
    params, state = model.init(jax.random.PRNGKey(0))
    x = np.random.RandomState(0).randn(1, 8, 16, 16, 3).astype(np.float32)
    pooled, _ = model.apply(params, state, x, train=False)
    assert pooled.shape == (1, 8)
    # mc3 never strides time (spatial-only downsample), 3d halves it per stage
    pf, _ = model.apply(params, state, x, train=False, per_frame=True)
    assert pf.shape == (1, tprime, 8)


@pytest.mark.parametrize("mode", ["3d", "mc3"])
def test_torch_schema_roundtrip(mode):
    """export → detect → convert reproduces the exact pytree (no torch)."""
    model = R2Plus1D(_tiny(mode))
    params, state = model.init(jax.random.PRNGKey(1))
    sd = export_r2plus1d(params, state)
    assert detect_visual_mode(sd) == mode
    p2, s2 = convert_r2plus1d(sd)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # and the param TREE STRUCTURE matches, not just the leaves
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))


def test_conv_mode_changes_hash_and_trains_shapes():
    cfg = ExperimentConfig()
    r3d = apply_overrides(cfg, {"model.visual.conv_mode": "3d"})
    assert cfg.config_hash() != r3d.config_hash()
    with pytest.raises(ValueError):
        R2Plus1D(dataclasses.replace(_tiny("3d"), conv_mode="slowfast"))._blocks()


def test_lane_mid_mode_rejected_for_plain_conv_families():
    cfg = dataclasses.replace(_tiny("3d"), mid_mode="lane")
    with pytest.raises(ValueError, match="mid_mode"):
        R2Plus1D(cfg)._blocks()
