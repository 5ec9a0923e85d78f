"""Bidirectional checkpoint compatibility: export_m3f ∘ convert_m3f == id."""

import numpy as np
import jax

from m3f.pytorch_tpu.config import ModelConfig
from m3f.pytorch_tpu.models.m3f import M3F
from m3f.pytorch_tpu.train.convert import convert_m3f, export_m3f


def test_m3f_export_convert_roundtrip():
    cfg = ModelConfig()
    model = M3F(cfg)
    params, state = model.init(jax.random.PRNGKey(0))

    sd = export_m3f(params, state)
    # schema spot checks (torchvision / nn.GRU / nn.Linear key names)
    assert "visual.stem.0.weight" in sd
    assert "visual.layer2.0.downsample.0.weight" in sd
    assert "audio.convs.0.weight" in sd
    assert "gru.weight_ih_l0" in sd and "gru.weight_hh_l0_reverse" in sd
    assert "head.weight" in sd
    # torch layouts
    assert sd["visual.stem.0.weight"].ndim == 5
    assert sd["visual.stem.0.weight"].shape[0] == 45        # O first (OIDHW)
    assert sd["gru.weight_ih_l0"].shape[0] == 3 * cfg.gru.hidden_size

    params2, state2 = convert_m3f(sd)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_derives_stage_boundaries():
    """export_r2plus1d with blocks_per_stage=None must derive the stage
    layout from the params (projection-shortcut blocks start stages 2+) —
    the old hardcoded (2,2,2,2) silently scrambled deeper backbones."""
    import jax
    from m3f.pytorch_tpu.config import VisualNetConfig
    from m3f.pytorch_tpu.models.r2plus1d import R2Plus1D
    from m3f.pytorch_tpu.train.convert import (convert_r2plus1d,
                                               export_r2plus1d)

    cfg = VisualNetConfig(block_channels=(16, 32), blocks_per_stage=(1, 2),
                          stem_channels=16, feature_dim=32)
    params, state = R2Plus1D(cfg).init(jax.random.PRNGKey(0))
    out = export_r2plus1d(jax.device_get(params), jax.device_get(state))
    keys = set(out)
    assert "layer1.0.conv1.0.0.weight" in keys
    assert "layer2.0.conv1.0.0.weight" in keys
    assert "layer2.1.conv1.0.0.weight" in keys
    assert "layer1.1.conv1.0.0.weight" not in keys
    assert "layer2.0.downsample.0.weight" in keys
    # and the exported dict re-imports to the identical tree
    p2, s2 = convert_r2plus1d(out)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        import numpy as np
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
