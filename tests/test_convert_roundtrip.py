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
