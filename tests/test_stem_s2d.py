"""Space-to-depth stem (`visual.stem_s2d=True`).

The stride-(1,2,2) 7x7 stem conv is re-expressed at trace time as a stride-1
4x4 conv over 2x2-packed input (the MLPerf-ResNet TPU input-conv rewrite) —
EXACT math on the canonical checkpoint-layout parameters, so it must match
the direct conv to float tolerance for every stem family, stay out of the
semantic config hash, and train (gradients flow through the kernel re-tile
back to the canonical parameters).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3f.pytorch_tpu.config import (ExperimentConfig, VisualNetConfig,
                                    apply_overrides)
from m3f.pytorch_tpu.models.r2plus1d import (R2Plus1D, s2d_stem_kernel,
                                             space_to_depth_hw)


def test_space_to_depth_packing_order():
    x = np.arange(2 * 1 * 4 * 4 * 3, dtype=np.float32).reshape(2, 1, 4, 4, 3)
    y = np.asarray(space_to_depth_hw(jnp.asarray(x)))
    assert y.shape == (2, 1, 2, 2, 12)
    # channel order is (py, px, c)
    for py in range(2):
        for px in range(2):
            for c in range(3):
                np.testing.assert_array_equal(
                    y[:, :, :, :, (py * 2 + px) * 3 + c],
                    x[:, :, py::2, px::2, c])


def test_s2d_kernel_shape():
    k = jnp.asarray(np.random.RandomState(0).randn(3, 7, 7, 3, 8),
                    jnp.float32)
    k2 = s2d_stem_kernel(k)
    assert k2.shape == (3, 4, 4, 12, 8)
    # the zero-padded taps: (ky=0, py=0) reads original row -1 == 0
    np.testing.assert_array_equal(np.asarray(k2[:, 0, :, 0:3, :]), 0.0)


# s2d is a DEFAULT-OFF exact-math stem rewrite: the default conv family
# stays lean; the 3d/mc3 interplay params (~3-4 s compiles each) are slow
# (suite budget, ROUND5)
@pytest.mark.parametrize("conv_mode", [
    "2plus1d",
    pytest.param("3d", marks=pytest.mark.slow),
    pytest.param("mc3", marks=pytest.mark.slow)])
def test_stem_s2d_matches_direct(conv_mode):
    vis = VisualNetConfig(block_channels=(8, 16), blocks_per_stage=(1, 1),
                          stem_channels=8, feature_dim=16,
                          conv_mode=conv_mode)
    direct = R2Plus1D(vis)
    s2d = R2Plus1D(VisualNetConfig(**{**vis.__dict__, "stem_s2d": True}))
    params, state = direct.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 32, 32, 3)
                    .astype(np.float32))
    want, _ = direct.apply(params, state, x, train=True)
    got, _ = s2d.apply(params, state, x, train=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # ~9 s (suite budget, ROUND5): gradient matrix of a
# DEFAULT-OFF exact-math rewrite; forward parity for all three conv modes
# stays lean above
def test_stem_s2d_gradients_match_direct():
    vis = VisualNetConfig(block_channels=(8,), blocks_per_stage=(1,),
                          stem_channels=8, feature_dim=8)
    direct = R2Plus1D(vis)
    s2d = R2Plus1D(VisualNetConfig(**{**vis.__dict__, "stem_s2d": True}))
    params, state = direct.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(2).randn(2, 8, 16, 16, 3)
                    .astype(np.float32))

    def loss(model, p):
        y, _ = model.apply(p, state, x, train=True)
        return jnp.sum(y ** 2)

    gw = jax.grad(lambda p: loss(direct, p))(params)
    gg = jax.grad(lambda p: loss(s2d, p))(params)
    # gradient trees share the canonical layout and must agree
    for a, b in zip(jax.tree.leaves(gw), jax.tree.leaves(gg)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_stem_s2d_excluded_from_semantic_hash():
    cfg = ExperimentConfig()
    flipped = apply_overrides(cfg, {"model.visual.stem_s2d": True})
    assert flipped.model.visual.stem_s2d is True
    # identical math, same parameters -> resuming across the flip is legal
    assert cfg.config_hash() == flipped.config_hash()
