"""CCC metric/loss vs closed-form hand cases and a numpy oracle (SURVEY §4 Unit)."""

import numpy as np
import jax.numpy as jnp
import pytest

from m3f.pytorch_tpu.ops.ccc import ccc, ccc_loss, masked_mean


def numpy_ccc(x, y, mask=None):
    """Independent population-moment oracle."""
    x = np.asarray(x, np.float64).ravel()
    y = np.asarray(y, np.float64).ravel()
    if mask is not None:
        m = np.asarray(mask).ravel().astype(bool)
        x, y = x[m], y[m]
    mx, my = x.mean(), y.mean()
    cov = ((x - mx) * (y - my)).mean()
    return 2 * cov / (x.var() + y.var() + (mx - my) ** 2)


def test_perfect_agreement():
    x = jnp.asarray(np.random.RandomState(0).randn(1000))
    assert ccc(x, x) == pytest.approx(1.0, abs=1e-5)


def test_anti_correlation():
    x = jnp.asarray(np.random.RandomState(0).randn(1000))
    # CCC(x, -x) = -var/(var + var + (2mx)^2); for zero-mean exactly -1
    xc = x - x.mean()
    assert ccc(xc, -xc) == pytest.approx(-1.0, abs=1e-5)


def test_constant_pair_no_nan():
    x = jnp.ones(64)
    v = ccc(x, x)
    assert np.isfinite(v)


def test_matches_numpy_oracle():
    rng = np.random.RandomState(42)
    x = rng.randn(512) * 0.3 + 0.1
    y = 0.7 * x + 0.2 * rng.randn(512)
    got = float(ccc(jnp.asarray(x), jnp.asarray(y)))
    assert got == pytest.approx(numpy_ccc(x, y), abs=1e-5)


def test_mask_excludes_invalid_frames():
    rng = np.random.RandomState(1)
    x = rng.randn(300)
    y = 0.9 * x + 0.1 * rng.randn(300)
    mask = rng.rand(300) > 0.3
    # corrupt the masked-out entries with the Aff-Wild2 invalid value
    y_bad = np.where(mask, y, -5.0)
    got = float(ccc(jnp.asarray(x), jnp.asarray(y_bad), mask=jnp.asarray(mask)))
    assert got == pytest.approx(numpy_ccc(x, y, mask), abs=1e-5)


def test_mask_broadcasts_over_outputs():
    rng = np.random.RandomState(2)
    pred = rng.randn(4, 50, 2).astype(np.float32)
    targ = pred + 0.1 * rng.randn(4, 50, 2).astype(np.float32)
    mask = rng.rand(4, 50) > 0.2
    per_out = ccc(jnp.asarray(pred), jnp.asarray(targ),
                  mask=jnp.asarray(mask)[..., None], axis=(0, 1))
    assert per_out.shape == (2,)
    for k in range(2):
        want = numpy_ccc(pred[..., k], targ[..., k], mask)
        assert float(per_out[k]) == pytest.approx(want, abs=1e-5)


def test_loss_range_and_gradient():
    import jax
    rng = np.random.RandomState(3)
    pred = jnp.asarray(rng.randn(8, 16, 2), jnp.float32)
    targ = jnp.asarray(rng.randn(8, 16, 2), jnp.float32)
    mask = jnp.asarray(rng.rand(8, 16) > 0.1)
    loss = ccc_loss(pred, targ, mask)
    assert 0.0 <= float(loss) <= 2.0
    g = jax.grad(lambda p: ccc_loss(p, targ, mask))(pred)
    assert np.isfinite(np.asarray(g)).all()
    # masked frames must receive zero gradient
    gm = np.asarray(g) * (1 - np.asarray(mask, np.float32))[..., None]
    assert np.abs(gm).max() == 0.0


def test_loss_zero_at_perfect_prediction():
    t = jnp.asarray(np.random.RandomState(4).randn(4, 32, 2), jnp.float32)
    assert float(ccc_loss(t, t)) == pytest.approx(0.0, abs=1e-5)


def test_masked_mean_counts():
    x = jnp.asarray([1.0, 2.0, 3.0, 100.0])
    m = jnp.asarray([True, True, True, False])
    assert float(masked_mean(x, m, axis=0)) == pytest.approx(2.0)


def test_bf16_inputs_accumulate_fp32():
    rng = np.random.RandomState(5)
    x = rng.randn(2048).astype(np.float32)
    y = (0.8 * x + 0.2 * rng.randn(2048)).astype(np.float32)
    v32 = float(ccc(jnp.asarray(x), jnp.asarray(y)))
    vbf = float(ccc(jnp.asarray(x, jnp.bfloat16), jnp.asarray(y, jnp.bfloat16)))
    assert vbf == pytest.approx(v32, abs=2e-2)  # bf16 quantization only, no blowup


def test_mse_loss_masked_numpy_oracle():
    from m3f.pytorch_tpu.ops.ccc import mse_loss

    rng = np.random.RandomState(11)
    pred = rng.randn(3, 5, 2).astype(np.float32)
    target = rng.randn(3, 5, 2).astype(np.float32)
    mask = rng.rand(3, 5) > 0.3
    want = np.mean(((pred - target) ** 2)[mask])
    got = float(mse_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # all-masked stays finite (zero by the masked_mean guard)
    z = float(mse_loss(jnp.asarray(pred), jnp.asarray(target),
                       jnp.zeros((3, 5), bool)))
    assert np.isfinite(z)


def test_make_loss_variants():
    from m3f.pytorch_tpu.ops.ccc import ccc_loss, make_loss, mse_loss

    rng = np.random.RandomState(12)
    pred = jnp.asarray(rng.randn(4, 6, 2).astype(np.float32))
    target = jnp.asarray(rng.randn(4, 6, 2).astype(np.float32))
    mask = jnp.asarray(rng.rand(4, 6) > 0.2)
    c = float(ccc_loss(pred, target, mask))
    m = float(mse_loss(pred, target, mask))
    assert np.isclose(float(make_loss("ccc")(pred, target, mask)), c)
    assert np.isclose(float(make_loss("mse")(pred, target, mask)), m)
    assert np.isclose(float(make_loss("ccc+mse", 0.5)(pred, target, mask)),
                      c + 0.5 * m)
    import pytest
    with pytest.raises(ValueError):
        make_loss("huber")


def test_ccc_one_pass_equals_two_pass():
    """one_pass sufficient-statistics CCC == the two-pass default (same math;
    exists as a TPU cold-program-load workaround, see ops/ccc.py)."""
    from m3f.pytorch_tpu.ops.ccc import ccc, ccc_loss, make_loss

    rng = np.random.RandomState(7)
    pred = jnp.asarray(rng.uniform(-1, 1, (4, 6, 2)).astype(np.float32))
    target = jnp.asarray(rng.uniform(-1, 1, (4, 6, 2)).astype(np.float32))
    mask = jnp.asarray(rng.rand(4, 6) > 0.3)

    for m in (None, mask[..., None]):
        for ax in (None, (0, 1)):
            a = np.asarray(ccc(pred, target, mask=m, axis=ax))
            b = np.asarray(ccc(pred, target, mask=m, axis=ax, one_pass=True))
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    a = float(ccc_loss(pred, target, mask))
    b = float(make_loss("ccc", ccc_stats="one_pass")(pred, target, mask))
    assert np.isclose(a, b, rtol=1e-5, atol=1e-6)
    # all-masked stays finite in one_pass too
    z = float(make_loss("ccc", ccc_stats="one_pass")(
        pred, target, jnp.zeros((4, 6), bool)))
    assert np.isfinite(z)
    import pytest
    with pytest.raises(ValueError):
        make_loss("ccc", ccc_stats="three_pass")


def test_ccc_stats_excluded_from_config_hash():
    from m3f.pytorch_tpu.config import ExperimentConfig, apply_overrides
    cfg = ExperimentConfig()
    one = apply_overrides(cfg, {"train.ccc_stats": "one_pass"})
    assert cfg.config_hash() == one.config_hash()   # identical-math knob


def test_ccc_one_pass_near_constant_stays_bounded():
    """fp32 cancellation in E[x²]−μ² can go slightly NEGATIVE for
    near-constant inputs; unclamped it pushed CCC far outside [-1, 1]."""
    rng = np.random.RandomState(0)
    for c in (0.33, -0.77, 0.1234567):
        pred = np.full((1000,), c, np.float32) \
            + rng.randn(1000).astype(np.float32) * 1e-6
        target = np.full((1000,), c, np.float32)
        v = float(ccc(jnp.asarray(pred), jnp.asarray(target), one_pass=True))
        assert -1.0 - 1e-5 <= v <= 1.0 + 1e-5, (c, v)
