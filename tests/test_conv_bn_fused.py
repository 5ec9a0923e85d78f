"""Fused conv+BN Pallas units (ops/pallas/conv_bn.py) vs the plain XLA
composition — forward, VJP, and whole-backbone equivalence (VERDICT r1
weak #1 workstream). Runs in Pallas interpret mode on the CPU test backend;
the TPU compile/perf gate is scripts/tpu_smoke.py + bench.py."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

import m3f.pytorch_tpu.ops.pallas.conv_bn as cb
from m3f.pytorch_tpu.config import VisualNetConfig
from m3f.pytorch_tpu.models.r2plus1d import R2Plus1D

CASES = [
    ("spatial", (2, 3, 8, 8, 16), (3, 3, 16, 24)),
    ("temporal", (2, 6, 8, 8, 24), (3, 24, 16)),
]


def _data(xshape, wshape, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(*xshape).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(*wshape).astype(np.float32))
    inv = jnp.asarray(rng.rand(xshape[-1]).astype(np.float32) + 0.5)
    shift = jnp.asarray(0.1 * rng.randn(xshape[-1]).astype(np.float32))
    return x, w, inv, shift


@pytest.mark.parametrize("kind,xshape,wshape", CASES)
@pytest.mark.parametrize("affine", [False, True])
def test_conv_unit_forward_parity(kind, xshape, wshape, affine):
    x, w, inv, shift = _data(xshape, wshape)
    a = (inv, shift) if affine else (None, None)
    y1, s11, s21 = cb.conv_unit_reference(x, w, a[0], a[1], kind=kind)
    with pltpu.force_tpu_interpret_mode():
        y2, s12, s22 = cb.conv_unit(x, w, a[0], a[1], kind=kind)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s12), np.asarray(s11),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(s22), np.asarray(s21),
                               rtol=1e-4, atol=1e-2)


# The fused unit is DEFAULT-OFF (conv_backend="xla"; kept as measured
# evidence, BASELINE.md) and each grad-parity cell costs ~4-5 s of custom-VJP
# compile on this 1-core VM. The lean suite keeps one affine cell per
# backward impl; the full 8-cell matrix stays in the slow suite (-m '').
GRAD_CASES = [
    pytest.param(kind, xshape, wshape, affine, impl,
                 id=f"{impl}-{affine}-{kind}",
                 marks=() if (affine and kind == "spatial")
                 else (pytest.mark.slow,))
    for impl in ("xla", "pallas")
    for affine in (False, True)
    for kind, xshape, wshape in CASES
]


@pytest.mark.parametrize("kind,xshape,wshape,affine,impl", GRAD_CASES)
def test_conv_unit_grad_parity(kind, xshape, wshape, affine, impl,
                               monkeypatch):
    monkeypatch.setattr(cb, "backward_impl", impl)
    x, w, inv, shift = _data(xshape, wshape, seed=1)
    co = wshape[-1]
    rng = np.random.RandomState(2)
    ky = jnp.asarray(rng.randn(*xshape[:-1], co).astype(np.float32))
    k1 = jnp.asarray(rng.randn(co).astype(np.float32))
    k2 = jnp.asarray(0.01 * rng.randn(co).astype(np.float32))

    def loss(fn, *a):
        y, s1, s2 = fn(*a, kind=kind)
        return jnp.sum(y * ky) + jnp.sum(s1 * k1) + jnp.sum(s2 * k2)

    if affine:
        args, argnums = (x, w, inv, shift), (0, 1, 2, 3)
    else:
        args, argnums = (x, w), (0, 1)
    gr = jax.grad(functools.partial(loss, cb.conv_unit_reference),
                  argnums=argnums)(*args)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(functools.partial(loss, cb.conv_unit),
                      argnums=argnums)(*args)
    names = ("dx", "dw", "dinv", "dshift")
    for name, a, b in zip(names, gr, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"{kind}:{name}")


def _tiny_backbone(backend):
    return R2Plus1D(VisualNetConfig(block_channels=(8, 16),
                                    blocks_per_stage=(1, 1), stem_channels=8,
                                    feature_dim=16, conv_backend=backend))


@pytest.mark.slow  # 45 s: whole-backbone fwd+bwd of a DEFAULT-OFF backend
def test_backbone_fused_matches_xla_train_and_grads():
    """Whole tiny backbone (1 fused stride-1 block + 1 XLA strided block):
    forward, BN running stats, and parameter gradients agree."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 16, 16, 3).astype(np.float32))
    mx = _tiny_backbone("xla")
    mf = _tiny_backbone("pallas_fused")
    params, state = mx.init(jax.random.PRNGKey(0))

    f1, ns1 = mx.apply(params, state, x, train=True)
    with pltpu.force_tpu_interpret_mode():
        f2, ns2 = mf.apply(params, state, x, train=True)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(ns1), jax.tree.leaves(ns2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)

    def loss(model, p):
        f, _ = model.apply(p, state, x, train=True)
        return jnp.mean(f * f)

    g1 = jax.grad(lambda p: loss(mx, p))(params)
    with pltpu.force_tpu_interpret_mode():
        g2 = jax.grad(lambda p: loss(mf, p))(params)
    paths1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    paths2 = jax.tree_util.tree_flatten_with_path(g2)[0]
    for (pa, a), (_, b) in zip(paths1, paths2):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(pa))


@pytest.mark.slow  # ~9 s (suite budget, ROUND5): whole-backbone eval of
# the DEFAULT-OFF pallas_fused backend; the lean unit cells above keep the
# kernel itself covered
def test_backbone_fused_eval_matches_xla():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 8, 16, 16, 3).astype(np.float32))
    mx = _tiny_backbone("xla")
    mf = _tiny_backbone("pallas_fused")
    params, state = mx.init(jax.random.PRNGKey(1))
    f1, _ = mx.apply(params, state, x, train=False)
    with pltpu.force_tpu_interpret_mode():
        f2, _ = mf.apply(params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=1e-4, atol=1e-4)
