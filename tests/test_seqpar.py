"""C-P2 sequence-parallel eval: sharded forward equality + GRU wavefront
exactness vs the unsharded scan (SURVEY §2.3 C-P2, §4 distributed tests)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from m3f.pytorch_tpu.models.gru import GRU, BiGRU
from m3f.pytorch_tpu.parallel.mesh import create_mesh
from m3f.pytorch_tpu.parallel.seqpar import (bigru_seq_parallel,
                                             gru_seq_parallel,
                                             make_sharded_eval_forward,
                                             pad_to_multiple)


def test_pad_to_multiple():
    x = np.arange(10).reshape(5, 2)
    p, n = pad_to_multiple(x, 4)
    assert p.shape == (8, 2) and n == 3
    np.testing.assert_array_equal(p[5:], np.tile(x[-1:], (3, 1)))
    p2, n2 = pad_to_multiple(x, 5)
    assert n2 == 0 and p2 is x


@pytest.mark.parametrize("reverse", [False, True])
def test_gru_seq_parallel_exact(reverse):
    # 4-way mesh: the wavefront logic is device-count-generic and compile
    # time on this 1-core VM scales with partitions (8-way costs 2x; the
    # 8-way path stays covered by dryrun_multichip and test_parallel)
    mesh = create_mesh(4, 1)
    B, T, D, H = 2, 24, 6, 5
    rng = np.random.RandomState(0)
    gru = GRU(D, H)
    params = gru.init(jax.random.PRNGKey(1))
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))

    want = gru.apply(params, x, reverse=reverse)
    got = gru_seq_parallel(params, x, mesh, reverse=reverse)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_bigru_seq_parallel_matches_bigru():
    mesh = create_mesh(4, 1)  # see test_gru_seq_parallel_exact
    B, T, D, H = 2, 16, 6, 4
    rng = np.random.RandomState(0)
    bigru = BiGRU(D, H)
    params = bigru.init(jax.random.PRNGKey(2))
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        want = bigru.apply(params, x)
        got = bigru_seq_parallel(params, x, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_sharded_eval_forward_pads_and_matches():
    mesh = create_mesh(8, 1)

    def apply_fn(params, bn_state, batch):
        return batch["x"] * params["scale"]

    run = make_sharded_eval_forward(mesh, apply_fn)
    x = np.random.RandomState(0).randn(5, 3).astype(np.float32)  # 5 % 8 != 0
    out = run({"scale": jnp.asarray(2.0)}, {}, {"x": x})
    assert out.shape == (5, 3)
    np.testing.assert_allclose(out, 2 * x, rtol=1e-6)


@pytest.mark.slow  # ~10 s (suite budget, ROUND5): the bf16 dtype variant
# of the wavefront; the fp32 exactness contract stays lean above
def test_bigru_seq_parallel_bf16_matches_unsharded():
    """The ppermute wavefront must round its carry to the compute dtype
    exactly like models/gru.py's scan — under bf16 an unrounded fp32 carry
    compounds a per-step divergence through the recurrence."""
    import jax.numpy as jnp
    from m3f.pytorch_tpu.models.gru import BiGRU

    D, H, B, T = 12, 8, 2, 32
    mesh = create_mesh(num_data=4, num_model=1)
    rng = np.random.RandomState(3)
    bigru = BiGRU(D, H)
    params = bigru.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.bfloat16), params)
    x = jnp.asarray(rng.randn(B, T, D), jnp.bfloat16)
    want = np.asarray(bigru.apply(params, x), np.float32)
    got = np.asarray(bigru_seq_parallel(params, x, mesh, axis="data"),
                     np.float32)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
