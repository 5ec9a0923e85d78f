"""Checkpoint atomicity, roundtrip, keep-K, corrupt-file recovery (SURVEY §5)."""

import numpy as np
import jax.numpy as jnp

from m3f.pytorch_tpu.train.checkpoint import (Checkpointer, load_meta,
                                              load_pytree, save_pytree)


def _tree():
    return {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
            "nested": {"b": jnp.ones(4, jnp.int32)},
            "list": [jnp.zeros(2), jnp.full((1,), 7.0)]}


def test_pytree_roundtrip(tmp_path):
    t = _tree()
    p = str(tmp_path / "x.npz")
    save_pytree(t, p, meta={"step": 3})
    loaded = load_pytree(t, p)
    np.testing.assert_array_equal(loaded["a"], t["a"])
    np.testing.assert_array_equal(loaded["nested"]["b"], t["nested"]["b"])
    np.testing.assert_array_equal(loaded["list"][1], t["list"][1])
    assert load_meta(p)["step"] == 3


def test_mismatch_rejected(tmp_path):
    t = _tree()
    p = str(tmp_path / "x.npz")
    save_pytree(t, p)
    bad = {"a": t["a"]}
    try:
        load_pytree(bad, p)
        assert False, "should have raised"
    except ValueError:
        pass


from typing import NamedTuple


class S(NamedTuple):
    step: np.ndarray
    w: np.ndarray


def test_checkpointer_keep_and_recover(tmp_path):
    ck = Checkpointer(str(tmp_path), keep=2)

    for i in (1, 2, 3):
        ck.save(S(step=np.int32(i), w=np.full(3, float(i))))
    assert ck.all_steps() == [2, 3]  # keep-last-2

    # corrupt the newest; restore should fall back to step 2
    newest = ck.latest_path()
    with open(newest, "wb") as f:
        f.write(b"garbage")
    restored = ck.maybe_restore(S(step=np.int32(0), w=np.zeros(3)))
    np.testing.assert_array_equal(restored.w, np.full(3, 2.0))


def test_async_save_roundtrip_and_prune(tmp_path):
    """save_async writes the same checkpoint as save, waits compose, and
    keep-K pruning still applies (SURVEY §5 async checkpointing)."""
    ck = Checkpointer(str(tmp_path), keep=2)
    for i in (1, 2, 3):
        ck.save_async(S(step=np.int32(i), w=np.full(3, float(i))))
    ck.wait()
    assert ck.all_steps() == [2, 3]
    restored = ck.maybe_restore(S(step=np.int32(0), w=np.zeros(3)))
    np.testing.assert_array_equal(restored.w, np.full(3, 3.0))
    # a sync save after async writes joins them first and stays consistent
    ck.save(S(step=np.int32(4), w=np.full(3, 4.0)))
    assert ck.all_steps() == [3, 4]


def test_config_hash_mismatch_aborts(tmp_path):
    """A config change must abort resume loudly, never silently fall back to
    an older checkpoint (VERDICT r1 weak #3)."""
    import pytest
    from m3f.pytorch_tpu.config import ExperimentConfig

    from m3f.pytorch_tpu.config import GRUConfig, ModelConfig

    cfg_a = ExperimentConfig(name="a")
    # hash is SEMANTIC: a model-arch change flips it (a bare rename wouldn't)
    cfg_b = ExperimentConfig(name="a", model=ModelConfig(
        gru=GRUConfig(hidden_size=128)))
    ck_a = Checkpointer(str(tmp_path), keep=2, cfg=cfg_a)
    ck_a.save(S(step=np.int32(1), w=np.ones(3)))

    ck_b = Checkpointer(str(tmp_path), keep=2, cfg=cfg_b)
    with pytest.raises(RuntimeError, match="different config"):
        ck_b.maybe_restore(S(step=np.int32(0), w=np.zeros(3)))
    # same config still restores fine
    restored = ck_a.maybe_restore(S(step=np.int32(0), w=np.zeros(3)))
    np.testing.assert_array_equal(restored.w, np.ones(3))
    # the usual real-world shape: the config change ALSO changed the pytree
    # layout — the hash abort must fire before the layout error is mistaken
    # for corruption (which silently falls back)
    with pytest.raises(RuntimeError, match="different config"):
        ck_b.maybe_restore(S(step=np.int32(0), w=np.zeros(5)))
