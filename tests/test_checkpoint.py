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


def test_async_save_survives_donation_of_the_caller_buffers(tmp_path):
    """fit() donates the state into the NEXT train step right after
    save_async returns — the write must read a device-side SNAPSHOT, never
    the caller's buffers. Simulated here by jax.Array.delete() (the same
    buffer-invalidated state donation produces): if save_async held
    references to the originals, the background device_get would raise and
    the checkpoint would be missing/corrupt."""
    import jax

    ck = Checkpointer(str(tmp_path), keep=2)
    state = S(step=jnp.asarray(5, jnp.int32), w=jnp.full(3, 5.0))
    ck.save_async(state)
    for leaf in jax.tree_util.tree_leaves(state):
        leaf.delete()  # what donate_argnums=0 does to the caller's buffers
    ck.wait()
    assert ck.all_steps() == [5]
    restored = ck.maybe_restore(S(step=np.int32(0), w=np.zeros(3)))
    np.testing.assert_array_equal(np.asarray(restored.w), np.full(3, 5.0))
    assert int(restored.step) == 5


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


def test_load_model_checkpoint_ignores_optimizer_layout(tmp_path):
    """Eval/predict loading of a FULL TrainState checkpoint must not care
    about the optimizer tree: a checkpoint trained under schedule=cosine has
    an extra schedule-count leaf that a constant-schedule eval template lacks
    (found live: `m3f eval --checkpoint best.npz` after a cosine soak)."""
    from m3f.pytorch_tpu.config import ExperimentConfig, apply_overrides
    from m3f.pytorch_tpu.train.checkpoint import (load_model_checkpoint,
                                                  save_pytree)
    from m3f.pytorch_tpu.train.loop import Trainer
    import jax

    small = {"model.audio.channels": [4, 8], "model.audio.feature_dim": 8,
             "model.use_video": False, "model.gru.hidden_size": 8}
    cosine = apply_overrides(ExperimentConfig(), {
        **small, "train.optim.schedule": "cosine",
        "train.optim.warmup_steps": 5})
    const = apply_overrides(ExperimentConfig(), small)

    tr_a = Trainer(cosine)
    st_a = tr_a.init_state()
    path = str(tmp_path / "ckpt_00000003.npz")
    save_pytree(jax.device_get(st_a), path, {"step": 3})

    tr_b = Trainer(const)
    st_b = load_model_checkpoint(tr_b.init_state(), path)
    for a, b in zip(jax.tree.leaves(jax.device_get(st_a.params)),
                    jax.tree.leaves(jax.device_get(st_b.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a genuinely missing MODEL leaf still fails loudly
    import pytest
    bigger = apply_overrides(ExperimentConfig(), {
        **small, "model.gru.num_layers": 2})
    with pytest.raises(ValueError, match="missing model leaf"):
        load_model_checkpoint(Trainer(bigger).init_state(), path)


def test_load_model_checkpoint_rejects_extra_model_leaves(tmp_path):
    """An architecturally RICHER checkpoint (extra model leaves, e.g. SE
    branches) must not load silently into a smaller eval model."""
    from m3f.pytorch_tpu.config import ExperimentConfig, apply_overrides
    from m3f.pytorch_tpu.train.checkpoint import (load_model_checkpoint,
                                                  save_pytree)
    from m3f.pytorch_tpu.train.loop import Trainer
    import jax
    import pytest

    small = {"model.audio.channels": [4, 8], "model.audio.feature_dim": 8,
             "model.use_video": False, "model.gru.hidden_size": 8}
    rich = apply_overrides(ExperimentConfig(), {
        **small, "model.gru.num_layers": 2})
    plain = apply_overrides(ExperimentConfig(), small)
    st = Trainer(rich).init_state()
    path = str(tmp_path / "ckpt_00000001.npz")
    save_pytree(jax.device_get(st), path, {"step": 1})
    with pytest.raises(ValueError, match="leaves the eval model lacks"):
        load_model_checkpoint(Trainer(plain).init_state(), path)


def test_seed_from_explicit_checkpoint(tmp_path):
    """--resume-from semantics: seeds a FRESH dir (full safety logic via
    maybe_restore), never clobbers a dir that already has checkpoints,
    and rejects model-only layouts with a pointer at --init-from."""
    from m3f.pytorch_tpu.config import ExperimentConfig, apply_overrides
    from m3f.pytorch_tpu.train.checkpoint import Checkpointer, save_pytree
    from m3f.pytorch_tpu.train.loop import Trainer
    import jax
    import numpy as np
    import pytest

    small = {"model.audio.channels": [4, 8], "model.audio.feature_dim": 8,
             "model.use_video": False, "model.gru.hidden_size": 8}
    cfg = apply_overrides(ExperimentConfig(), small)
    tr = Trainer(cfg)
    state = tr.init_state()._replace(step=np.int32(7))
    src_dir = tmp_path / "src"
    ck_src = Checkpointer(str(src_dir), keep=2, cfg=cfg)
    src = ck_src.save(jax.device_get(state))

    run_dir = tmp_path / "run"
    ck = Checkpointer(str(run_dir), keep=2, cfg=cfg)
    ck.seed_from(src)
    restored = ck.maybe_restore(tr.init_state(), tr)
    assert int(restored.step) == 7

    # dir now has checkpoints: a second seed (restart loop) is a no-op
    newer = ck.save(jax.device_get(restored._replace(step=np.int32(9))))
    ck.seed_from(src)
    assert int(ck.maybe_restore(tr.init_state(), tr).step) == 9

    # model-only layout is rejected with direction to --init-from
    mo = str(tmp_path / "model_only.npz")
    save_pytree({"params": jax.device_get(state.params),
                 "state": jax.device_get(state.bn_state)}, mo)
    with pytest.raises(ValueError, match="init-from"):
        Checkpointer(str(tmp_path / "run2"), keep=2, cfg=cfg).seed_from(mo)


def test_seed_from_step_leaf_is_authoritative(tmp_path):
    """seed_from names its copy after the .step LEAF, not meta/filename
    heuristics (ADVICE r2: a stepless-meta, oddly-named source produced
    ckpt_00000000.npz whose name disagreed with the state inside,
    scrambling keep-K pruning order and the dir listing)."""
    import os
    from m3f.pytorch_tpu.config import ExperimentConfig, apply_overrides
    from m3f.pytorch_tpu.train.loop import Trainer
    import jax

    small = {"model.audio.channels": [4, 8], "model.audio.feature_dim": 8,
             "model.use_video": False, "model.gru.hidden_size": 8}
    cfg = apply_overrides(ExperimentConfig(), small)
    tr = Trainer(cfg)
    state = jax.device_get(tr.init_state()._replace(step=np.int32(42)))

    # adversarial source: no step in meta, filename carries a WRONG number
    src = str(tmp_path / "ckpt_00000003.renamed.npz")
    save_pytree(state, src, meta={})

    run = tmp_path / "run"
    ck = Checkpointer(str(run), keep=2, cfg=cfg)
    ck.seed_from(src)
    assert ck.all_steps() == [42]
    assert os.path.exists(run / "ckpt_00000042.npz")
    assert int(ck.maybe_restore(tr.init_state(), tr).step) == 42


def test_multihost_only_primary_writes(tmp_path, monkeypatch):
    """On a multi-host job only process 0 writes checkpoints/metrics (N
    replicated writers would race N identical copies into a shared dir and
    duplicate every metric row); every process still reads."""
    import os

    import jax
    from m3f.pytorch_tpu.config import ExperimentConfig, apply_overrides
    from m3f.pytorch_tpu.train.checkpoint import Checkpointer
    from m3f.pytorch_tpu.train.loop import Trainer
    from m3f.pytorch_tpu.utils.logging import MetricWriter

    small = {"model.audio.channels": [4, 8], "model.audio.feature_dim": 8,
             "model.use_video": False, "model.gru.hidden_size": 8}
    cfg = apply_overrides(ExperimentConfig(), small)
    tr = Trainer(cfg)
    state = jax.device_get(tr.init_state()._replace(step=np.int32(3)))

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    ck = Checkpointer(str(tmp_path / "a"), keep=2, cfg=cfg)
    assert ck.save(state).endswith("ckpt_00000003.npz")
    assert ck.save_async(state)
    ck.wait()
    ck.save_best(state, 0.5)
    assert not ck.all_steps() and not os.listdir(tmp_path / "a")
    w = MetricWriter(str(tmp_path / "a"))
    w.write(1, {"loss": 1.0})
    w.close()
    assert not os.listdir(tmp_path / "a")

    # process 0 writes; a process-1 Checkpointer still READS the shared dir
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    ck0 = Checkpointer(str(tmp_path / "a"), keep=2, cfg=cfg)
    ck0.save(state)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    restored = ck.maybe_restore(tr.init_state(), tr)
    assert int(restored.step) == 3


def test_console_log_gated_to_process_zero(monkeypatch, capsys):
    """VERDICT r3 weak #6: fit()'s console lines must print on process 0
    only (an 8-host run otherwise emits 8x interleaved step lines), with an
    explicit env opt-in for per-host debugging."""
    import jax
    from m3f.pytorch_tpu.utils.logging import console_log

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    console_log("hello-p0")
    monkeypatch.setattr(jax, "process_index", lambda: 3)
    console_log("hello-p3")
    out = capsys.readouterr().out
    assert "hello-p0" in out and "hello-p3" not in out

    monkeypatch.setenv("M3F_LOG_ALL_PROCESSES", "1")
    console_log("debug-p3")
    assert "[p3] debug-p3" in capsys.readouterr().out


def test_async_write_failure_raises_from_wait(tmp_path, monkeypatch):
    """A failed background write (full disk, dead tunnel) must surface from
    wait() — fit()'s end-of-loop join would otherwise return as if the last
    periodic/best checkpoint were durably on disk (ADVICE r4)."""
    import pytest
    import m3f.pytorch_tpu.train.checkpoint as C

    ck = Checkpointer(str(tmp_path))

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(C, "save_pytree", boom)
    ck.save_async(S(step=np.int32(1), w=np.ones(3)))
    with pytest.raises(RuntimeError, match="disk full"):
        ck.wait()
    # the failure is consumed by that raise; the checkpointer stays usable
    monkeypatch.undo()
    ck.save(S(step=np.int32(2), w=np.full(3, 2.0)))
    assert ck.all_steps() == [2]


def test_checkpointer_not_pinned_by_atexit(tmp_path):
    """The exit drain runs over a WeakSet — a per-instance
    atexit.register(self.wait) pinned every Checkpointer (plus its last
    writer closure) for the process lifetime (ADVICE r4)."""
    import gc
    import weakref
    import m3f.pytorch_tpu.train.checkpoint as C

    ck = Checkpointer(str(tmp_path))
    ck.save_async(S(step=np.int32(1), w=np.ones(3)))
    ck.wait()
    assert ck in C._LIVE_CHECKPOINTERS
    ref = weakref.ref(ck)
    del ck
    gc.collect()
    assert ref() is None, "Checkpointer leaked after deletion"
