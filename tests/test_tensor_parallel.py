"""Tensor parallelism over the 'model' mesh axis (SURVEY §2.3 TP).

The BiGRU gate matmuls run column-parallel and the FC head row-parallel
(parallel/mesh.py:state_shardings); GSPMD inserts the collectives.  These
tests run on the 8-fake-CPU-device backend (conftest.py) and assert:

1. the sharding rules land on the right leaves (and only those),
2. a dp=4 × tp=2 train run matches the single-device run,
3. eval forward under TP matches single-device exactly (no BN updates).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from m3f.pytorch_tpu.config import (AudioNetConfig, ExperimentConfig,
                                    GRUConfig, MeshConfig, ModelConfig,
                                    TrainConfig, WindowConfig)
from m3f.pytorch_tpu.data.windowing import samples_per_window
from m3f.pytorch_tpu.parallel.mesh import create_mesh, shard_batch, state_shardings
from m3f.pytorch_tpu.train.loop import Trainer


def tiny_cfg(n_data: int, n_model: int) -> ExperimentConfig:
    return ExperimentConfig(
        name="tiny_tp",
        model=ModelConfig(
            use_audio=True, use_video=False,
            audio=AudioNetConfig(channels=(4, 8), feature_dim=8),
            gru=GRUConfig(hidden_size=8),   # 3H=24, head_in=16: divisible by 2
            compute_dtype="float32",
        ),
        window=WindowConfig(windows_per_clip=2),
        train=TrainConfig(batch_size=8,
                          mesh=MeshConfig(num_data=n_data, num_model=n_model)),
    )


def make_batch(cfg, B=8, seed=0):
    rng = np.random.RandomState(seed)
    W = cfg.window.windows_per_clip
    L = cfg.model.frames_per_window
    spw = samples_per_window(cfg.model.mel, cfg.model.audio.mel_frames_per_window)
    return {
        "wav": rng.randn(B, W, spw).astype(np.float32),
        "labels": rng.uniform(-1, 1, (B, W, L, 2)).astype(np.float32),
        "mask": np.ones((B, W, L), dtype=bool),
    }


def test_tp_sharding_rules():
    cfg = tiny_cfg(4, 2)
    trainer = Trainer(cfg)
    state = trainer.init_state()
    sh = jax.tree.map(lambda x: x.sharding.spec, state)
    g0 = sh.params["gru"]["layers"][0]
    for d in ("fwd", "bwd"):
        assert g0[d]["w_ih"] == P(None, "model")
        assert g0[d]["w_hh"] == P(None, "model")
        assert g0[d]["b_ih"] == P("model")
        assert g0[d]["b_hh"] == P("model")
    assert sh.params["head"]["kernel"] == P("model", None)
    assert sh.params["head"]["bias"] == P()
    # conv branch and BN state stay replicated
    flat_audio = jax.tree.leaves(sh.params["audio"])
    assert all(s == P() for s in flat_audio)
    assert all(s == P() for s in jax.tree.leaves(sh.bn_state))
    # adam moments mirror the params' TP layout (rules match path tails)
    opt_specs = jax.tree.leaves(
        jax.tree.map(lambda x: x.sharding.spec, state.opt_state),
        is_leaf=lambda x: isinstance(x, P))
    assert any(s == P(None, "model") for s in opt_specs)


def test_tp_train_matches_single_device():
    cfg_tp = tiny_cfg(4, 2)
    cfg_1 = tiny_cfg(1, 1)
    # single device mesh: restrict to one CPU device
    tr1 = Trainer(cfg_1)
    tr1.mesh = create_mesh(1, 1, devices=jax.devices()[:1])
    trp = Trainer(cfg_tp)

    s1 = tr1.init_state()
    sp = trp.init_state()
    # identical init (same seed) — compare to be sure
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(sp.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    step1 = tr1.make_train_step()
    stepp = trp.make_train_step()
    for i in range(3):
        batch = make_batch(cfg_1, seed=i)
        s1, m1 = step1(s1, shard_batch(tr1.mesh, batch))
        sp, mp = stepp(sp, shard_batch(trp.mesh, batch))
        np.testing.assert_allclose(float(m1["loss"]), float(mp["loss"]),
                                   rtol=2e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(sp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_tp_eval_forward_matches_single_device():
    cfg_tp = tiny_cfg(2, 4)   # widest TP the fake backend allows
    cfg_1 = tiny_cfg(1, 1)
    tr1 = Trainer(cfg_1)
    tr1.mesh = create_mesh(1, 1, devices=jax.devices()[:1])
    trp = Trainer(cfg_tp)
    s1, sp = tr1.init_state(), trp.init_state()
    batch = make_batch(cfg_1, seed=7)
    f1, fp = tr1.make_eval_forward(), trp.make_eval_forward()
    p1 = f1(s1.params, s1.bn_state, shard_batch(tr1.mesh, batch))
    pp = fp(sp.params, sp.bn_state, shard_batch(trp.mesh, batch))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(pp),
                               rtol=1e-5, atol=1e-6)


def test_tp_checkpoint_roundtrip(tmp_path):
    """Save under TP, restore under TP: shardings reapplied by maybe_restore.

    Uses save_async on the LIVE dp×tp-sharded device state (the fit() path)
    and then invalidates the caller's buffers the way donation does — the
    on-device snapshot must preserve sharded values across the gather."""
    from m3f.pytorch_tpu.train.checkpoint import Checkpointer

    cfg = tiny_cfg(4, 2)
    trainer = Trainer(cfg)
    state = trainer.init_state()
    step = trainer.make_train_step()
    state, _ = step(state, shard_batch(trainer.mesh, make_batch(cfg)))
    host_params = jax.device_get(state.params)
    ck = Checkpointer(str(tmp_path), keep=2, cfg=cfg)
    ck.save_async(state)
    for leaf in jax.tree.leaves(state):
        leaf.delete()  # what donate_argnums=0 does to the caller's buffers
    ck.wait()

    state2 = trainer.init_state()
    restored = ck.maybe_restore(state2, trainer)
    assert int(restored.step) == 1
    g = restored.params["gru"]["layers"][0]["fwd"]["w_ih"]
    assert g.sharding.spec == P(None, "model")
    for a, b in zip(jax.tree.leaves(host_params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tp_ema_shadow_sharded_and_matches_single_device():
    """EMA shadow under dp×tp: sharded like the params (path-tail rules)
    and numerically equal to the single-device shadow."""
    import dataclasses

    def with_ema(cfg):
        return cfg.replace(train=dataclasses.replace(cfg.train,
                                                     ema_decay=0.5))

    cfg_tp, cfg_1 = with_ema(tiny_cfg(4, 2)), with_ema(tiny_cfg(1, 1))
    tr1 = Trainer(cfg_1)
    tr1.mesh = create_mesh(1, 1, devices=jax.devices()[:1])
    trp = Trainer(cfg_tp)
    s1, sp = tr1.init_state(), trp.init_state()
    assert sp.ema["gru"]["layers"][0]["fwd"]["w_ih"].sharding.spec \
        == P(None, "model")
    assert sp.ema["head"]["kernel"].sharding.spec == P("model", None)

    step1, stepp = tr1.make_train_step(), trp.make_train_step()
    for i in range(2):
        batch = make_batch(cfg_1, seed=i)
        s1, _ = step1(s1, shard_batch(tr1.mesh, batch))
        sp, _ = stepp(sp, shard_batch(trp.mesh, batch))
    for a, b in zip(jax.tree.leaves(s1.ema), jax.tree.leaves(sp.ema)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_tp_save_best_jitted_snapshot_survives_donation(tmp_path):
    """save_best under dp×tp, with the caller's buffers invalidated the way
    donation does right after it returns. Both save entry points now share
    the jitted ``_device_snapshot`` (VERDICT r4 weak #1/#5); this pins the
    best-checkpoint path the way test_tp_checkpoint_roundtrip pins the
    periodic one."""
    from m3f.pytorch_tpu.train.checkpoint import (Checkpointer, load_meta,
                                                  load_model_checkpoint)

    cfg = tiny_cfg(4, 2)
    trainer = Trainer(cfg)
    state = trainer.init_state()
    step = trainer.make_train_step()
    state, _ = step(state, shard_batch(trainer.mesh, make_batch(cfg)))
    host_params = jax.device_get(state.params)
    ck = Checkpointer(str(tmp_path), cfg=cfg)
    best = ck.save_best(state, 0.42)
    for leaf in jax.tree.leaves(state):
        leaf.delete()  # what donate_argnums=0 does to the caller's buffers
    ck.wait()

    assert load_meta(best)["metric"] == 0.42
    restored = load_model_checkpoint(trainer.init_state(), best)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(host_params),
                    jax.tree.leaves(jax.device_get(restored.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
