"""EMA weight averaging (train.ema_decay): shadow math, eval routing,
checkpoint layout, and semantic-hash behavior."""

import numpy as np
import pytest

import jax

from m3f.pytorch_tpu.config import (AudioNetConfig, DataConfig,
                                    ExperimentConfig, GRUConfig, MeshConfig,
                                    ModelConfig, OptimConfig, TrainConfig,
                                    WindowConfig)
from m3f.pytorch_tpu.data.synthetic import SyntheticAVDataset
from m3f.pytorch_tpu.data.windowing import WindowSequencer, example_stream
from m3f.pytorch_tpu.train.checkpoint import (Checkpointer,
                                              load_model_checkpoint,
                                              save_pytree)
from m3f.pytorch_tpu.train.loop import Trainer


def _cfg(ema_decay=0.5, num_steps=3, ckpt_dir="/tmp/m3f_ema"):
    return ExperimentConfig(
        name="ema_t",
        model=ModelConfig(
            use_audio=True, use_video=False,
            audio=AudioNetConfig(channels=(8, 16), feature_dim=16),
            gru=GRUConfig(hidden_size=16),
        ),
        window=WindowConfig(windows_per_clip=2),
        data=DataConfig(synthetic_num_videos=2, synthetic_video_frames=96,
                        image_size=16),
        train=TrainConfig(batch_size=4, num_steps=num_steps, log_every=100,
                          eval_every=10_000, checkpoint_every=10_000,
                          checkpoint_dir=ckpt_dir, ema_decay=ema_decay,
                          # constant-decay mode: these tests assert the
                          # textbook recurrence (the ramp has its own test)
                          ema_ramp=False,
                          optim=OptimConfig(learning_rate=3e-3),
                          mesh=MeshConfig(num_data=1)),
    )


def _stream(cfg):
    ds = SyntheticAVDataset(cfg.data, cfg.model.mel)
    seq = WindowSequencer(cfg.window, cfg.model.mel,
                          mel_frames=cfg.model.audio.mel_frames_per_window)
    return example_stream(ds, seq, cfg.train.batch_size, seed=5)


def test_ema_shadow_math():
    """state.ema follows e ← e·d + p·(1−d) over the actual param path."""
    cfg = _cfg(ema_decay=0.5)
    tr = Trainer(cfg)
    state = tr.init_state()
    step = tr.make_train_step()
    from m3f.pytorch_tpu.parallel.mesh import shard_batch

    expected = jax.device_get(state.params)  # ema starts equal to init
    d = cfg.train.ema_decay
    stream = _stream(cfg)
    for _ in range(3):
        batch = shard_batch(tr.mesh, next(stream))
        state, _ = step(state, batch)
        p = jax.device_get(state.params)
        expected = jax.tree_util.tree_map(
            lambda e, q: e * d + q * (1.0 - d), expected, p)
    got = jax.device_get(state.ema)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        expected, got)
    # shadow must differ from the raw params (it is lagging them)
    flat_p = jax.tree_util.tree_leaves(jax.device_get(state.params))
    flat_e = jax.tree_util.tree_leaves(got)
    assert any(np.abs(a - b).max() > 0 for a, b in zip(flat_p, flat_e))


def test_eval_uses_ema_shadow():
    """evaluate_video on an EMA state == evaluating the shadow as params."""
    cfg = _cfg(ema_decay=0.9)
    tr = Trainer(cfg)
    state, _ = tr.fit(_stream(cfg), log=lambda s: None)

    ds = SyntheticAVDataset(cfg.data, cfg.model.mel)
    video = ds.load_video(ds.video_ids()[0])
    r_ema = tr.evaluate_video(state, video)

    cfg_off = _cfg(ema_decay=0.0)
    tr_off = Trainer(cfg_off)
    state_off = tr_off.init_state()._replace(
        params=jax.device_get(state.ema),
        bn_state=jax.device_get(state.bn_state))
    r_shadow = tr_off.evaluate_video(state_off, video)
    np.testing.assert_allclose(r_ema["pred"], r_shadow["pred"],
                               rtol=1e-5, atol=1e-6)

    # and it is NOT what the raw params would produce
    state_raw = tr_off.init_state()._replace(
        params=jax.device_get(state.params),
        bn_state=jax.device_get(state.bn_state))
    r_raw = tr_off.evaluate_video(state_raw, video)
    assert np.abs(r_raw["pred"] - r_ema["pred"]).max() > 1e-7


def test_ema_checkpoint_roundtrip_and_eval_preference(tmp_path):
    cfg = _cfg(ema_decay=0.8, ckpt_dir=str(tmp_path))
    tr = Trainer(cfg)
    state, _ = tr.fit(_stream(cfg), log=lambda s: None)
    ck = Checkpointer(str(tmp_path), keep=2, cfg=cfg)
    ck.save(state)

    # full resume restores the shadow exactly
    restored = ck.maybe_restore(Trainer(cfg).init_state(), Trainer(cfg))
    jax.tree_util.tree_map(
        np.testing.assert_array_equal,
        jax.device_get(state.ema), jax.device_get(restored.ema))

    # model-only eval loading prefers the EMA shadow as the weights
    import glob
    path = sorted(glob.glob(str(tmp_path / "ckpt_*.npz")))[-1]
    loaded = load_model_checkpoint(Trainer(cfg).init_state(), path)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b,
                                                rtol=1e-6, atol=1e-7),
        jax.device_get(state.ema), jax.device_get(loaded.params))


def test_ema_off_keeps_layout_and_hash():
    """ema_decay=0 leaves checkpoints and config hashes byte-identical to
    the historical EMA-less layout."""
    base = _cfg(ema_decay=0.0)
    assert base.config_hash() == _cfg(ema_decay=0.0).config_hash()
    assert base.config_hash() != _cfg(ema_decay=0.99).config_hash()

    tr = Trainer(base)
    state = tr.init_state()
    assert state.ema is None
    from m3f.pytorch_tpu.train.checkpoint import _flatten_with_paths
    keys = _flatten_with_paths(jax.device_get(state))[0].keys()
    assert not any(k.startswith(".ema") for k in keys)


def test_ema_rejects_invalid_decay():
    with pytest.raises(ValueError, match="ema_decay"):
        Trainer(_cfg(ema_decay=1.0))
    with pytest.raises(ValueError, match="ema_decay"):
        Trainer(_cfg(ema_decay=-0.1))


def test_ema_grad_accum_updates_on_boundaries_only():
    """With accumulate_steps=k the shadow moves only when the optimizer
    actually applies an update — decay is d per UPDATE, not d^k."""
    import dataclasses

    cfg = _cfg(ema_decay=0.5)
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, optim=dataclasses.replace(cfg.train.optim,
                                             accumulate_steps=2)))
    tr = Trainer(cfg)
    state = tr.init_state()
    step = tr.make_train_step()
    from m3f.pytorch_tpu.parallel.mesh import shard_batch

    init_ema = jax.device_get(state.ema)
    stream = _stream(cfg)
    # micro-step 1: no optimizer update — shadow must not move
    state, _ = step(state, shard_batch(tr.mesh, next(stream)))
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, init_ema, jax.device_get(state.ema))
    # micro-step 2: boundary — exactly one e←e·d+p·(1−d) application
    state, _ = step(state, shard_batch(tr.mesh, next(stream)))
    d = cfg.train.ema_decay
    expected = jax.tree_util.tree_map(
        lambda e, p: e * d + p * (1.0 - d),
        init_ema, jax.device_get(state.params))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        expected, jax.device_get(state.ema))


def test_import_layout_checkpoint_refreshes_ema(tmp_path):
    """{params,state} import-layout checkpoints must refresh the shadow —
    otherwise an EMA-enabled eval config serves stale random-init weights."""
    cfg = _cfg(ema_decay=0.9)
    tr = Trainer(cfg)
    donor = Trainer(_cfg(ema_decay=0.9)).init_state()
    # an import-script-style model-only npz with DIFFERENT weights
    donor_params = jax.tree_util.tree_map(
        lambda x: np.asarray(x) + 1.0, jax.device_get(donor.params))
    path = str(tmp_path / "imported.npz")
    save_pytree({"params": donor_params,
                 "state": jax.device_get(donor.bn_state)}, path)
    loaded = load_model_checkpoint(tr.init_state(), path)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b,
                                                rtol=1e-6, atol=1e-7),
        jax.device_get(loaded.ema), donor_params)


def test_average_checkpoints_prefers_ema_shadow(tmp_path):
    """SWA over EMA checkpoints averages the shadow (the weights every
    eval scored), not the raw lagging params."""
    import subprocess
    import sys

    cfg = _cfg(ema_decay=0.9)
    paths = []
    emas = []
    for i in range(2):
        tr = Trainer(cfg)
        st = tr.init_state(seed=i)
        # make params and ema visibly different
        st = st._replace(ema=jax.tree_util.tree_map(
            lambda x: np.asarray(x) + 2.0, jax.device_get(st.params)))
        p = str(tmp_path / f"ckpt_{i}.npz")
        save_pytree(jax.device_get(st), p, {"step": i})
        paths.append(p)
        emas.append(jax.device_get(st.ema))
    out = str(tmp_path / "avg.npz")
    r = subprocess.run([sys.executable, "scripts/average_checkpoints.py",
                        *paths, "--out", out],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    with np.load(out) as z:
        first_key = sorted(k for k in z.files if k.startswith("params/"))[0]
        got = z[first_key]
    leaf_path = first_key[len("params/"):]
    flat0 = {k: v for k, v in _flatten(emas[0]).items()}
    flat1 = {k: v for k, v in _flatten(emas[1]).items()}
    want = (flat0[leaf_path].astype(np.float64)
            + flat1[leaf_path].astype(np.float64)) / 2
    np.testing.assert_allclose(got, want.astype(got.dtype),
                               rtol=1e-6, atol=1e-7)


def _flatten(tree):
    from m3f.pytorch_tpu.train.checkpoint import _flatten_with_paths
    return _flatten_with_paths(tree)[0]


def test_ema_ramp_follows_min_schedule():
    """ema_ramp: d_t = min(d, (1+t)/(10+t)) — an honest running average in
    early training, converging to the configured decay."""
    import dataclasses

    cfg = _cfg(ema_decay=0.999)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, ema_ramp=True))
    tr = Trainer(cfg)
    state = tr.init_state()
    step = tr.make_train_step()
    from m3f.pytorch_tpu.parallel.mesh import shard_batch

    expected = jax.device_get(state.params)
    stream = _stream(cfg)
    for t in range(3):
        state, _ = step(state, shard_batch(tr.mesh, next(stream)))
        d_t = min(0.999, (1.0 + t) / (10.0 + t))
        p = jax.device_get(state.params)
        expected = jax.tree_util.tree_map(
            lambda e, q, d=d_t: e * d + q * (1.0 - d), expected, p)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        expected, jax.device_get(state.ema))
    # the ramped shadow actually MOVED (a cold 0.999 shadow would not)
    init = Trainer(cfg).init_state()
    moved = [np.abs(np.asarray(a) - np.asarray(b)).max()
             for a, b in zip(jax.tree_util.tree_leaves(init.params),
                             jax.tree_util.tree_leaves(state.ema))]
    assert max(moved) > 1e-4


def test_ema_ramp_counts_applied_updates_under_accumulation():
    """With accumulate_steps=k the ramp index is the APPLIED update count,
    not the micro-step — otherwise the ramp scales by k and the shadow
    partially re-freezes, the exact problem it exists to fix."""
    import dataclasses

    cfg = _cfg(ema_decay=0.999)
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, ema_ramp=True,
        optim=dataclasses.replace(cfg.train.optim, accumulate_steps=2)))
    tr = Trainer(cfg)
    state = tr.init_state()
    step = tr.make_train_step()
    from m3f.pytorch_tpu.parallel.mesh import shard_batch

    init_ema = jax.device_get(state.ema)
    stream = _stream(cfg)
    state, _ = step(state, shard_batch(tr.mesh, next(stream)))  # micro 1
    state, _ = step(state, shard_batch(tr.mesh, next(stream)))  # applied @t=0
    # first APPLIED update: d_0 = min(0.999, 1/10) = 0.1
    expected = jax.tree_util.tree_map(
        lambda e, p: e * 0.1 + p * 0.9,
        init_ema, jax.device_get(state.params))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        expected, jax.device_get(state.ema))
