"""Tooling: torch-checkpoint import script + profiler trace summarizer."""

import gzip
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow  # cold jax+torch subprocess startup dominates (~minutes)
def test_import_torch_checkpoint_script(tmp_path):
    import torch
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from torch_golden import AudioCNNGolden

    torch.manual_seed(0)
    m = AudioCNNGolden()
    pt = str(tmp_path / "audio.pth")
    torch.save({"state_dict": m.state_dict()}, pt)

    out = str(tmp_path / "audio.npz")
    r = subprocess.run([sys.executable,
                        os.path.join(REPO, "scripts", "import_torch_checkpoint.py"),
                        pt, out, "--kind", "audio_cnn"],
                       capture_output=True, text=True,
                       env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    assert os.path.exists(out)

    # converted params load against the jax model template
    from m3f.pytorch_tpu.config import AudioNetConfig
    from m3f.pytorch_tpu.models.audio import AudioCNN
    from m3f.pytorch_tpu.train.checkpoint import load_pytree
    import jax
    model = AudioCNN(AudioNetConfig())
    params, state = model.init(jax.random.PRNGKey(0))
    loaded = load_pytree({"params": params, "state": state}, out)
    # spot check: first conv kernel matches the torch weight (OIHW→HWIO)
    w_t = m.state_dict()
    first = sorted(k for k in w_t if k.endswith("weight") and w_t[k].ndim == 4)[0]
    want = w_t[first].numpy().transpose(2, 3, 1, 0)
    got_leaves = [np.asarray(l) for l in jax.tree.leaves(loaded["params"])
                  if np.asarray(l).shape == want.shape]
    assert any(np.allclose(g, want, atol=1e-6) for g in got_leaves)


def test_summarize_trace(tmp_path):
    from m3f.pytorch_tpu.utils.profiling import summarize_trace
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 3, "tid": 1, "name": "jit_step(123)", "dur": 10000, "ts": 0},
        {"ph": "X", "pid": 3, "tid": 2, "name": "fusion.1", "dur": 6000, "ts": 0},
        {"ph": "X", "pid": 3, "tid": 2, "name": "fusion.2", "dur": 1000, "ts": 0},
        {"ph": "X", "pid": 3, "tid": 2, "name": "convert_reduce_fusion.9", "dur": 3000, "ts": 0},
        {"ph": "X", "pid": 9, "tid": 3, "name": "host_stuff", "dur": 99999, "ts": 0},
    ]
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    rows = summarize_trace(str(tmp_path))
    assert rows[0]["op"] == "fusion" and abs(rows[0]["ms"] - 7.0) < 1e-6
    assert abs(rows[0]["percent"] - 70.0) < 1e-6
    assert {r["op"] for r in rows} == {"fusion", "convert_reduce_fusion"}


def test_stablehlo_export_roundtrip(tmp_path):
    """scripts/export_stablehlo.py: serialized artifact reloads and matches
    the live model (weights baked in as constants)."""
    import jax
    from jax import export as jexport
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "export_stablehlo", os.path.join(REPO, "scripts/export_stablehlo.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from m3f.pytorch_tpu.config import (AudioNetConfig, ExperimentConfig,
                                        GRUConfig, ModelConfig, TrainConfig,
                                        WindowConfig)
    from m3f.pytorch_tpu.train.loop import Trainer

    cfg = ExperimentConfig(
        name="shlo",
        model=ModelConfig(use_audio=True, use_video=False,
                          audio=AudioNetConfig(channels=(4, 8), feature_dim=8),
                          gru=GRUConfig(hidden_size=8),
                          compute_dtype="float32"),
        window=WindowConfig(windows_per_clip=2),
        train=TrainConfig(batch_size=2))
    exported, example = mod.build_exported(cfg, batch=2)
    blob = exported.serialize()
    assert len(blob) > 1000

    rng = np.random.RandomState(3)
    wav = rng.randn(*example[0].shape).astype(np.float32)
    reloaded = jexport.deserialize(blob)
    got = reloaded.call(wav)

    trainer = Trainer(cfg)
    state = trainer.init_state()
    want, _ = trainer.model.apply(state.params, state.bn_state, wav=wav,
                                  train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_average_checkpoints(tmp_path):
    """SWA tool: mean of two TrainState checkpoints, loadable for eval."""
    import importlib.util
    import jax
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_train_integration import tiny_audio_cfg
    from m3f.pytorch_tpu.train.checkpoint import (Checkpointer,
                                                  load_model_checkpoint)
    from m3f.pytorch_tpu.train.loop import Trainer

    cfg = tiny_audio_cfg(ckpt_dir=str(tmp_path))
    tr = Trainer(cfg)
    s0 = jax.device_get(tr.init_state(seed=0))
    s1 = jax.device_get(tr.init_state(seed=1))
    ck = Checkpointer(str(tmp_path), keep=5, cfg=cfg)
    p0 = ck.save(s0)
    p1 = ck.save(s1._replace(step=s1.step + 1))

    out = str(tmp_path / "avg.npz")
    spec = importlib.util.spec_from_file_location(
        "avg", os.path.join(REPO, "scripts", "average_checkpoints.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.main([p0, p1, "--out", out]) == 0

    got = load_model_checkpoint(tr.init_state(seed=2), out)
    want = jax.tree.map(lambda a, b:
                        (np.asarray(a, np.float64) + np.asarray(b, np.float64)) / 2,
                        s0.params, s1.params)
    for g, w in zip(jax.tree.leaves(got.params), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-6, atol=1e-7)


def test_inspect_checkpoint(tmp_path, capsys):
    """`m3f inspect` describes both checkpoint layouts from npz headers only
    (no device, no model): layout detection, meta passthrough, size groups."""
    from m3f.pytorch_tpu.main import main as cli
    from m3f.pytorch_tpu.train.checkpoint import save_pytree

    train_state = {
        "params": {"gru": {"w_ih": np.zeros((4, 12), np.float32)},
                   "head": {"w": np.zeros((8, 2), np.float32)}},
        "opt_state": {"mu": {"gru": {"w_ih": np.zeros((4, 12), np.float32)}}},
        "ema": {"gru": {"w_ih": np.zeros((4, 12), np.float32)}},
        "step": np.int64(7),
    }
    full = str(tmp_path / "ckpt_00000007.npz")
    # trainer meta embeds the FULL nested config (Checkpointer._meta) —
    # inspect must summarize it, not dump hundreds of fields inline
    save_pytree(train_state, full,
                {"step": 7, "config_hash": "cafe1234",
                 "config": {"model": {"gru": {"hidden_size": 256}},
                            "train": {"batch_size": 8}}})
    model_only = str(tmp_path / "imported.npz")
    save_pytree({"params": train_state["params"]}, model_only)

    assert cli(["inspect", full, model_only]) == 0
    out = capsys.readouterr().out
    assert "TrainState" in out and "+ema" in out
    assert "model-only" in out
    assert "config_hash=cafe1234" in out
    assert "hidden_size" not in out          # summarized, not dumped
    assert "config=<2 sections>" in out

    assert cli(["inspect", "--json", full]) == 0
    row = json.loads(capsys.readouterr().out.strip())
    assert row["layout"].startswith("TrainState")
    assert row["step"] == 7 and row["leaves"] == 5
    assert row["config"] == "<2 sections>"   # not the nested dict
    assert row["groups"]["params/gru"]["leaves"] == 1
    assert set(row["dtype_mbytes"]) == {"float32", "int64"}

    # REAL trainer checkpoints flatten the TrainState DATACLASS: every
    # attr component carries a leading "." (".params/gru/w_ih",
    # ".opt_state/1/0/.mu/...") — inspect must normalize per component,
    # not split naively (found by driving `m3f inspect` on a checkpoint
    # the real trainer wrote: layout came back "unknown", rc 1)
    import numpy as np_
    dotted = str(tmp_path / "real_format.npz")
    np_.savez(dotted, **{
        ".params/gru/w_ih": np.zeros((4, 12), np.float32),
        ".opt_state/1/0/.mu/gru/w_ih": np.zeros((4, 12), np.float32),
        ".opt_state/1/0/.count": np.zeros((), np.int32),
        ".bn_state/audio/0/mean": np.zeros((4,), np.float32),
        ".step": np.int64(3),
    })
    assert cli(["inspect", "--json", dotted]) == 0
    row = json.loads(capsys.readouterr().out.strip())
    assert row["layout"].startswith("TrainState")
    assert row["groups"]["params/gru"]["leaves"] == 1
    assert row["groups"]["opt_state"]["leaves"] == 2
