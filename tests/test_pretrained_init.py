"""Pretrained-init wiring (SURVEY §3.5; VERDICT r1 missing #2 / ADVICE r1).

The import path is: torch checkpoint → scripts/import_torch_checkpoint.py →
{params, state} .npz (meta kind) → ModelConfig.init_from →
Trainer.init_state partial load.  Converter numerics are covered by the slow
golden-parity tests; these tests cover the WIRING with tiny models.
"""

import dataclasses

import numpy as np
import jax

from m3f.pytorch_tpu.config import (AudioNetConfig, ExperimentConfig,
                                    GRUConfig, MeshConfig, ModelConfig,
                                    TrainConfig, VisualNetConfig, WindowConfig)
from m3f.pytorch_tpu.data.windowing import samples_per_window
from m3f.pytorch_tpu.parallel.mesh import shard_batch
from m3f.pytorch_tpu.train.checkpoint import (load_model_checkpoint,
                                              save_pytree)
from m3f.pytorch_tpu.train.loop import Trainer


def tiny_cfg(init_from="") -> ExperimentConfig:
    return ExperimentConfig(
        name="pretrained",
        model=ModelConfig(
            use_audio=True, use_video=True,
            audio=AudioNetConfig(channels=(4, 8), feature_dim=8),
            visual=VisualNetConfig(block_channels=(4, 8), blocks_per_stage=(1, 1),
                                   stem_channels=4, feature_dim=8),
            gru=GRUConfig(hidden_size=8),
            init_from=init_from,
        ),
        window=WindowConfig(windows_per_clip=2),
        train=TrainConfig(batch_size=2, mesh=MeshConfig(num_data=1)),
    )


def make_batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    W, L, S = cfg.window.windows_per_clip, cfg.window.window_frames, 16
    spw = samples_per_window(cfg.model.mel, cfg.model.audio.mel_frames_per_window)
    return {
        "video": rng.randint(0, 256, (2, W, L, S, S, 3)).astype(np.uint8),
        "wav": rng.randn(2, W, spw).astype(np.float32),
        "labels": rng.uniform(-1, 1, (2, W, L, 2)).astype(np.float32),
        "mask": np.ones((2, W, L), dtype=bool),
    }


def _eq(a, b):
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(b)))


def test_init_from_full_model_and_trains(tmp_path):
    src = Trainer(tiny_cfg()).init_state(seed=7)
    path = str(tmp_path / "full.npz")
    save_pytree({"params": jax.device_get(src.params),
                 "state": jax.device_get(src.bn_state)}, path,
                meta={"kind": "m3f"})

    cfg = tiny_cfg(init_from=path)
    tr = Trainer(cfg)
    state = tr.init_state(seed=0)  # different seed: init MUST come from file
    assert _eq(state.params, src.params)
    assert int(state.step) == 0

    # 2 train steps from the pretrained init stay finite
    step = tr.make_train_step()
    for i in range(2):
        state, m = step(state, shard_batch(tr.mesh, make_batch(cfg, seed=i)))
    assert np.isfinite(float(m["loss"]))


def test_init_from_visual_branch_only(tmp_path):
    src = Trainer(tiny_cfg()).init_state(seed=7)
    path = str(tmp_path / "backbone.npz")
    save_pytree({"params": jax.device_get(src.params)["visual"],
                 "state": jax.device_get(src.bn_state)["visual"]}, path,
                meta={"kind": "r2plus1d"})

    tr = Trainer(tiny_cfg(init_from=path))
    state = tr.init_state(seed=0)
    assert _eq(state.params["visual"], src.params["visual"])
    # head and audio branch stay at the FRESH (seed-0) init, not seed-7's
    fresh = Trainer(tiny_cfg()).init_state(seed=0)
    assert _eq(state.params["head"], fresh.params["head"])
    assert _eq(state.params["audio"], fresh.params["audio"])
    assert not _eq(state.params["visual"], fresh.params["visual"])


def test_kind_inferred_without_meta(tmp_path):
    src = Trainer(tiny_cfg()).init_state(seed=7)
    path = str(tmp_path / "nometa.npz")
    save_pytree({"params": jax.device_get(src.params)["visual"],
                 "state": jax.device_get(src.bn_state)["visual"]}, path)
    state = Trainer(tiny_cfg(init_from=path)).init_state(seed=0)
    assert _eq(state.params["visual"], src.params["visual"])


def test_eval_loads_imported_params_npz(tmp_path):
    """cmd_eval/cmd_predict path: a {params,state} npz (no opt_state/step)
    loads against a TrainState template (ADVICE r1 medium)."""
    src = Trainer(tiny_cfg()).init_state(seed=7)
    path = str(tmp_path / "import.npz")
    save_pytree({"params": jax.device_get(src.params),
                 "state": jax.device_get(src.bn_state)}, path,
                meta={"kind": "m3f"})

    tr = Trainer(tiny_cfg())
    state = load_model_checkpoint(tr.init_state(seed=0), path)
    assert _eq(state.params, src.params)
    assert _eq(state.bn_state, src.bn_state)
    assert int(state.step) == 0  # opt_state/step untouched

    # and a FULL TrainState checkpoint still loads through the same helper
    full = str(tmp_path / "full_state.npz")
    save_pytree(jax.device_get(dataclasses.replace(src, step=src.step + 5)
                               if dataclasses.is_dataclass(src)
                               else src._replace(step=src.step + 5)), full)
    state2 = load_model_checkpoint(tr.init_state(seed=0), full)
    assert int(state2.step) == 5
