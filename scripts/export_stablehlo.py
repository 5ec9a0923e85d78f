"""Export the M3F forward as a serialized StableHLO artifact (jax.export).

Serving story the reference lacks (its deployment unit is a torch checkpoint
plus the repo's Python): a single self-contained artifact holding the traced
per-window-sequence forward — weights baked in as constants — that any
StableHLO-capable runtime (XLA on TPU/GPU/CPU, IREE, PJRT plugins) can load
WITHOUT this codebase or Python.

    python scripts/export_stablehlo.py --preset fusion \
        [--checkpoint ckpt.npz] [--batch 8] --out m3f_fwd.stablehlo

Round-trips in-process via jax.export.deserialize (tests/test_tools.py).
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root

import numpy as np


def build_exported(cfg, checkpoint: str = "", batch: int = 2,
                   platforms=("cpu", "tpu")):
    """Trace + export the eval-mode forward; returns (exported, example args).

    ``platforms`` lowers the artifact for EVERY listed backend (jax.export
    multi-platform), so the same file serves on TPU and on a CPU fallback —
    without it the artifact only runs where it was exported.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from m3f.pytorch_tpu.data.windowing import samples_per_window
    from m3f.pytorch_tpu.train.loop import Trainer

    trainer = Trainer(cfg)
    state = trainer.init_state()
    if checkpoint:
        from m3f.pytorch_tpu.train.checkpoint import load_model_checkpoint
        state = load_model_checkpoint(state, checkpoint)
    params = jax.device_get(state.params)
    bn_state = jax.device_get(state.bn_state)

    mcfg = cfg.model
    W, L, S = (cfg.window.windows_per_clip, cfg.window.window_frames,
               cfg.data.image_size)
    spw = samples_per_window(mcfg.mel, mcfg.audio.mel_frames_per_window)

    args = []
    if mcfg.use_video:
        args.append(np.zeros((batch, W, L, S, S, 3), np.uint8))
    if mcfg.use_audio:
        args.append(np.zeros((batch, W, spw), np.float32))

    def fwd(*xs):
        i = 0
        kw = {}
        if mcfg.use_video:
            kw["video"] = xs[i]; i += 1
        if mcfg.use_audio:
            kw["wav"] = xs[i]; i += 1
        # weights are closed over → baked into the artifact as constants
        preds, _ = trainer.model.apply(params, bn_state, train=False, **kw)
        return preds

    exported = jexport.export(jax.jit(fwd), platforms=list(platforms))(
        *[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args])
    return exported, args


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="fusion")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--platforms", default="cpu,tpu",
                    help="comma list of backends to lower for (cpu,tpu,cuda)")
    ap.add_argument("--out", required=True)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    from m3f.pytorch_tpu.cache import enable_persistent_cache
    enable_persistent_cache()
    from m3f.pytorch_tpu.main import build_config
    cfg = build_config(args.preset, args.overrides)

    exported, example = build_exported(cfg, args.checkpoint, args.batch,
                                       platforms=args.platforms.split(","))
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    shapes = [tuple(a.shape) for a in example]
    print(f"wrote {args.out}: {len(blob)/1e6:.1f} MB, inputs {shapes}, "
          f"platform {exported.platforms}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
