"""Import a torch checkpoint (.pt/.pth/Lightning .ckpt) into m3f-tpu format.

Capability parity: the reference loads pretrained video-backbone state_dicts
(IG-65M / Kinetics R(2+1)D-18 lineage) and Lightning ``.ckpt`` files with
key-prefix remapping (SURVEY.md §3.5, §2.1 C10).  This script is the bridge:

    python scripts/import_torch_checkpoint.py model.pth out_params.npz \
        [--kind r2plus1d|m3f] [--prefix backbone.]

The output ``.npz`` is a flat pytree checkpoint loadable by
``m3f.pytorch_tpu.train.checkpoint.load_pytree`` against a matching model's
params/state template. torch is only imported HERE — the core library stays
torch-free.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root

import numpy as np


def load_state_dict(path: str, prefix: str = "") -> dict:
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:   # Lightning .ckpt
        obj = obj["state_dict"]
    sd = {}
    for k, v in obj.items():
        if prefix and not k.startswith(prefix):
            continue
        k = k[len(prefix):]
        sd[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    return sd


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("torch_ckpt")
    ap.add_argument("out_npz")
    ap.add_argument("--kind", default="r2plus1d",
                    choices=["r2plus1d", "audio_cnn", "m3f"])
    ap.add_argument("--prefix", default="",
                    help="strip this key prefix (e.g. 'model.backbone.')")
    args = ap.parse_args(argv)

    from m3f.pytorch_tpu.train import convert
    from m3f.pytorch_tpu.train.checkpoint import save_pytree

    sd = load_state_dict(args.torch_ckpt, args.prefix)
    if not sd:
        print(f"no keys (after prefix filter '{args.prefix}')", file=sys.stderr)
        return 1
    meta = {"source": args.torch_ckpt, "kind": args.kind}
    mode = ""
    if args.kind == "r2plus1d":
        mode = convert.detect_visual_mode(sd)
        params, state = convert.convert_r2plus1d(sd)
    elif args.kind == "audio_cnn":
        params, state = convert.convert_audio_cnn(sd)
    else:
        mode = convert.detect_visual_mode(sd, "visual")
        params, state = convert.convert_m3f(sd)
    if mode:
        # surfaced so users of r3d_18/mc3_18 checkpoints know to set
        # model.visual.conv_mode — otherwise the later template load fails
        # with a generic key-mismatch error
        meta["conv_mode"] = mode
    save_pytree({"params": params, "state": state}, args.out_npz, meta=meta)
    n = sum(int(np.prod(np.asarray(p).shape))
            for p in __import__("jax").tree.leaves(params))
    hint = (f"; set model.visual.conv_mode={mode} to load it"
            if mode and mode != "2plus1d" else "")
    print(f"wrote {args.out_npz}: {n/1e6:.2f}M params ({args.kind}, "
          f"conv family {mode or 'n/a'}{hint})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
