"""CLI / trainer entry point.

Capability parity: reference ``main.py`` — "parse hparams, build module +
Trainer, run fit/test" with argparse hyperparameters (lr, batch size, window
length, devices, distributed backend) (SURVEY.md §2.1 C1, §1 L5;
reconstructed — reference mount empty).

TPU-first redesign: instead of a flat argparse namespace, a named preset
(one per BASELINE.json config) + dotted ``key=value`` overrides onto the
typed config tree; there is no separate "distributed backend" flag — the
mesh IS the backend (parallel/mesh.py), and multi-host just needs
``jax.distributed.initialize`` which happens automatically under a
coordinator env.

Usage:
    python -m m3f.pytorch_tpu.main train --preset fusion \
        train.batch_size=32 train.optim.learning_rate=3e-4
    python -m m3f.pytorch_tpu.main eval  --preset longseq_eval \
        --checkpoint /path/ckpt_00001000.npz
    python -m m3f.pytorch_tpu.main predict --preset longseq_eval \
        --checkpoint ... --out submission/
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
from typing import Dict, List

import numpy as np

from m3f.pytorch_tpu.config import (ExperimentConfig, PRESETS, apply_overrides)
from m3f.pytorch_tpu.data.synthetic import SyntheticAVDataset
from m3f.pytorch_tpu.data.windowing import (WindowSequencer,
                                            process_sharded_stream)
from m3f.pytorch_tpu.parallel.mesh import maybe_initialize_distributed
from m3f.pytorch_tpu.train.checkpoint import Checkpointer
from m3f.pytorch_tpu.train.loop import Trainer
from m3f.pytorch_tpu.utils.logging import MetricWriter


# base presets plus the stackable TPU-native variants of each
_PRESET_VARIANTS = {
    "lane": {"model.visual.mid_mode": "lane"},
    "s2d": {"model.visual.stem_s2d": True},
}
_VARIANT_COMBOS = [
    "+".join(c)
    for r in range(1, len(_PRESET_VARIANTS) + 1)
    for c in itertools.permutations(sorted(_PRESET_VARIANTS), r)
]
_PRESET_CHOICES = sorted(PRESETS) + [p + "+" + v
                                     for p in sorted(PRESETS)
                                     for v in _VARIANT_COMBOS]


def _parse_value(s: str):
    try:
        return json.loads(s)
    except json.JSONDecodeError:
        return s


def build_config(preset: str, overrides: List[str]) -> ExperimentConfig:
    # "<preset>+lane+s2d" = stacked TPU-native variants: "lane" = the
    # lane-rounded-midplanes variant (visual.mid_mode="lane", +35% train
    # throughput, BASELINE.md; not torch-checkpoint-compatible), "s2d" = the
    # space-to-depth stem (exact math, checkpoint-compatible). Same syntax as
    # scripts/tpu_smoke.py.
    base, *variants = preset.split("+")
    cfg = PRESETS[base]()
    for variant in variants:
        if variant not in _PRESET_VARIANTS:
            raise SystemExit(f"unknown preset variant '+{variant}' "
                             f"(know: {', '.join('+' + v for v in _PRESET_VARIANTS)})")
        cfg = apply_overrides(cfg, _PRESET_VARIANTS[variant])
    kv = {}
    for o in overrides:
        if "=" not in o:
            raise SystemExit(f"override '{o}' is not key=value")
        k, _, v = o.partition("=")
        kv[k] = _parse_value(v)
    return apply_overrides(cfg, kv)


def make_dataset(cfg: ExperimentConfig, split: str):
    if cfg.data.root and not cfg.data.synthetic:
        from m3f.pytorch_tpu.data.affwild2 import AffWild2Dataset
        return AffWild2Dataset(cfg.data, cfg.model.mel, split=split)
    return SyntheticAVDataset(cfg.data, cfg.model.mel)


def cmd_train(cfg: ExperimentConfig, args) -> int:
    if getattr(args, "init_from", ""):
        from m3f.pytorch_tpu.config import apply_overrides as _ov
        cfg = _ov(cfg, {"model.init_from": args.init_from})
    if cfg.train.debug_nans:
        import jax
        jax.config.update("jax_debug_nans", True)
    if getattr(args, "coordinator", ""):
        os.environ["M3F_COORDINATOR"] = args.coordinator
    plan = maybe_initialize_distributed()
    if plan.initialize:
        import jax
        print(f"distributed: {plan.reason} -> process "
              f"{jax.process_index()}/{jax.process_count()}")
    import jax
    trainer = Trainer(cfg)
    ds = make_dataset(cfg, "train")
    # per-video mel hop (VERDICT r4 missing #1): auto-enabled when the
    # corpus has off-rate videos, so each window's 16 mel frames track its
    # video's 16 frames at the TRUE rate; uniformly-nominal corpora keep
    # the historical fixed-hop shapes (and compiled programs) exactly
    from m3f.pytorch_tpu.data.windowing import needs_dynamic_hop
    off_rate = cfg.model.use_audio and needs_dynamic_hop(
        ds, cfg.model.mel, cfg.data.fps)
    # the pallas mel frontend frames at a compile-time stride — it cannot
    # take the per-example hop, and auto-enabling it would turn a
    # previously-working pallas config into a trace-time error. Fall back
    # to the fixed nominal hop (the bounded-warp pre-dynamic behavior)
    # and say so loudly.
    hop_aware = off_rate and cfg.model.mel_backend != "pallas"
    if hop_aware:
        print("per-video mel hop: dataset has off-rate videos — hop-aware "
              "windowing enabled (one shared dynamic-hop train program)")
    elif off_rate:
        print("WARNING: dataset has off-rate videos but "
              "model.mel_backend='pallas' frames at a compile-time stride — "
              "keeping the fixed nominal mel hop (audio time base warps by "
              "up to ~1/5 window at 25 fps; use model.mel_backend=xla for "
              "the per-video hop)")
    seq = WindowSequencer(cfg.window, cfg.model.mel, fps=cfg.data.fps,
                          mel_frames=cfg.model.audio.mel_frames_per_window,
                          per_frame=cfg.model.per_frame,
                          hop_aware=hop_aware)
    # each process feeds a DISJOINT local shard of global_batch/process_count
    # (shard_batch assembles the global array via
    # make_array_from_process_local_data); single-process this is the plain
    # example stream with the full batch
    pc = jax.process_count()
    if cfg.train.batch_size % pc:
        raise SystemExit(f"train.batch_size={cfg.train.batch_size} must be "
                         f"divisible by process_count={pc}")
    from m3f.pytorch_tpu.data.native_loader import Prefetcher

    # factory form: fit() calls this AFTER checkpoint restore with the
    # restored step, so a resumed run's data stream fast-forwards to the
    # exact position the uninterrupted run would be at
    def stream(skip_batches: int = 0):
        return Prefetcher(
            process_sharded_stream(ds, seq, cfg.train.batch_size // pc,
                                   seed=cfg.train.seed,
                                   shuffle_buffer=cfg.data.shuffle_buffer,
                                   skip_batches=skip_batches,
                                   cache_videos=cfg.data.cache_videos),
            depth=cfg.data.prefetch)
    # eval-during-training is the DEFAULT (best-checkpoint tracking + early
    # stopping depend on it, reference C8); --no-eval opts out
    val = None if args.no_eval else make_dataset(cfg, "val")
    ckpt = Checkpointer(cfg.train.checkpoint_dir, cfg.train.keep_checkpoints, cfg)
    if getattr(args, "resume_from", ""):
        ckpt.seed_from(args.resume_from)
    if pc > 1:
        # multi-host: process 0 just seeded / will write checkpoints into
        # the SHARED checkpoint_dir; everyone else must not race ahead and
        # restore (or skip restoring) before that write lands
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("m3f:checkpoint-dir-ready")
    writer = MetricWriter(cfg.train.checkpoint_dir, "train")

    from m3f.pytorch_tpu.utils.logging import console_log

    # trainer._last_state is refreshed inside fit() after every step
    ckpt.install_preemption_handler(lambda: trainer._last_state)
    state, history = trainer.fit(stream, val_dataset=val, log=console_log,
                                 checkpointer=ckpt, metric_writer=writer)
    ckpt.save(state)
    writer.close()
    return 0


def _load_states(trainer, checkpoint_arg: str):
    """--checkpoint "a.npz" or "a.npz,b.npz,..." → list of committed states.

    The comma form is the challenge-era prediction-level ensemble: eval /
    predict average the k models' per-frame tracks (Trainer.evaluate_ensemble
    / predict_ensemble). Accepts full TrainState ckpts AND
    import_torch_checkpoint.py {params,state} npz files.
    commit_state(eval_only): loaded leaves are host numpy — without the
    commit every video's dispatch re-uploads the whole parameter set
    (BASELINE.md round 4: 23x); eval_only keeps the k members' Adam moments
    and ema aliases off the device entirely. ONE init_state serves as the
    load template for all members (it is only read for shapes/dtypes).
    """
    from m3f.pytorch_tpu.train.checkpoint import load_model_checkpoint
    paths = [p.strip() for p in checkpoint_arg.split(",") if p.strip()]
    if not paths:
        raise SystemExit(
            f"--checkpoint {checkpoint_arg!r} contains no checkpoint paths")
    template = trainer.init_state()
    return [trainer.commit_state(load_model_checkpoint(template, p),
                                 eval_only=True) for p in paths]


def cmd_eval(cfg: ExperimentConfig, args) -> int:
    trainer = Trainer(cfg)
    # --per-video: one JSON row per video (which videos drag the mean down)
    row = (lambda vid, r: print(json.dumps(
        {"video": vid, "ccc_v": r["ccc_v"], "ccc_a": r["ccc_a"]}))
    ) if args.per_video else None
    ds = make_dataset(cfg, args.split)
    states = _load_states(trainer, args.checkpoint) if args.checkpoint \
        else [trainer.init_state()]
    if len(states) > 1:
        res = trainer.evaluate_ensemble(states, ds,
                                        max_videos=args.max_videos,
                                        per_video_fn=row)
    else:
        res = trainer.evaluate(states[0], ds, max_videos=args.max_videos,
                               per_video_fn=row)
    print(json.dumps(res))
    return 0


def cmd_export(args) -> int:
    """Export weights / serving artifacts (wraps the scripts/ tools).

    --format torch:     checkpoint npz → reference-schema torch state_dict .pt
    --format stablehlo: self-contained multi-platform forward artifact
    """
    import importlib.util
    import os

    scripts = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "scripts")
    if not os.path.isdir(scripts):
        # installed-package deployments ship only the m3f package;
        # the export tools live in the repo's scripts/ directory
        raise SystemExit(
            "m3f export needs the repository checkout (scripts/ not found "
            f"at {scripts}) — run it from a clone of the repo")

    def load(name):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(scripts, name + ".py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    if args.format == "torch":
        if not args.checkpoint:
            raise SystemExit("--format torch requires --checkpoint")
        return load("export_torch_checkpoint").main([args.checkpoint, args.out])

    argv = ["--preset", args.preset, "--batch", str(args.batch),
            "--platforms", args.platforms, "--out", args.out]
    if args.checkpoint:
        argv += ["--checkpoint", args.checkpoint]
    return load("export_stablehlo").main(argv + list(args.overrides))


def cmd_predict(cfg: ExperimentConfig, args) -> int:
    """Full-video predictions → ABAW submission txts (C11)."""
    from m3f.pytorch_tpu.infer.submission import write_submission
    if cfg.window.eval_smooth > 1 and args.smooth > 1:
        # both the on-device eval smoother and the submission postprocess
        # smoother would run — almost certainly not what the user wants
        raise SystemExit("window.eval_smooth and --smooth are both set; "
                         "predictions would be smoothed twice — pick one")
    trainer = Trainer(cfg)
    states = _load_states(trainer, args.checkpoint) if args.checkpoint \
        else [trainer.init_state()]
    ds = make_dataset(cfg, args.split)
    preds: Dict[str, np.ndarray] = {}
    valids: Dict[str, np.ndarray] = {}
    ids = ds.video_ids()
    if args.max_videos:
        ids = ids[: args.max_videos]

    # pipelined: decode/H2D of the next video overlaps the current compute
    def load(vid):
        video = ds.load_video(vid)
        valids[vid] = video["valid"]
        return vid, video

    if len(states) > 1:
        # checkpoint ensemble: mean per-frame track over the k models
        # (the k dispatches per video already overlap inside
        # predict_ensemble, so the cross-video pipelining matters less)
        for vid in ids:
            v, video = load(vid)
            preds[v] = trainer.predict_ensemble(states, video)
    else:
        for vid, r in trainer.evaluate_stream(states[0],
                                              (load(v) for v in ids)):
            preds[vid] = r["pred"]
    write_submission(args.out, preds, valids, smooth_window=args.smooth)
    print(f"wrote {len(preds)} submission files to {args.out}")
    return 0


def cmd_profile(args) -> int:
    """Summarize a jax.profiler trace directory (device op-time breakdown)."""
    from m3f.pytorch_tpu.utils.profiling import summarize_trace
    for row in summarize_trace(args.dir, top=args.top, group=not args.full):
        extra = (f" x{row['count']:<3d} {row['detail']}"
                 if "detail" in row else "")
        print(f"{row['ms']:10.2f} ms {row['percent']:5.1f}%  {row['op']}{extra}")
    return 0


def cmd_inspect(args) -> int:
    """Checkpoint archaeology without a model or a device: meta (step,
    config hash, best metric), layout, and a per-group size/dtype breakdown
    from the npz headers — the operator's answer to "what IS this file?"
    before committing to an eval/serve/resume on it. Pure numpy; works on
    hosts with no accelerator (reference parity note: the torch analog is
    an interactive ``torch.load`` — SURVEY §2.1 C10; rebuild-only CLI)."""
    import json as _json

    import numpy as np
    ok = True
    for path in args.checkpoint:
        with np.load(path) as z:
            meta = {}
            if "__meta__" in z.files:
                meta = _json.loads(bytes(z["__meta__"]).decode())
            keys = [k for k in z.files if k != "__meta__"]
            groups = {}
            total_bytes = 0
            dtypes = {}
            for k in keys:
                a = z[k]
                # trainer checkpoints flatten DATACLASS attrs with a leading
                # "." per component (".params/audio/...", ".opt_state/1/0/
                # .mu/..."); imported model-only npz flatten plain dicts
                # ("params/..."). Normalize per component so both describe.
                parts = [p.lstrip(".") for p in k.split("/")]
                # params/<branch>/... groups by branch; everything else by root
                g = "/".join(parts[:2]) if parts[0] in ("params", "ema")  \
                    and len(parts) > 1 else parts[0]
                st = groups.setdefault(g, [0, 0])
                st[0] += 1
                st[1] += a.nbytes
                total_bytes += a.nbytes
                dtypes[str(a.dtype)] = dtypes.get(str(a.dtype), 0) + a.nbytes
            roots = {k.split("/")[0].lstrip(".") for k in keys}
            layout = ("TrainState (resumable: params+opt+step"
                      + ("+ema" if "ema" in roots else "") + ")"
                      if {"params", "opt_state"} <= roots
                      else "model-only (eval/serve/init-from)"
                      if "params" in roots or "state" in roots
                      else "unknown")
        # trainer checkpoints embed the FULL nested config under
        # meta["config"] (resume safety) — summarize it to its field count
        # so the one-line description stays one line; the hash is the
        # identity an operator compares anyway
        meta_view = {k: (f"<{len(v)} sections>" if k == "config"
                         and isinstance(v, dict) else v)
                     for k, v in meta.items()}
        row = {"path": path, "layout": layout, "leaves": len(keys),
               "mbytes": round(total_bytes / 2**20, 2), **meta_view}
        if args.json:
            print(_json.dumps({**row, "groups": {g: {"leaves": c, "mbytes":
                  round(b / 2**20, 2)} for g, (c, b) in sorted(groups.items())},
                  "dtype_mbytes": {d: round(b / 2**20, 2)
                                   for d, b in sorted(dtypes.items())}}))
        else:
            meta_s = " ".join(f"{k}={v}" for k, v in meta_view.items())
            print(f"{path}: {layout}")
            print(f"  {len(keys)} leaves, {total_bytes / 2**20:.2f} MiB"
                  + (f"  [{meta_s}]" if meta_s else "  [no meta]"))
            for g, (c, b) in sorted(groups.items(),
                                    key=lambda kv: -kv[1][1]):
                print(f"  {b / 2**20:10.2f} MiB  {c:4d} leaves  {g}")
            print("  dtypes: " + ", ".join(
                f"{d}={b / 2**20:.2f}MiB" for d, b in sorted(dtypes.items())))
        ok = ok and layout != "unknown"
    return 0 if ok else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="m3f", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    sp = sub.add_parser("inspect",
                        help="describe checkpoint npz files (meta, layout, "
                             "size breakdown) without loading a model")
    sp.add_argument("checkpoint", nargs="+")
    sp.add_argument("--json", action="store_true",
                    help="one JSON line per file")
    sp = sub.add_parser("profile", help="summarize a profiler trace dir")
    sp.add_argument("dir")
    sp.add_argument("--top", type=int, default=15)
    sp.add_argument("--full", action="store_true",
                    help="per-HLO-fusion rows with shape signatures "
                         "(instead of grouping by op kind)")
    for name in ("train", "eval", "predict"):
        sp = sub.add_parser(name)
        sp.add_argument("--preset", default="fusion", choices=_PRESET_CHOICES)
        sp.add_argument("overrides", nargs="*", help="dotted key=value config overrides")
        if name == "train":
            sp.add_argument("--coordinator", default="",
                            help="host:port[,num_processes,process_id] — "
                                 "explicit multi-process rendezvous for "
                                 "launchers without TPU pod metadata (sets "
                                 "M3F_COORDINATOR; pod workers are detected "
                                 "automatically via TPU_WORKER_HOSTNAMES)")
            sp.add_argument("--no-eval", action="store_true",
                            help="skip periodic eval (disables best-ckpt/early stop)")
            sp.add_argument("--init-from", default="",
                            help="pretrained .npz from import_torch_checkpoint.py "
                                 "(backbone-only or full model; = model.init_from)")
            sp.add_argument("--resume-from", default="",
                            help="full TrainState checkpoint to seed a FRESH "
                                 "checkpoint_dir from (reference "
                                 "--resume_from_checkpoint); ignored when the "
                                 "dir already has checkpoints")
        else:
            sp.add_argument("--checkpoint", default="",
                            help="TrainState or imported npz; a comma list "
                                 "'a.npz,b.npz' evaluates/predicts the "
                                 "PREDICTION-level ensemble (mean per-frame "
                                 "track of the k models)")
            sp.add_argument("--max-videos", type=int, default=0)
            # predict on "test" = ABAW submission videos (crops, no labels);
            # eval needs labels so test is predict-only
            sp.add_argument("--split", default="val",
                            choices=(("train", "val") if name == "eval"
                                     else ("train", "val", "test")))
        if name == "eval":
            sp.add_argument("--per-video", action="store_true",
                            help="print one JSON row of CCCs per video")
        if name == "predict":
            sp.add_argument("--out", default="submission")
            sp.add_argument("--smooth", type=int, default=1,
                            help="moving-average smoothing window (frames)")
    sp = sub.add_parser("serve", help="HTTP prediction server over one model")
    sp.add_argument("--preset", default="longseq_eval", choices=_PRESET_CHOICES)
    sp.add_argument("--checkpoint", default="")
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=8321)
    sp.add_argument("--warmup-frames", type=int, default=1024,
                    help="pre-compile shape buckets up to this many frames "
                         "(0 = first request pays the compile)")
    sp.add_argument("--warmup-fps", default="",
                    help="comma list of expected client frame rates to "
                         "pre-compile (?fps=R whole-video requests), "
                         "e.g. 25,24")
    sp.add_argument("--max-streams", type=int, default=64,
                    help="concurrent live-stream session cap (429 beyond)")
    sp.add_argument("--stream-ttl", type=float, default=300.0,
                    help="evict live streams idle this many seconds "
                         "(410 on next touch; 0 = never evict)")
    sp.add_argument("--push-timeout", type=float, default=30.0,
                    help="max seconds a push may wait behind the "
                         "micro-batcher before answering 503")
    sp.add_argument("--allow-reload", action="store_true",
                    help="enable POST /reload (hot weight swap from a "
                         "server-side checkpoint path; operator endpoint, "
                         "off by default)")
    sp.add_argument("--max-body-mb", type=int, default=256,
                    help="per-request body cap in MiB (413 before any byte "
                         "is buffered beyond it; worst-case request RAM = "
                         "this x concurrent uploads — default 256 is ~4.4 "
                         "min of raw 112px/25fps video per /predict; "
                         "longer videos should stream)")
    sp.add_argument("overrides", nargs="*")
    sp = sub.add_parser("doctor",
                        help="dataset pre-flight: scan the ABAW tree for "
                             "wav-rate/fps/crop/annotation problems "
                             "(header reads only, no decode)")
    sp.add_argument("--preset", default="fusion", choices=_PRESET_CHOICES)
    sp.add_argument("--splits", default="train,val,test")
    sp.add_argument("--json", action="store_true",
                    help="one JSON row per video instead of console lines")
    sp.add_argument("overrides", nargs="*")
    sp = sub.add_parser("export", help="export weights / serving artifacts")
    sp.add_argument("--preset", default="fusion", choices=_PRESET_CHOICES)
    sp.add_argument("--checkpoint", default="", help="TrainState or imported npz")
    sp.add_argument("--format", choices=("torch", "stablehlo"), required=True,
                    help="torch: reference-schema state_dict npz; "
                         "stablehlo: self-contained serving artifact")
    sp.add_argument("--out", required=True)
    sp.add_argument("--batch", type=int, default=8, help="stablehlo batch dim")
    sp.add_argument("--platforms", default="cpu,tpu")
    sp.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)
    if args.cmd == "inspect":
        return cmd_inspect(args)     # pure numpy — never touches a device
    if args.cmd == "profile":
        return cmd_profile(args)
    if args.cmd == "export":
        return cmd_export(args)
    from m3f.pytorch_tpu.cache import enable_persistent_cache
    enable_persistent_cache()
    cfg = build_config(args.preset, args.overrides)
    from m3f.pytorch_tpu.utils.logging import console_log
    console_log(f"config {cfg.name} hash={cfg.config_hash()}")
    if args.cmd == "doctor":
        from m3f.pytorch_tpu.data.doctor import run_doctor
        return run_doctor(cfg, splits=tuple(
            s for s in args.splits.split(",") if s), as_json=args.json)
    if args.cmd == "serve":
        from m3f.pytorch_tpu.infer import Predictor
        from m3f.pytorch_tpu.infer.server import run_server
        rates = tuple(float(r) for r in args.warmup_fps.split(",") if r)
        return run_server(Predictor(cfg=cfg, checkpoint=args.checkpoint),
                          host=args.host, port=args.port,
                          warmup_frames=args.warmup_frames,
                          max_streams=args.max_streams,
                          stream_ttl_s=args.stream_ttl,
                          push_timeout_s=args.push_timeout,
                          warmup_rates=rates,
                          allow_reload=args.allow_reload,
                          max_body=args.max_body_mb << 20)
    return {"train": cmd_train, "eval": cmd_eval, "predict": cmd_predict}[args.cmd](cfg, args)


if __name__ == "__main__":
    sys.exit(main())
