"""Training and evaluation loops.

Capability parity: the reference's LightningModule + Trainer — training_step
with CCC loss, sliding-window full-video validation, optimizer config,
checkpoint callbacks (SURVEY.md §2.1 C8/C9, §3.2/§3.3).  TPU-first redesign:

- ONE jitted train step (forward + CCC loss + backward + optax update + BN
  state update) with donated state — no Python in the hot path;
- data parallelism by construction: the batch arrives sharded on the mesh's
  ``data`` axis and GSPMD inserts the gradient all-reduce (parallel/mesh.py);
  BN statistics are computed over the GLOBAL batch (an improvement over torch
  DDP's per-replica stats — reference behavior is per-GPU);
- full-video eval enumerates overlapping windows, batches them through the
  model, and overlap-averages ON DEVICE (ops/stitch.py), then computes
  per-video CCC over the stitched frame timeline.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass
from typing import (Any, Callable, Dict, Iterator, List, NamedTuple, Optional,
                    Tuple)

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from m3f.pytorch_tpu.config import ExperimentConfig, OptimConfig
from m3f.pytorch_tpu.data.windowing import (samples_per_window,
                                            samples_per_window_max)
from m3f.pytorch_tpu.models.m3f import M3F
from m3f.pytorch_tpu.ops.ccc import (ccc, ccc_from_stats, ccc_loss,
                                     ccc_sufficient_stats, make_loss)
from m3f.pytorch_tpu.ops.stitch import (coverage_matrix, smooth_moving_average,
                                        stitch_framewise,
                                        stitch_framewise_sums, window_starts)
from m3f.pytorch_tpu.parallel.mesh import (batch_sharding, create_mesh,
                                           replicated, shard_batch,
                                           state_shardings)


class TrainState(NamedTuple):
    params: Any
    bn_state: Any
    opt_state: Any
    step: jnp.ndarray
    # EMA shadow of params (train.ema_decay > 0) or None. None flattens to
    # zero pytree leaves, so EMA-off checkpoints keep the historical layout.
    ema: Any = None
    # plateau-schedule LR multiplier: replicated fp32 scalar when
    # optim.schedule == "plateau", else None (same layout trick as ema).
    # Living in TrainState makes decays checkpoint/resume-exact and lets
    # fit() change the learning rate WITHOUT recompiling the train step.
    lr_mult: Any = None


class BestTracker:
    """Best-metric + patience tracking (reference C8: Lightning
    ModelCheckpoint(monitor=val CCC) + EarlyStopping, SURVEY §2.1/§3.2).

    ``update(metric)`` → ``(is_best, should_stop)``; higher is better.
    ``patience=0`` disables early stopping (best tracking stays on).
    """

    def __init__(self, patience: int = 0, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.best = -float("inf")
        self.best_step = -1
        self.bad_evals = 0

    def update(self, metric: float, step: int = -1) -> Tuple[bool, bool]:
        if metric > self.best + self.min_delta:
            self.best = metric
            self.best_step = step
            self.bad_evals = 0
            return True, False
        self.bad_evals += 1
        return False, self.patience > 0 and self.bad_evals >= self.patience


def _prefix_mask(prefixes: Tuple[str, ...]):
    """Callable bool-pytree mask over params: True iff the leaf's
    '/'-joined checkpoint path (train/checkpoint.py convention) equals or
    is nested under one of ``prefixes``.

    Returned as a callable so ``optax.masked`` evaluates it lazily against
    the real param tree at ``tx.init(params)`` — which is also where a
    prefix that matches nothing fails loudly (catches "vizual" typos
    before a run silently fine-tunes the wrong subtree).
    """
    def mask(params):
        flat, treedef = jax.tree_util.tree_flatten_with_path(params)
        keys = ["/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                         for p in path) for path, _ in flat]
        hits = {p: 0 for p in prefixes}
        out = []
        for key in keys:
            m = False
            for p in prefixes:
                if key == p or key.startswith(p + "/"):
                    m = True
                    hits[p] += 1
            out.append(m)
        missing = sorted(p for p, c in hits.items() if c == 0)
        if missing:
            tops = sorted({k.split("/")[0] for k in keys})
            raise ValueError(
                f"optim.freeze/lr_scale prefix(es) {missing} match no "
                f"parameter; top-level param groups are {tops}")
        return jax.tree_util.tree_unflatten(treedef, out)
    return mask


def _parse_lr_scales(spec: str) -> Tuple[Tuple[str, float], ...]:
    """Parse "visual=0.1,head=2.0"; reject overlapping prefixes (two scales
    on one param would compose multiplicatively — ambiguous, so loud)."""
    pairs = []
    for item in (s for s in spec.split(",") if s.strip()):
        prefix, sep, factor = item.partition("=")
        if not sep:
            raise ValueError(
                f"optim.lr_scale entry {item!r} is not 'prefix=factor'")
        pairs.append((prefix.strip(), float(factor)))
    names = [p for p, _ in pairs]
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            if a == b or a.startswith(b + "/") or b.startswith(a + "/"):
                raise ValueError(
                    f"optim.lr_scale prefixes {a!r} and {b!r} overlap — "
                    "a param under both would be scaled twice")
    return tuple(pairs)


def make_optimizer(cfg: OptimConfig,
                   num_steps: int = 100_000) -> optax.GradientTransformation:
    if cfg.schedule == "cosine":
        # decay horizon = the run length, so every run traverses the full
        # cosine (VERDICT r1 weak #5: a hardcoded 100k horizon left a 10k-step
        # run at 10% of the schedule)
        lr = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, max(cfg.warmup_steps, 1),
            max(num_steps, cfg.warmup_steps + 1))
    elif cfg.schedule == "step":
        # torch MultiStepLR-style staircase (the reference repo family's
        # usual schedule): lr ×= factor every `step_decay_every` steps
        every = cfg.step_decay_every or max(num_steps // 3, 1)
        lr = optax.piecewise_constant_schedule(
            cfg.learning_rate,
            {b: cfg.step_decay_factor
             for b in range(every, num_steps, every)})
    elif cfg.schedule in ("constant", "plateau"):
        # "plateau" = constant base schedule here; the data-driven decay is
        # TrainState.lr_mult post-scaling inside the train step (fit()
        # decides decays at eval boundaries — see OptimConfig docstring)
        if cfg.warmup_steps:
            lr = optax.linear_schedule(0.0, cfg.learning_rate,
                                       cfg.warmup_steps)
        else:
            lr = cfg.learning_rate
    else:
        raise ValueError(
            f"unknown optim.schedule {cfg.schedule!r} "
            "(know: constant, cosine, step, plateau)")
    if cfg.optimizer == "adam":
        opt = optax.adamw(lr, weight_decay=cfg.weight_decay) if cfg.weight_decay \
            else optax.adam(lr)
    elif cfg.optimizer == "sgd":
        opt = optax.sgd(lr, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer}")
    chain = [optax.clip_by_global_norm(cfg.grad_clip_norm), opt]
    # Fine-tuning controls (OptimConfig docstring): applied AFTER the inner
    # optimizer so they act on the final update. For adam/adamw/sgd the
    # update is lr-linear (moments/momentum are lr-independent), so a
    # post-scale by f is exactly a per-group learning rate of lr*f; the
    # freeze mask zeroes everything including adamw's decay term, keeping
    # frozen params bitwise at init.
    for prefix, factor in _parse_lr_scales(cfg.lr_scale):
        chain.append(optax.masked(optax.scale(factor),
                                  _prefix_mask((prefix,))))
    freeze = tuple(s.strip() for s in cfg.freeze.split(",") if s.strip())
    if freeze:
        chain.append(optax.masked(optax.set_to_zero(), _prefix_mask(freeze)))
    tx = optax.chain(*chain)
    if cfg.accumulate_steps > 1:
        tx = optax.MultiSteps(tx, cfg.accumulate_steps)  # SURVEY §2.3 grad accumulation
    return tx


def _host_ccc(pred: np.ndarray, target: np.ndarray, valid: np.ndarray,
              eps: float = 1e-8) -> np.ndarray:
    """Per-dim masked CCC in numpy fp64 (ops/ccc.py formula, host-side).

    Used by the chunked long-video eval path, whose stitched predictions
    live on the host; fp64 two-pass stats make it at least as accurate as
    the fused fp32 on-device version it mirrors.
    """
    m = valid.astype(np.float64)[:, None]
    p = pred.astype(np.float64)
    t = target.astype(np.float64)
    cnt = np.maximum(m.sum(axis=0), 1e-12)
    mu_p = (p * m).sum(axis=0) / cnt
    mu_t = (t * m).sum(axis=0) / cnt
    dp = (p - mu_p) * m
    dt = (t - mu_t) * m
    cov = (dp * dt).sum(axis=0) / cnt
    var_p = (dp * dp).sum(axis=0) / cnt
    var_t = (dt * dt).sum(axis=0) / cnt
    return 2.0 * cov / (var_p + var_t + (mu_p - mu_t) ** 2 + eps)


@dataclass
class Trainer:
    cfg: ExperimentConfig

    def __post_init__(self):
        d = self.cfg.train.ema_decay
        if not 0.0 <= d < 1.0:
            # d == 1.0 would freeze the shadow at random init and every
            # eval would silently score untrained weights
            raise ValueError(f"train.ema_decay must be in [0, 1), got {d}")
        if self.cfg.train.eval_ccc_convention not in ("per_video", "pooled"):
            raise ValueError(
                "train.eval_ccc_convention must be 'per_video' or 'pooled', "
                f"got {self.cfg.train.eval_ccc_convention!r}")
        if self.cfg.model.per_frame \
                and self.cfg.model.frames_per_window \
                != self.cfg.window.window_frames:
            # coupled fields (found by fuzzing): in audio-only per-frame
            # mode the model takes L from model.frames_per_window while the
            # data pipeline cuts window.window_frames-sized windows — a
            # mismatch surfaces as a cryptic reshape error deep in the
            # label alignment (or silent misalignment). Fail at
            # construction with the fix spelled out.
            raise ValueError(
                f"window.window_frames={self.cfg.window.window_frames} but "
                f"model.frames_per_window={self.cfg.model.frames_per_window}"
                " — these must match (set both when changing the window "
                "length; model.audio.mel_frames_per_window should track "
                "them too: ~1 mel frame per video frame at the default "
                "hop)")
        self.model = M3F(self.cfg.model)
        self.tx = make_optimizer(self.cfg.train.optim, self.cfg.train.num_steps)
        self.mesh = create_mesh(self.cfg.train.mesh.num_data,
                                self.cfg.train.mesh.num_model)
        self._video_eval_fn = None    # cached jit of make_video_eval_fn
        self._video_eval_chunk_fns = {}  # local_nf -> chunk jit (long videos)
        self._last_state = None       # latest TrainState (preemption save)

    # -- state ------------------------------------------------------------

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        params, bn_state = self.model.init(
            jax.random.PRNGKey(self.cfg.train.seed if seed is None else seed))
        if self.cfg.model.init_from:
            # pretrained backbone init (reference loads state_dicts at model
            # __init__, SURVEY §3.5); a resume checkpoint still wins later in
            # fit() via Checkpointer.maybe_restore
            from m3f.pytorch_tpu.train.checkpoint import load_pretrained_init
            params, bn_state = load_pretrained_init(
                params, bn_state, self.cfg.model.init_from)
        opt_state = self.tx.init(params)
        # EMA shadow starts equal to the init params (no debiasing needed);
        # jnp.copy: distinct buffers so step-donation never aliases leaves
        ema = (jax.tree_util.tree_map(jnp.copy, params)
               if self.cfg.train.ema_decay > 0 else None)
        lr_mult = (jnp.ones((), jnp.float32)
                   if self.cfg.train.optim.schedule == "plateau" else None)
        state = TrainState(params, bn_state, opt_state,
                           jnp.zeros((), jnp.int32), ema, lr_mult)
        # replicated everywhere with num_model == 1; TP layout (GRU
        # column-parallel, head row-parallel) when the mesh has a model axis
        return jax.device_put(state, state_shardings(self.mesh, state))

    def commit_state(self, state: TrainState,
                     eval_only: bool = False) -> TrainState:
        """Place a (possibly host-numpy) state on the mesh with the
        canonical shardings.

        Checkpoint loads (``load_model_checkpoint``/``load_pytree``) return
        HOST numpy leaves; a jitted dispatch converts + uploads those on
        EVERY call — for a checkpoint-loaded serving/eval process that is
        the whole parameter set re-crossing H2D per video/request (on a
        remote-tunnel host: seconds). One ``device_put`` here makes the
        state device-resident once, like ``init_state`` already does.

        ``eval_only``: the state will only ever be read by eval/serving
        dispatches (params + bn_state). The EMA policy is folded in first
        (``eval_state``), then the opt_state (Adam moments ≈ 2× params) and
        the now-redundant ema alias are dropped so they never cross H2D or
        occupy HBM — a k-checkpoint ensemble would otherwise pin k sets of
        moments plus k duplicate parameter copies (round-4 review).
        """
        if eval_only:
            state = self.eval_state(state)._replace(opt_state=None, ema=None)
        return jax.device_put(state, state_shardings(self.mesh, state))

    # -- steps ------------------------------------------------------------

    def _loss_fn(self, params, bn_state, batch, train: bool, rng=None):
        preds, new_bn = self.model.apply(
            params, bn_state,
            video=batch.get("video"), wav=batch.get("wav"),
            mel=batch.get("mel"), hop=batch.get("hop"), train=train, rng=rng)
        loss_fn = make_loss(self.cfg.train.loss, self.cfg.train.mse_weight,
                            self.cfg.train.ccc_stats)
        loss = loss_fn(preds, batch["labels"], batch["mask"])
        return loss, (new_bn, preds)

    def make_train_step(self) -> Callable:
        rep = replicated(self.mesh)
        bsh = batch_sharding(self.mesh)
        tp = self.mesh.shape.get("model", 1) > 1

        dcfg = self.cfg.data

        def step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
            if dcfg.augment and "video" in batch:
                # on-device augmentation, deterministic in (seed, step)
                from m3f.pytorch_tpu.ops.augment import augment_clips
                key = jax.random.fold_in(
                    jax.random.PRNGKey(self.cfg.train.seed), state.step)
                batch = dict(batch)
                batch["video"] = augment_clips(
                    key, batch["video"],
                    flip_prob=dcfg.aug_flip_prob,
                    brightness=dcfg.aug_brightness,
                    contrast=dcfg.aug_contrast,
                    compute_dtype=jnp.dtype(self.cfg.model.compute_dtype))
            # dropout key: deterministic in (seed, step); distinct stream
            # from the augmentation key above (different fold_in base)
            rng = (jax.random.fold_in(
                jax.random.PRNGKey(self.cfg.train.seed ^ 0x5eed), state.step)
                if self.cfg.model.dropout > 0.0 else None)
            (loss, (new_bn, preds)), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True)(state.params, state.bn_state,
                                             batch, True, rng)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            if state.lr_mult is not None:
                # plateau schedule: post-scale the final update — exactly a
                # learning-rate multiplier for adam/adamw/sgd (lr-linear
                # updates), and still correct under MultiSteps (off-boundary
                # updates are zeros; boundary updates scale once)
                updates = jax.tree_util.tree_map(
                    lambda u: u * state.lr_mult.astype(u.dtype), updates)
            new_params = optax.apply_updates(state.params, updates)
            gnorm = optax.global_norm(grads)
            metrics = {
                "loss": loss,
                "grad_norm": gnorm,
                # reported as CCC regardless of the training loss choice;
                # honors ccc_stats so one_pass keeps the pathological
                # two-pass reduce chain fully out of the program
                "batch_ccc": 1.0 - ccc_loss(
                    preds, batch["labels"], batch["mask"],
                    one_pass=self.cfg.train.ccc_stats == "one_pass"),
            }
            new_ema = state.ema
            if state.ema is not None:
                d = jnp.float32(self.cfg.train.ema_decay)
                if self.cfg.train.ema_ramp:
                    # d_t = min(d, (1+t)/(10+t)): honest running average
                    # from step 1, converging to the configured decay —
                    # a cold 0.999 shadow otherwise stays ~frozen at init
                    # for the first ~1k steps. t counts APPLIED optimizer
                    # updates (micro-steps under grad accumulation would
                    # scale the ramp by k, partially re-freezing the shadow)
                    k = max(self.cfg.train.optim.accumulate_steps, 1)
                    t = (state.step // k).astype(jnp.float32)
                    d = jnp.minimum(d, (1.0 + t) / (10.0 + t))
                if self.cfg.train.optim.accumulate_steps > 1:
                    # update the shadow only when MultiSteps actually applied
                    # an optimizer update (mini_step wrapped to 0) — decaying
                    # every micro-step would compound to d^k per real update
                    # and silently shrink the averaging horizon k-fold
                    # MultiSteps wraps the whole chain: opt_state IS a
                    # MultiStepsState; mini_step wraps to 0 on application
                    applied = new_opt.mini_step == 0
                    new_ema = jax.tree_util.tree_map(
                        lambda e, p: jnp.where(
                            applied, e * d + p.astype(e.dtype) * (1.0 - d), e),
                        state.ema, new_params)
                else:
                    new_ema = jax.tree_util.tree_map(
                        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                        state.ema, new_params)
            new_state = TrainState(new_params, new_bn, new_opt,
                                   state.step + 1, new_ema, state.lr_mult)
            if tp:
                # pin the TP layout on the outputs so the state's sharding is
                # stationary across steps (donation requires in == out)
                new_state = jax.lax.with_sharding_constraint(
                    new_state, state_shardings(self.mesh, new_state))
            return new_state, metrics

        if tp:
            # state arrives with the TP layout from init_state/restore; jit
            # inherits argument shardings, GSPMD inserts the collectives
            return jax.jit(step, donate_argnums=0)
        return jax.jit(step, donate_argnums=0,
                       in_shardings=(rep, bsh),
                       out_shardings=(rep, rep))

    def eval_state(self, state: TrainState) -> TrainState:
        """State whose params are the EMA shadow when EMA is enabled.

        Idempotent (params == ema afterwards), applied automatically by
        every whole-video eval dispatch — the EMA shadow exists FOR eval.
        """
        if state.ema is not None:
            return state._replace(params=state.ema)
        return state

    def make_eval_forward(self) -> Callable:
        """Jitted eval forward: window-sequence batch → per-window preds."""
        def fwd(params, bn_state, batch):
            preds, _ = self.model.apply(
                params, bn_state,
                video=batch.get("video"), wav=batch.get("wav"),
                mel=batch.get("mel"), hop=batch.get("hop"), train=False)
            return preds
        return jax.jit(fwd)

    def _win_bucket(self) -> int:
        """Window-count granularity of eval dispatches: whole W-window
        sequences, in groups the data axis divides evenly."""
        n_data = self.mesh.shape.get("data", 1)
        return self.cfg.window.windows_per_clip \
            * (8 * n_data // math.gcd(8, n_data))

    def eval_buckets(self, n_frames: int) -> Optional[Tuple[int, int]]:
        """(n_frames_pad, n_win_pad) shape signature of the fused
        whole-video eval dispatch for an ``n_frames`` video, or None when
        the video routes through the length-independent CHUNKED eval.

        Shared by ``_dispatch_eval`` and ``Predictor.warmup`` so warmup
        compiles exactly the (frame, window) bucket combinations real
        videos hit — frame and window buckets do NOT move in lockstep."""
        wcfg = self.cfg.window
        L = wcfg.window_frames
        n_win = len(window_starts(n_frames, L, wcfg.eval_stride))
        if wcfg.eval_max_windows and n_win > wcfg.eval_max_windows:
            return None
        win_bucket = self._win_bucket()
        n_win_pad = -(-max(n_win, 1) // win_bucket) * win_bucket
        n_frames_pad = -(-n_frames // 256) * 256 + L
        return n_frames_pad, n_win_pad

    def _seq_sharding(self):
        n_data = self.mesh.shape.get("data", 1)
        return (NamedSharding(self.mesh, P("data")) if n_data > 1 else None)

    def _windowed_forward(self, params, bn_state, starts, sample_starts,
                          frames, wav, hop=None):
        """Traced helper shared by the fused and chunked eval jits: gather
        each window's frames/samples ON DEVICE from start indices, group
        into W-window sequences (sharded over the data axis when the mesh
        has one), and run the model forward.

        ``hop``: traced int32 scalar — the video's per-rate mel hop when it
        differs from the configured nominal (then the wav gather is
        max-hop-sized and the frontend frames each window at the video's
        own time base; ONE compiled program covers every off-rate video
        because only index VALUES change, not shapes)."""
        mcfg = self.cfg.model
        L = self.cfg.window.window_frames
        W = self.cfg.window.windows_per_clip
        spw = (samples_per_window_max(mcfg.mel,
                                      mcfg.audio.mel_frames_per_window)
               if hop is not None else
               samples_per_window(mcfg.mel, mcfg.audio.mel_frames_per_window))
        seq_sharding = self._seq_sharding()
        n_win = starts.shape[0]
        feed = {}
        if frames is not None:
            idx = starts[:, None] + jnp.arange(L)[None, :]     # [Nw, L]
            win = frames[idx]                                  # [Nw, L, S, S, 3]
            feed["video"] = win.reshape((n_win // W, W) + win.shape[1:])
        if wav is not None:
            sidx = sample_starts[:, None] + jnp.arange(spw)[None, :]
            sw = wav[sidx]                                     # [Nw, spw]
            feed["wav"] = sw.reshape(n_win // W, W, spw)
        if seq_sharding is not None:
            # C-P2: split the sequence batch across the mesh so the conv
            # backbones run data-parallel; stitch happens replicated
            feed = {k: jax.lax.with_sharding_constraint(v, seq_sharding)
                    for k, v in feed.items()}
        preds, _ = self.model.apply(
            params, bn_state, video=feed.get("video"),
            wav=feed.get("wav"), hop=hop, train=False)
        return preds

    def make_video_eval_fn(self) -> Callable:
        """Whole-video eval in ONE jit call with ON-DEVICE windowing.

        The host sends each frame/sample exactly once (frames [N, S, S, 3]
        uint8 + waveform [T]); the overlapping 16-frame windows are gathered
        on device from a ``starts`` index array inside the jit region — no
        host window slicing, no duplicate H2D bytes for overlapped strides
        (the BASELINE north-star "face-crop/resize/normalize ... become fused
        preprocessing kernels feeding the backbone").

        Shapes are bucketed by the caller so a handful of compiles cover a
        whole dataset of variable-length videos.
        """
        mcfg = self.cfg.model
        L = self.cfg.window.window_frames

        def fn(params, bn_state, starts, sample_starts, win_valid,
               labels, frame_valid, n_real, frames=None, wav=None, hop=None):
            n_win = starts.shape[0]
            preds = self._windowed_forward(params, bn_state, starts,
                                           sample_starts, frames, wav, hop)
            # stitch + clip + CCC fused into the SAME call — one device
            # round-trip per video (padded windows masked out of coverage)
            nf = labels.shape[0]
            if mcfg.per_frame:
                # [Ng, W, L, 2] per-FRAME preds → scatter-add onto the timeline
                win_preds = preds.reshape(n_win, L, -1)
                stitched = stitch_framewise(win_preds, starts, nf,
                                            win_valid=win_valid)
            else:
                win_preds = preds.reshape(n_win, -1)
                m = coverage_matrix(starts, nf, L) * win_valid[None, :].astype(jnp.float32)
                num = jnp.matmul(m, win_preds.astype(jnp.float32),
                                 precision=jax.lax.Precision.HIGHEST)
                den = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
                stitched = num / den
            if self.cfg.window.eval_smooth > 1:
                # reference postprocess order (submission.py): smooth first,
                # then clip — so val CCC scores what the server would see.
                # The timeline is padded to a shape bucket; edge-extend the
                # last REAL frame over the pad (n_real is a traced scalar —
                # no recompile per video) so the right-edge window sees the
                # host smoother's edge padding, not the pad region's zeros.
                fidx = jnp.arange(nf)
                last = stitched[jnp.maximum(n_real - 1, 0)]
                ext = jnp.where((fidx < n_real)[:, None], stitched, last[None, :])
                stitched = smooth_moving_average(
                    ext, self.cfg.window.eval_smooth)
            stitched = jnp.clip(stitched, -1.0, 1.0)               # [NF, 2]
            per_dim = ccc(stitched, labels, mask=frame_valid[:, None], axis=(0,))
            return stitched, per_dim

        return jax.jit(fn)

    def make_video_eval_chunk_fn(self, local_nf: int) -> Callable:
        """Bounded-window partial eval for CHUNKED long-video evaluation.

        Same on-device windowing + forward as ``make_video_eval_fn``, but
        over a bounded window batch with a fixed local frame span, returning
        the UN-normalized stitch sums ``(Σ preds, coverage)`` so the host can
        accumulate partials across chunk boundaries (summation is associative
        where the per-chunk average is not). Keeps device memory constant for
        arbitrarily long videos — a real ABAW video runs many minutes at
        30 fps, far past what one fused dispatch can hold.
        """
        mcfg = self.cfg.model
        L = self.cfg.window.window_frames

        def fn(params, bn_state, starts, sample_starts, win_valid,
               frames=None, wav=None, hop=None):
            n_win = starts.shape[0]
            preds = self._windowed_forward(params, bn_state, starts,
                                           sample_starts, frames, wav, hop)
            if mcfg.per_frame:
                win_preds = preds.reshape(n_win, L, -1)
                return stitch_framewise_sums(win_preds, starts, local_nf,
                                             win_valid=win_valid)
            win_preds = preds.reshape(n_win, -1)
            m = coverage_matrix(starts, local_nf, L) \
                * win_valid[None, :].astype(jnp.float32)
            num = jnp.matmul(m, win_preds.astype(jnp.float32),
                             precision=jax.lax.Precision.HIGHEST)
            return num, jnp.sum(m, axis=1)

        return jax.jit(fn)

    # -- full-video sliding-window eval (config 4, [B:10]) ----------------

    def evaluate_video(self, state: TrainState,
                       video: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """Sliding-window eval of ONE loaded video → stitched preds + CCC.

        Uses the cached whole-video jit (single device) or the mesh-sharded
        forward (multi device); both are built lazily and reused.
        """
        return self._collect_eval(self._dispatch_eval(state, video))

    def _dispatch_eval(self, state: TrainState,
                       video: Dict[str, np.ndarray], prep=None):
        """Enqueue the whole-video eval WITHOUT syncing.

        Returns (n_frames, device futures). jax dispatch is async, so a
        caller can keep several videos in flight — the next video's H2D
        transfer (the bottleneck on a remote-tunnel host) overlaps the
        current video's compute. ``_collect_eval`` fetches the results.

        ``prep``: a ``_prepare_eval_inputs`` result to reuse — ensemble
        callers dispatch the SAME video against k states, and sharing the
        prepared device buffers keeps each frame/sample to one H2D crossing
        per video instead of one per model (round-4 review).
        """
        state = self.eval_state(state)
        wcfg = self.cfg.window
        n = len(video["labels"])
        starts = window_starts(n, wcfg.window_frames,
                               wcfg.eval_stride)                  # [Nw]
        if wcfg.eval_max_windows and len(starts) > wcfg.eval_max_windows:
            # long video: bounded window batches, host-side accumulation
            return self._dispatch_eval_chunked(state, video, starts)

        # ONE jit call does windowing (on-device gather), forward (sequence
        # batch sharded over the mesh when it has >1 data device — C-P2),
        # overlap-average stitch, clip, and per-video CCC.  Each frame/sample
        # crosses the host↔device link exactly once; the host gets back only
        # [NF, 2] preds + 2 scalars.  Shapes are bucketed for compile reuse
        # across variable-length videos.
        eval_fn = self._video_eval_fn or self.make_video_eval_fn()
        self._video_eval_fn = eval_fn
        if prep is None:
            prep = self._prepare_eval_inputs(video, starts)
        n, args, kw, labels, valid = prep
        stitched_d, per_dim_d = eval_fn(state.params, state.bn_state,
                                        *args, **kw)
        # labels/valid ride along (host arrays, tiny) so _collect_eval can
        # also emit pooled-CCC sufficient statistics
        return n, stitched_d, per_dim_d, labels, valid

    def _prepare_eval_inputs(self, video: Dict[str, np.ndarray],
                             starts: np.ndarray):
        """Host windowing/padding + ONE async device upload of a (fused-path)
        video's eval inputs → ``(n, args, kw, labels, valid)``.

        ``args``/``kw`` leaves are jnp arrays: the H2D transfer is dispatched
        here, once, and every ``_dispatch_eval`` reusing this prep rides the
        same buffers (device-side resharding under a >1-device mesh is
        handled by the jit's in_shardings as before)."""
        wcfg, mcfg = self.cfg.window, self.cfg.model
        n = len(video["labels"])
        n_win = len(starts)
        sr = mcfg.mel.sample_rate
        n_frames_pad, n_win_pad = self.eval_buckets(n)
        starts_padded = np.concatenate(
            [starts, np.repeat(starts[-1:], n_win_pad - n_win)])
        win_valid = np.arange(n_win_pad) < n_win
        # audio offsets AND the per-window mel hop honor the video's own
        # frame rate (loader-derived or caller-supplied; VERDICT r3 #1 fixed
        # start offsets, r4 missing #1 fixes the intra-window time base).
        # The nominal rate keeps the historical fixed-hop program so
        # warmup-compiled buckets stay hot; off-rate videos route through
        # ONE shared dynamic-hop program (hop is a traced scalar, the wav
        # gather max-hop-sized) with wav lengths bucketed to whole seconds.
        fps = float(video.get("fps") or self.cfg.data.fps)
        hop_e, dyn, _, spw = mcfg.hop_plan(fps, self.cfg.data.fps)
        kw = {}
        if mcfg.use_video:
            frames = video["frames"]
            kw["frames"] = jnp.asarray(np.pad(
                frames, [(0, n_frames_pad - len(frames))] + [(0, 0)] * 3))
        if mcfg.use_audio:
            if dyn:
                kw["hop"] = jnp.asarray(hop_e, jnp.int32)
            need = int(round(n_frames_pad / fps * sr)) + spw
            if fps != self.cfg.data.fps:
                need = -(-need // sr) * sr + spw
            wav = video["waveform"]
            # pad AND truncate to exactly `need`: an audio track longer than
            # the video (common in real containers) would otherwise give
            # every video a distinct wav shape — one fresh XLA compile each,
            # defeating the shape bucketing
            kw["wav"] = jnp.asarray(
                np.pad(wav, (0, max(0, need - len(wav))))[:need]
                .astype(np.float32))
        sample_starts = np.round(
            starts_padded / fps * sr).astype(np.int32)
        labels_pad = np.full((n_frames_pad, 2), -5.0, np.float32)
        labels_pad[:n] = video["labels"]
        valid_pad = np.zeros(n_frames_pad, bool)
        valid_pad[:n] = video["valid"]
        args = (jnp.asarray(starts_padded, jnp.int32),
                jnp.asarray(sample_starts),
                jnp.asarray(win_valid),
                jnp.asarray(labels_pad), jnp.asarray(valid_pad),
                jnp.asarray(n, jnp.int32))
        return n, args, kw, labels_pad[:n], valid_pad[:n]

    def _dispatch_eval_chunked(self, state: TrainState,
                               video: Dict[str, np.ndarray],
                               starts: np.ndarray):
        """Enqueue a LONG video as bounded window chunks (async, unsynced).

        Chunk geometry is constant across chunks and videos (window count M
        rounded to the mesh sequence bucket, frame span padded to a bucket),
        so ONE compile of the chunk fn covers everything. The wav slice is
        re-based per chunk with the same rounding as the fused path, so each
        window reads byte-identical samples.
        """
        wcfg, mcfg = self.cfg.window, self.cfg.model
        L, W = wcfg.window_frames, wcfg.windows_per_clip
        sr = mcfg.mel.sample_rate
        # per-video rate AND hop, same policy as _dispatch_eval: the nominal
        # rate keeps the historical fixed-hop program; off-rate videos share
        # one dynamic-hop program (traced hop scalar, max-hop wav gather)
        # with wav-slice lengths bucketed up to whole seconds (chunk
        # geometry itself is rate-independent)
        fps = float(video.get("fps") or self.cfg.data.fps)
        hop_e, dyn, _, spw = mcfg.hop_plan(fps, self.cfg.data.fps)
        n = len(video["labels"])
        M = -(-wcfg.eval_max_windows // self._win_bucket()) \
            * self._win_bucket()
        # any M consecutive starts span at most (M-1)·stride + L frames
        span = (M - 1) * wcfg.eval_stride + L
        local_nf = -(-span // 256) * 256 + L
        need_wav = int(round(local_nf / fps * sr)) + spw
        if fps != self.cfg.data.fps:
            need_wav = -(-need_wav // sr) * sr + spw
        fn = self._video_eval_chunk_fns.get(local_nf)
        if fn is None:
            fn = self.make_video_eval_chunk_fn(local_nf)
            self._video_eval_chunk_fns[local_nf] = fn
        frames = video.get("frames") if mcfg.use_video else None
        wav = video.get("waveform") if mcfg.use_audio else None
        parts = []
        for i0 in range(0, len(starts), M):
            sub = starts[i0:i0 + M]
            f0 = int(sub[0])
            sub_p = np.concatenate([sub, np.repeat(sub[-1:], M - len(sub))])
            wv = np.arange(M) < len(sub)
            kw = {}
            if frames is not None:
                seg = frames[f0:f0 + local_nf]
                kw["frames"] = np.pad(
                    seg, [(0, local_nf - len(seg))] + [(0, 0)] * 3)
            if wav is not None:
                w0 = int(np.round(f0 / fps * sr))
                seg = wav[w0:w0 + need_wav]
                kw["wav"] = np.pad(seg, (0, need_wav - len(seg))) \
                    .astype(np.float32)
                if dyn:
                    kw["hop"] = jnp.asarray(hop_e, jnp.int32)
            else:
                w0 = 0
            sstarts = (np.round(sub_p / fps * sr) - w0).astype(np.int32)
            num_d, den_d = fn(state.params, state.bn_state,
                              jnp.asarray(sub_p - f0, jnp.int32),
                              jnp.asarray(sstarts), jnp.asarray(wv), **kw)
            parts.append((f0, num_d, den_d))
            # backpressure: fetch all but the 2 newest chunks' (small)
            # outputs NOW, which syncs their dispatches — otherwise every
            # chunk's ~100+ MB input buffer would sit in HBM at once,
            # unbounding exactly the memory this path exists to bound
            if len(parts) > 2:
                g0, gn, gd = parts[-3]
                parts[-3] = (g0, np.asarray(gn), np.asarray(gd))
        return ("chunked", n, local_nf, parts,
                np.asarray(video["labels"], np.float32),
                np.asarray(video["valid"], bool))

    def _collect_eval(self, pending) -> Dict[str, Any]:
        if isinstance(pending[0], str) and pending[0] == "chunked":
            _, n, local_nf, parts, labels, valid = pending
            num = np.zeros((n + local_nf, 2), np.float32)
            den = np.zeros((n + local_nf,), np.float32)
            for f0, num_d, den_d in parts:
                num[f0:f0 + local_nf] += np.asarray(num_d)
                den[f0:f0 + local_nf] += np.asarray(den_d)
            stitched = num[:n] / np.maximum(den[:n, None], 1.0)
            # host-side postprocess, same order as the fused path
            if self.cfg.window.eval_smooth > 1:
                from m3f.pytorch_tpu.infer.submission import smooth_predictions
                stitched = smooth_predictions(stitched,
                                              self.cfg.window.eval_smooth)
            stitched = np.clip(stitched, -1.0, 1.0)
            per_dim = _host_ccc(stitched, labels, valid)
            return {"pred": stitched,
                    "ccc_v": float(per_dim[0]), "ccc_a": float(per_dim[1]),
                    "stats": ccc_sufficient_stats(stitched, labels, valid)}
        n, stitched_d, per_dim_d, labels, valid = pending
        per_dim = np.asarray(per_dim_d)
        pred = np.asarray(stitched_d)[:n]
        return {"pred": pred,
                "ccc_v": float(per_dim[0]), "ccc_a": float(per_dim[1]),
                "stats": ccc_sufficient_stats(pred, labels, valid)}

    def evaluate(self, state: TrainState, dataset, max_videos: int = 0,
                 pipeline: int = 2, per_video_fn=None) -> Dict[str, float]:
        """Dataset-split CCC, reported in BOTH evaluation conventions.

        ``ccc_v/ccc_a/ccc_mean``: mean of per-video CCCs (the convention
        every earlier round reported). ``pooled_ccc_v/a/mean``: ONE CCC over
        the concatenation of all videos' valid frames (ABAW-style pooled
        statistics — accumulated host-side in fp64 from per-video
        sufficient statistics). SURVEY §3.3's reconstruction of the
        reference is ambiguous between the two and they differ materially
        when video lengths/variances differ (per-video punishes short
        low-variance videos), so both are always computed;
        ``train.eval_ccc_convention`` picks which drives best-checkpoint
        selection and early stopping.

        ``per_video_fn(video_id, result)`` is invoked per video as results
        drain (e.g. the CLI's --per-video JSON rows).

        Keeps ``pipeline`` videos in flight: while the device evaluates
        video i, the host decodes video i+1 and its H2D transfer streams —
        on the remote-tunnel host (H2D ≈ 41 MB/s) this roughly doubles eval
        throughput vs the serial loop.
        """
        ids = dataset.video_ids()
        if max_videos:
            ids = ids[:max_videos]
        if not ids:
            # an empty split would yield NaN means that silently poison
            # best-checkpoint tracking and fake an early stop — fail loudly
            raise ValueError(
                "evaluate(): the validation split has no videos — check "
                "data.root / annotation layout (empty Validation_Set?)")
        videos = ((vid, dataset.load_video(vid)) for vid in ids)
        return self._aggregate_eval(
            self.evaluate_stream(state, videos, pipeline=pipeline),
            per_video_fn)

    def _aggregate_eval(self, results, per_video_fn=None) -> Dict[str, float]:
        """Drain (video_id, per-video result) pairs into the split-level
        metric dict — THE single place both conventions (per-video mean and
        pooled sufficient statistics) and ``ccc_select`` are assembled;
        evaluate() and evaluate_ensemble() share it so they can never
        silently diverge."""
        vs, as_ = [], []
        pooled = np.zeros((2, 6), np.float64)
        for vid, r in results:
            if per_video_fn is not None:
                per_video_fn(vid, r)
            vs.append(r["ccc_v"])
            as_.append(r["ccc_a"])
            pooled += r["stats"]
        pc = ccc_from_stats(pooled)
        out = {"ccc_v": float(np.mean(vs)), "ccc_a": float(np.mean(as_)),
               "ccc_mean": float((np.mean(vs) + np.mean(as_)) / 2),
               "pooled_ccc_v": float(pc[0]), "pooled_ccc_a": float(pc[1]),
               "pooled_ccc_mean": float(pc.mean())}
        out["ccc_select"] = (out["pooled_ccc_mean"]
                             if self.cfg.train.eval_ccc_convention == "pooled"
                             else out["ccc_mean"])
        return out

    def evaluate_stream(self, state: TrainState, videos,
                        pipeline: int = 2):
        """Pipelined whole-video eval over (video_id, video_dict) pairs.

        THE shared in-flight loop (evaluate, the predict CLI, and the
        Predictor serving API all route through it): while the device works
        on video i, video i+1's decode + H2D streams. Yields
        (video_id, _collect_eval result) in input order.
        """
        inflight: List[Any] = []
        for vid, video in videos:
            inflight.append((vid, self._dispatch_eval(state, video)))
            if len(inflight) >= max(pipeline, 1):
                v, fut = inflight.pop(0)
                yield v, self._collect_eval(fut)
        for v, fut in inflight:
            yield v, self._collect_eval(fut)

    def evaluate_ensemble(self, states: List[TrainState], dataset,
                          max_videos: int = 0,
                          per_video_fn=None) -> Dict[str, float]:
        """Prediction-level ensemble over several checkpoints' states.

        The reference-era challenge workflow averages the PREDICTIONS of
        multiple trained checkpoints (distinct from weight-space SWA —
        scripts/average_checkpoints.py — which requires loss-surface
        proximity). Each video is decoded/uploaded once per state; all k
        states' fused evals are dispatched asynchronously before the first
        collect, so transfers overlap compute. The per-frame mean of the k
        stitched, postprocessed prediction tracks is scored with the same
        host fp64 CCC both conventions use. Return keys match
        :meth:`evaluate` (+ ``n_models``).
        """
        if not states:
            raise ValueError("evaluate_ensemble() needs at least one state")
        ids = dataset.video_ids()
        if max_videos:
            ids = ids[:max_videos]
        if not ids:
            raise ValueError(
                "evaluate_ensemble(): the split has no videos — check "
                "data.root / annotation layout")
        videos = ((vid, dataset.load_video(vid)) for vid in ids)
        out = self._aggregate_eval(self._ensemble_stream(states, videos),
                                   per_video_fn)
        out["n_models"] = len(states)
        return out

    def _ensemble_stream(self, states: List[TrainState], videos,
                         pipeline: int = 2):
        """evaluate_stream's pipelined loop, k states per video: while the
        device chews video i's k forwards, video i+1 decodes and its ONE
        shared upload streams. Yields (video_id, result) with the mean
        track's CCC + pooled stats, same row shape as _collect_eval."""
        def collect(item):
            vid, labels, valid, pending = item
            preds = [self._collect_eval(p)["pred"] for p in pending]
            pred = np.mean(preds, axis=0, dtype=np.float64) \
                .astype(np.float32)
            per_dim = _host_ccc(pred, labels, valid)
            return vid, {"pred": pred,
                         "ccc_v": float(per_dim[0]),
                         "ccc_a": float(per_dim[1]),
                         "stats": ccc_sufficient_stats(pred, labels, valid)}
        inflight: List[Any] = []
        for vid, video in videos:
            inflight.append((vid, np.asarray(video["labels"], np.float32),
                             np.asarray(video["valid"], bool),
                             self._dispatch_eval_multi(states, video)))
            if len(inflight) >= max(pipeline, 1):
                yield collect(inflight.pop(0))
        for item in inflight:
            yield collect(item)

    def _dispatch_eval_multi(self, states: List[TrainState], video):
        """One video's eval against k states, enqueued unsynced.

        Non-chunked videos share ONE prepared device upload of the padded
        inputs across the k dispatches (H2D is the bottleneck on a
        remote-tunnel host); long videos take the chunked path per state,
        which bounds device memory the same way single-model eval does."""
        wcfg = self.cfg.window
        starts = window_starts(len(video["labels"]), wcfg.window_frames,
                               wcfg.eval_stride)
        if wcfg.eval_max_windows and len(starts) > wcfg.eval_max_windows:
            return [self._dispatch_eval(st, video) for st in states]
        prep = self._prepare_eval_inputs(video, starts)
        return [self._dispatch_eval(st, video, prep=prep) for st in states]

    def predict_ensemble(self, states: List[TrainState],
                         video) -> np.ndarray:
        """[N, 2] mean stitched prediction of ``states`` on one video.

        Dispatch-all-then-collect: the k evals are enqueued unsynced so H2D
        overlaps compute across models (same trick as evaluate_stream's
        video pipelining, across STATES instead of videos)."""
        pending = self._dispatch_eval_multi(states, video)
        preds = [self._collect_eval(p)["pred"] for p in pending]
        return np.mean(preds, axis=0, dtype=np.float64).astype(np.float32)

    # -- fit ---------------------------------------------------------------

    def fit(self, train_stream,
            val_dataset=None, num_steps: Optional[int] = None,
            log: Callable[[str], None] = print,
            checkpointer=None, metric_writer=None) -> Tuple[TrainState, Dict]:
        """``train_stream`` is a batch iterator, or a CALLABLE
        ``factory(skip_batches) -> iterator`` — the factory form is invoked
        AFTER checkpoint restore with the restored step count, so a resumed
        run consumes exactly the batches the uninterrupted run would have
        (exact-resume contract; see data/windowing.py example_stream)."""
        tcfg = self.cfg.train
        num_steps = num_steps or tcfg.num_steps
        state = self.init_state()
        if checkpointer is not None:
            state = checkpointer.maybe_restore(state, self)
        train_step = self.make_train_step()
        history = {"loss": []}
        best = BestTracker(tcfg.early_stop_patience, tcfg.min_delta)
        # plateau schedule: its own patience window, independent of early
        # stopping. torch ReduceLROnPlateau decays when
        # num_bad_epochs > patience — i.e. it IGNORES `patience` bad evals
        # and decays on the next one (patience=2 → decay at the 3rd
        # consecutive bad eval), then restarts the window; the best-so-far
        # reference is kept across decays. BestTracker fires at
        # bad_evals >= its patience, so torch's knob maps to patience+1
        # (round-4 review: the raw knob decayed one eval early vs the torch
        # run MIGRATION.md claims to reproduce). The counter restarts on
        # resume — like BestTracker — but the multiplier itself lives in
        # TrainState, so the effective LR resumes exactly.
        ocfg = tcfg.optim
        plateau = (BestTracker(ocfg.plateau_patience + 1, tcfg.min_delta)
                   if ocfg.schedule == "plateau" else None)
        t0 = time.time()
        seen = 0
        use_a, use_v = self.cfg.model.use_audio, self.cfg.model.use_video
        start_step = int(state.step)
        # a stream fit() created from the factory form is fit()'s to clean
        # up: an endless stream's Prefetcher would otherwise stay blocked on
        # its full queue for process life, pinning `depth` ready batches
        # (caller-owned iterators are never closed — the caller may reuse them)
        owns_stream = (callable(train_stream)
                       and not hasattr(train_stream, "__next__"))
        if owns_stream:
            train_stream = train_stream(start_step)
        profiling = False
        for i in range(start_step, num_steps):
            if tcfg.profile_dir and i == start_step + 2 and not profiling:
                # skip the compile step, then trace a window of real steps
                jax.profiler.start_trace(tcfg.profile_dir)
                profiling = True
            host_batch = next(train_stream)
            feed = {"labels": host_batch["labels"], "mask": host_batch["mask"]}
            if use_v:
                feed["video"] = host_batch["video"]
            if use_a:
                feed["wav"] = host_batch["wav"]
                if "hop" in host_batch:  # hop-aware stream: per-example [B]
                    feed["hop"] = host_batch["hop"]
            batch = shard_batch(self.mesh, feed)
            state, metrics = train_step(state, batch)
            self._last_state = state  # read by the SIGTERM preemption handler
            seen += host_batch["labels"].shape[0] * host_batch["labels"].shape[1]
            if profiling and i >= start_step + 2 + 10:
                jax.profiler.stop_trace()
                profiling = False
            # cadence fields <= 0 mean "off" (eval/log/checkpoint_every=0 is
            # the natural CLI way to disable one; it must not ZeroDivision)
            if (tcfg.log_every > 0 and (i + 1) % tcfg.log_every == 0) \
                    or i + 1 == num_steps:
                loss = float(metrics["loss"])  # sync point
                dt = time.time() - t0
                history["loss"].append(loss)
                cps = seen / dt
                log(f"step {i+1}/{num_steps} loss={loss:.4f} "
                    f"batch_ccc={float(metrics['batch_ccc']):.4f} "
                    f"clips/s={cps:.1f}")
                if metric_writer is not None:
                    metric_writer.write(i + 1, {
                        "loss": loss,
                        "grad_norm": float(metrics["grad_norm"]),
                        "clips_per_sec": cps,
                    })
                t0, seen = time.time(), 0
            if (val_dataset is not None and tcfg.eval_every > 0
                    and (i + 1) % tcfg.eval_every == 0):
                ev = self.evaluate(state, val_dataset)
                log(f"  eval @{i+1}: ccc_v={ev['ccc_v']:.4f} "
                    f"ccc_a={ev['ccc_a']:.4f} "
                    f"pooled_v={ev['pooled_ccc_v']:.4f} "
                    f"pooled_a={ev['pooled_ccc_a']:.4f}")
                history.setdefault("eval", []).append(ev)
                if metric_writer is not None:
                    metric_writer.write(i + 1, {f"eval_{k}": v for k, v in ev.items()})
                if plateau is not None:
                    _, hit = plateau.update(ev["ccc_select"], i + 1)
                    if hit:
                        cur = float(state.lr_mult)
                        new = max(cur * ocfg.plateau_factor,
                                  ocfg.plateau_min_scale)
                        if new < cur:
                            # same replicated scalar shape/dtype/sharding →
                            # the compiled train step is reused as-is
                            state = state._replace(lr_mult=jax.device_put(
                                jnp.float32(new),
                                state.lr_mult.sharding))
                            log(f"  plateau @{i+1}: no "
                                f"{tcfg.eval_ccc_convention} CCC improvement "
                                f"for {plateau.bad_evals} evals — lr x "
                                f"{ocfg.plateau_factor:g} (mult {new:.2e})")
                        plateau.bad_evals = 0
                # selection metric honors train.eval_ccc_convention
                is_best, should_stop = best.update(ev["ccc_select"], i + 1)
                if is_best and checkpointer is not None:
                    checkpointer.save_best(state, ev["ccc_select"])
                if should_stop:
                    log(f"early stop @{i+1}: no ccc_mean improvement for "
                        f"{best.bad_evals} evals (best {best.best:.4f} "
                        f"@step {best.best_step})")
                    break
            if (checkpointer is not None and tcfg.checkpoint_every > 0
                    and (i + 1) % tcfg.checkpoint_every == 0):
                # async: on-device snapshot now (state is donated next step),
                # device→host fetch + serialization + rename on a background
                # thread overlapped with training
                checkpointer.save_async(state)
        if profiling:
            jax.profiler.stop_trace()
        if owns_stream and hasattr(train_stream, "close"):
            # covers every non-raising exit (num_steps reached, early stop);
            # a raising fit is on its way to killing the process anyway
            train_stream.close()
        if checkpointer is not None:
            # join the background writer: when fit() returns, its last
            # periodic/best checkpoint must be durably on disk (callers read
            # best.npz right after; the writer thread is a daemon)
            checkpointer.wait()
        return state, history
