"""Atomic, preemption-aware pytree checkpointing.

Capability parity: Lightning ``.ckpt`` files (model + optimizer + step) and
pretrained-backbone loading (SURVEY.md §2.1 C10, §3.5, §5).  Rebuild design
(SURVEY §5 "Failure detection"): atomic write (tmp + rename), keep-last-K,
save-on-SIGTERM for preemption, resume picks the latest valid checkpoint.

Format: one ``.npz`` with flattened pytree leaves keyed by their tree path
plus a JSON sidecar entry for metadata — dependency-free and portable.  The
torch interop path is ``train/convert.py`` (state_dict ↔ pytree), which makes
these checkpoints weight-compatible with the reference's.
"""

from __future__ import annotations

import atexit
import json
import os
import re
import signal
import tempfile
import threading
import weakref
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np
import jax

from m3f.pytorch_tpu.config import ExperimentConfig


def _device_snapshot(tree):
    """One fresh device buffer per leaf, as ONE compiled program.

    Per-leaf ``x.copy()`` would dispatch (and first compile) hundreds of
    tiny programs — measured 25 s for a fusion TrainState over the remote
    tunnel; a single jitted tree-copy is one dispatch. Inputs that are host
    numpy round-trip through the device unchanged (tests pass numpy
    states), and XLA cannot alias outputs to inputs without donation, so
    every output is a genuinely new buffer — safe against the caller
    donating the originals into the next train step.
    """
    import jax.numpy as jnp
    global _SNAPSHOT_JIT
    if _SNAPSHOT_JIT is None:
        _SNAPSHOT_JIT = jax.jit(
            lambda t: jax.tree_util.tree_map(jnp.copy, t))
    return _SNAPSHOT_JIT(tree)


_SNAPSHOT_JIT = None

# Live checkpointers whose in-flight async writes must drain at process exit.
# ONE module-level atexit handler over a WeakSet — registering a bound
# ``self.wait`` per instance would pin every Checkpointer (and its last
# writer closure) for the process lifetime (ADVICE r4).
_LIVE_CHECKPOINTERS: "weakref.WeakSet[Checkpointer]" = weakref.WeakSet()
_ATEXIT_INSTALLED = False


def _drain_all_checkpointers():
    """atexit: join every live checkpointer's writer. The writer threads are
    daemons and atexit runs before daemon threads are killed, so NO exit path
    (normal, exception, SystemExit) can lose a checkpoint that save_async
    already returned a path for. Write FAILURES are printed, not raised —
    interpreter shutdown must still drain the remaining checkpointers."""
    for ck in list(_LIVE_CHECKPOINTERS):
        try:
            ck.wait()
        except Exception as e:
            print(f"checkpoint write failed during exit drain: {e}")


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_pytree(tree, path: str, meta: Optional[dict] = None):
    """Atomically write a pytree to ``path`` (.npz)."""
    leaves, _ = _flatten_with_paths(tree)
    if meta:
        leaves["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8)
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **leaves)
        os.replace(tmp, path)  # atomic on POSIX
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_pytree(template, path: str):
    """Load leaves saved by save_pytree back into ``template``'s structure."""
    with np.load(path) as z:
        data = {k: z[k] for k in z.files if k != "__meta__"}
    leaves, treedef = _flatten_with_paths(template)
    missing = set(leaves) - set(data)
    extra = set(data) - set(leaves)
    if missing or extra:
        raise ValueError(f"checkpoint mismatch: missing={sorted(missing)[:5]} "
                         f"extra={sorted(extra)[:5]}")
    flat, td = jax.tree_util.tree_flatten(template)
    keys = list(_flatten_with_paths(template)[0].keys())
    new_leaves = [data[k].astype(np.asarray(l).dtype).reshape(np.asarray(l).shape)
                  for k, l in zip(keys, flat)]
    return jax.tree_util.tree_unflatten(td, new_leaves)


def load_meta(path: str) -> dict:
    with np.load(path) as z:
        if "__meta__" in z.files:
            return json.loads(bytes(z["__meta__"]).decode())
    return {}


def load_model_checkpoint(state, path: str):
    """Load model weights for EVAL from either checkpoint layout.

    Accepts (a) a full TrainState checkpoint (``ckpt_*.npz`` — params +
    bn_state + opt_state + step) or (b) the ``{params, state}`` .npz written
    by ``scripts/import_torch_checkpoint.py`` — in which case opt_state/step
    keep their init values (they are irrelevant to eval).  ADVICE r1: without
    this there was no CLI path to evaluate imported reference/torch weights.
    """
    with np.load(path) as z:
        keys = set(z.files)
        # full TrainState layout: NamedTuple fields flatten as ".step" /
        # ".params" (GetAttrKey), import-script dicts as plain "params/..."
        if keys & {"step", ".step"}:
            # load ONLY the model subtrees: eval never touches opt_state, and
            # template-matching it would reject checkpoints trained under a
            # different optimizer/schedule (e.g. a cosine run's extra
            # schedule-count leaf) for no reason
            data = {k: z[k] for k in z.files if k != "__meta__"}

            def subtree(template, prefix):
                names = list(_flatten_with_paths(template)[0].keys())
                flat, td = jax.tree_util.tree_flatten(template)
                # extra-key detection stays (an architecturally RICHER
                # checkpoint — e.g. SE branches — must not load silently
                # into a smaller model); only opt_state/step are exempt
                want = {f"{prefix}/{k}" if k else prefix for k in names}
                have = {k for k in data if k.startswith(prefix + "/")}
                if have - want:
                    raise ValueError(
                        f"checkpoint {path} has model leaves the eval model "
                        f"lacks: {sorted(have - want)[:5]} — architecture "
                        "mismatch")
                out = []
                for k, leaf in zip(names, flat):
                    fk = f"{prefix}/{k}" if k else prefix
                    if fk not in data:
                        raise ValueError(
                            f"checkpoint {path} missing model leaf {fk}")
                    arr = np.asarray(leaf)
                    out.append(data[fk].astype(arr.dtype).reshape(arr.shape))
                return jax.tree_util.tree_unflatten(td, out)

            step_key = ".step" if ".step" in data else "step"
            # a checkpoint trained with train.ema_decay carries an EMA
            # shadow under ".ema/" — prefer it for eval (that is what the
            # shadow is for; best-checkpoint selection scored it)
            params_tpl = jax.device_get(state.params)
            params_prefix = ".ema" if any(
                k.startswith(".ema/") for k in data) else ".params"
            params = subtree(params_tpl, params_prefix)
            return state._replace(
                params=params,
                ema=None if state.ema is None else params,
                bn_state=subtree(jax.device_get(state.bn_state), ".bn_state"),
                step=data[step_key].reshape(
                    np.asarray(state.step).shape).astype(
                        np.asarray(state.step).dtype))
    tpl = {"params": jax.device_get(state.params),
           "state": jax.device_get(state.bn_state)}
    loaded = load_pytree(tpl, path)
    return state._replace(
        params=loaded["params"],
        # refresh the shadow too — otherwise an EMA-enabled eval config
        # would serve the init_state copy of RANDOM weights via eval_state
        ema=None if state.ema is None else loaded["params"],
        bn_state=loaded["state"])


def load_pretrained_init(params, bn_state, path: str):
    """Partial-pytree pretrained init (SURVEY §3.5; VERDICT r1 missing #2).

    ``path`` is an import_torch_checkpoint.py .npz.  Its meta ``kind`` picks
    the target subtree: ``r2plus1d`` → params['visual'], ``audio_cnn`` →
    params['audio'], ``m3f`` → the whole model.  Branch loads leave every
    other subtree (head, GRU, other branch) at its fresh init. Returns new
    (params, bn_state).
    """
    kind = load_meta(path).get("kind")
    if kind is None:  # infer from the flat key prefixes
        with np.load(path) as z:
            keys = z.files
        if any(k.startswith("params/gru") for k in keys):
            kind = "m3f"
        elif any(k.startswith("params/stem") for k in keys):
            kind = "r2plus1d"
        else:
            kind = "audio_cnn"
    if kind == "m3f":
        loaded = load_pytree({"params": jax.device_get(params),
                              "state": jax.device_get(bn_state)}, path)
        return loaded["params"], loaded["state"]
    branch = {"r2plus1d": "visual", "audio_cnn": "audio"}[kind]
    if branch not in params:
        raise ValueError(f"init_from kind={kind} needs model branch "
                         f"'{branch}', but the model has {sorted(params)}")
    loaded = load_pytree({"params": jax.device_get(params[branch]),
                          "state": jax.device_get(bn_state[branch])}, path)
    params = dict(params)
    bn_state = dict(bn_state)
    params[branch] = loaded["params"]
    bn_state[branch] = loaded["state"]
    return params, bn_state


# eq=False: identity hash/eq — a stateful object (writer thread, SIGTERM
# handler) and a member of the module's WeakSet exit-drain registry
@dataclass(eq=False)
class Checkpointer:
    directory: str
    keep: int = 3
    cfg: Optional[ExperimentConfig] = None
    _sigterm_state: Any = field(default=None, repr=False)

    def __post_init__(self):
        global _ATEXIT_INSTALLED
        os.makedirs(self.directory, exist_ok=True)
        self._writer: Optional[threading.Thread] = None
        self._writer_error: Optional[tuple] = None  # (path, exception)
        _LIVE_CHECKPOINTERS.add(self)
        if not _ATEXIT_INSTALLED:
            atexit.register(_drain_all_checkpointers)
            _ATEXIT_INSTALLED = True

    # -- naming -----------------------------------------------------------

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt_{step:08d}.npz")

    def all_steps(self):
        steps = []
        for f in os.listdir(self.directory):
            m = re.fullmatch(r"ckpt_(\d+)\.npz", f)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_path(self) -> Optional[str]:
        steps = self.all_steps()
        return self._path(steps[-1]) if steps else None

    # -- save / restore ----------------------------------------------------

    @staticmethod
    def _primary() -> bool:
        """Only process 0 WRITES on a multi-host job (state is replicated,
        so N processes would race N identical copies into the same files —
        harmless for content thanks to mkstemp+rename, but N× the write
        bandwidth and interleaved keep-K prunes). Every process still
        READS (maybe_restore): on multi-host, checkpoint_dir must be
        SHARED storage (the MIGRATION.md launch recipe says so)."""
        import jax
        return jax.process_index() == 0

    def save(self, state) -> str:
        self.wait()
        step = int(state.step)
        path = self._path(step)
        if not self._primary():
            return path
        save_pytree(jax.device_get(state), path, self._meta(step))
        self._prune()
        return path

    def save_async(self, state) -> str:
        """Atomic ASYNC checkpoint (SURVEY §5 "orbax-style async").

        The caller donates ``state`` into the next train step, so its buffers
        cannot be read later — but a synchronous ``jax.device_get`` here
        would stall the train loop for the whole device→host transfer
        (seconds over a slow link for a fusion-sized state). Instead the
        state is snapshotted ON-DEVICE via ``_device_snapshot`` (ONE jitted
        whole-tree copy — a single dispatch, ~HBM-bandwidth cheap; PJRT
        orders the copies before any later step that consumes the donated
        originals), and the fetch + npz write + keep-K prune all run on a
        background thread overlapped with training. Costs one extra
        TrainState in HBM only until the background fetch lands (the writer
        frees the snapshot buffers right after ``device_get``); the entry
        ``wait()`` (single-writer backpressure) bounds that to one snapshot,
        and ``wait()``/``save()``/exit join it.
        """
        self.wait()
        step = int(state.step)
        path = self._path(step)
        if not self._primary():
            return path
        self._start_writer(_device_snapshot(state), path, self._meta(step),
                           prune=True)
        return path

    def _start_writer(self, snap, path: str, meta: dict,
                      prune: bool = False) -> None:
        """Background fetch + npz write of an on-device snapshot.

        Failures (device_get over a flaky link, np.savez on a full disk) are
        captured and re-raised from the next ``wait()`` — a swallowed writer
        exception would let fit() return as if the checkpoint were durably
        on disk (ADVICE r4). The snapshot's HBM buffers are freed as soon as
        the host fetch completes, not when the thread object is replaced."""
        def _write():
            try:
                host = jax.device_get(snap)
                jax.tree_util.tree_map(
                    lambda x: x.delete() if isinstance(x, jax.Array) else None,
                    snap)
                save_pytree(host, path, meta)
                if prune:
                    self._prune()
            except BaseException as e:  # noqa: BLE001 — re-raised in wait()
                self._writer_error = (path, e)

        self._writer = threading.Thread(target=_write, daemon=True)
        self._writer.start()

    def wait(self):
        """Block until any in-flight async write has finished.

        Raises if that write FAILED: callers (fit()'s end-of-loop join, the
        next save's backpressure, exit drain) must not report a checkpoint
        as durable when the background fetch/serialize/rename died."""
        w = getattr(self, "_writer", None)
        if w is not None and w.is_alive():
            w.join()
        self._writer = None
        err, self._writer_error = getattr(self, "_writer_error", None), None
        if err is not None:
            path, exc = err
            raise RuntimeError(
                f"async checkpoint write of {path} failed: {exc}") from exc

    def _meta(self, step: int) -> dict:
        meta = {"step": step}
        if self.cfg is not None:
            meta["config_hash"] = self.cfg.config_hash()
            meta["config"] = self.cfg.to_dict()
        return meta

    def _prune(self):
        for s in self.all_steps()[:-self.keep]:
            try:
                os.unlink(self._path(s))
            except FileNotFoundError:
                pass

    def seed_from(self, path: str) -> None:
        """Seed this run directory from an explicit checkpoint path
        (reference ``--resume_from_checkpoint x.ckpt``, SURVEY §3.5).

        Copies the file into ``checkpoint_dir`` under its own step number so
        ``maybe_restore`` picks it up with ALL its safety logic (config-hash
        abort, corruption fallback). Restart-safe: if the directory already
        holds checkpoints, the seed is IGNORED with a notice — a preemption
        restart loop passing the same flag must not clobber newer progress.
        """
        if self.all_steps():
            print(f"resume-from {path} ignored: {self.directory} already has "
                  "checkpoints (auto-resume from the newest takes precedence)")
            return
        if not self._primary():
            return  # process 0 seeds the (shared) dir; see _primary()
        with np.load(path) as z:
            keys = {"step", ".step"} & set(z.files)
            if not keys:
                raise ValueError(
                    f"{path} is not a full TrainState checkpoint (no step "
                    "leaf) — model-only/imported weights go through "
                    "--init-from, which starts a fresh optimizer")
            # the .step leaf itself is authoritative (ADVICE r2: meta/filename
            # heuristics could write ckpt_00000000.npz whose name disagrees
            # with the state inside, scrambling keep-K pruning order)
            step = int(np.asarray(z[next(iter(keys))]))
        os.makedirs(self.directory, exist_ok=True)
        import shutil
        dst = self._path(step)
        tmp = dst + ".tmp"
        shutil.copyfile(path, tmp)
        os.replace(tmp, dst)  # atomic like save(): no partial ckpt visible
        print(f"seeded {self.directory} from {path} (step {step})")

    def maybe_restore(self, state, trainer=None):
        """Resume from the latest valid checkpoint, else return state as-is.

        Corrupt/partial files fall back to older checkpoints; a CONFIG HASH
        MISMATCH aborts loudly instead (VERDICT r1 weak #3: silently resuming
        an edited config from stale state is a training-run footgun).
        """
        for step in reversed(self.all_steps()):
            p = self._path(step)
            try:
                meta = load_meta(p)
            except Exception as e:  # corrupt/partial file → try older
                print(f"checkpoint {p} unusable ({e}); trying older")
                continue
            # hash check BEFORE the tree load: a different config usually
            # also changes the pytree layout, and the layout error must not
            # be mistaken for corruption (which silently tries older files)
            if (self.cfg is not None and meta.get("config_hash") not in
                    (None, self.cfg.config_hash())):
                raise RuntimeError(
                    f"checkpoint {p} was written by a different config "
                    f"(hash {meta.get('config_hash')} != {self.cfg.config_hash()}). "
                    "Refusing to resume silently — point checkpoint_dir at a "
                    "fresh directory or restore the original config.")
            try:
                restored = load_pytree(jax.device_get(state), p)
            except Exception as e:  # corrupt/partial file → try older
                print(f"checkpoint {p} unusable ({e}); trying older")
                continue
            if trainer is not None:
                from m3f.pytorch_tpu.parallel.mesh import state_shardings
                restored = jax.device_put(
                    restored, state_shardings(trainer.mesh, restored))
            return restored
        return state

    # -- best checkpoint (reference C8 ModelCheckpoint-by-val-CCC) ---------

    def best_path(self) -> str:
        return os.path.join(self.directory, "best.npz")

    def save_best(self, state, metric: float) -> str:
        """Best-by-eval-CCC checkpoint (reference C8 ModelCheckpoint).

        Runs on the eval path mid-fit, so it uses the same snapshot +
        background-write machinery as save_async (a sync device→host fetch
        of a fusion TrainState stalls training ~30 s on a slow link); the
        single writer slot serializes it with periodic saves, and fit()'s
        end-of-loop ``wait()`` guarantees best.npz is on disk when fit
        returns."""
        self.wait()
        if not self._primary():
            return self.best_path()
        meta = {"step": int(state.step), "metric": float(metric)}
        if self.cfg is not None:
            meta["config_hash"] = self.cfg.config_hash()
        self._start_writer(_device_snapshot(state), self.best_path(), meta)
        return self.best_path()

    # -- preemption (SIGTERM) ---------------------------------------------

    def install_preemption_handler(self, get_state):
        """Save on SIGTERM before dying (preemption-aware, SURVEY §5).

        The referenced state is donated (donate_argnums=0) into the NEXT
        train_step, so a SIGTERM landing inside the dispatch window can see
        deleted buffers — the save is best-effort and must never mask the
        exit path (ADVICE r1: an exception here skipped SystemExit entirely).
        """
        def handler(signum, frame):
            try:
                st = get_state()
                if st is not None:
                    self.save(st)
            except Exception as e:
                print(f"preemption save failed ({e}); exiting without it")
            raise SystemExit(143)
        signal.signal(signal.SIGTERM, handler)
