"""Device mesh and sharding layer — the rebuild's entire distributed backend.

Capability parity: the reference distributes with Lightning ``dp``/``ddp``
over torch.distributed + NCCL (SURVEY.md §2.4).  TPU-native replacement
(C-P1): ONE ``jax.sharding.Mesh``, ``NamedSharding`` annotations on the batch,
and GSPMD — the compiler inserts the gradient ``psum`` over ICI; there is no
hand-written communication backend to maintain.

Axes:
- ``data``  — batch dim of every array in the batch dict; gradients reduce
  over it automatically.
- ``model`` — tensor parallelism for the temporal-fusion head (size 1 by
  default). The model is ~35M params so TP is unnecessary for capacity
  (SURVEY §2.3), but with ``num_model > 1`` the BiGRU gate matmuls run
  column-parallel and the FC head row-parallel (``state_shardings`` below);
  GSPMD inserts the all-gathers/psums. The conv backbones stay replicated —
  at 16×112×112 their activations dominate and batch sharding is the right
  split for them.

Multi-host: call ``maybe_initialize_distributed()`` first (no-op single-host);
the mesh then spans all slices and the same code runs unchanged. When the
devices DO span multiple slices (multi-slice jobs; devices carry
``slice_index``), :func:`order_devices_for_mesh` lays the mesh out so every
'model' row is intra-slice (TP collectives stay on ICI) and the 'data' axis
is slice-major — only the once-per-step gradient psum crosses DCN.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, Mapping, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class DistInitPlan:
    """Decision of :func:`distributed_init_plan` — pure data, unit-testable.

    ``initialize``: call ``jax.distributed.initialize(**kwargs)``.
    ``expect_processes``: post-init ``jax.process_count()`` must equal this
    (None = unknown); a mismatch means the processes disagree about the job
    shape and MUST fail loudly — the silent alternative is N independent
    training jobs each convinced it is the whole run.
    ``reason``: which signal decided, for logs and error messages.
    """

    initialize: bool
    reason: str
    kwargs: Dict = field(default_factory=dict)
    expect_processes: Optional[int] = None


def distributed_init_plan(env: Mapping[str, str]) -> DistInitPlan:
    """PURE decision: should this process join a multi-process JAX job?

    The round-2 gate required ``JAX_COORDINATOR_ADDRESS`` /
    ``MEGASCALE_COORDINATOR_ADDRESS`` — which standard Cloud TPU pod
    processes do NOT set, so on a real multi-host slice every process
    silently skipped initialization and trained as an independent job
    (VERDICT r2 missing #2). Signals, in precedence order:

    1. ``M3F_COORDINATOR=host:port[,num_processes,process_id]`` — the
       explicit operator override (set by the ``--coordinator`` CLI flag).
    2. ``MEGASCALE_COORDINATOR_ADDRESS`` / ``JAX_COORDINATOR_ADDRESS`` —
       multislice / explicit-JAX launchers; JAX reads its own env vars, we
       pass no kwargs. ``JAX_NUM_PROCESSES`` (when set) becomes the loud
       post-init assertion.
    3. Cloud TPU pod metadata: ``TPU_WORKER_HOSTNAMES`` with >1 entry
       (set by the TPU VM runtime on every pod worker;
       ``jax.distributed.initialize()`` autodetects the coordinator from
       the same metadata). One entry / unset = single-host, no init.

    Inconsistent signals (a worker id pointing past the hostname list)
    raise here, before any network call.
    """
    coord = env.get("M3F_COORDINATOR", "")
    if coord:
        parts = coord.split(",")
        kwargs = {"coordinator_address": parts[0]}
        expect = None
        if len(parts) == 3:
            expect = int(parts[1])
            kwargs["num_processes"] = expect
            kwargs["process_id"] = int(parts[2])
        elif len(parts) != 1:
            raise ValueError(
                f"M3F_COORDINATOR={coord!r}: expected host:port or "
                "host:port,num_processes,process_id")
        return DistInitPlan(True, "M3F_COORDINATOR (explicit)", kwargs, expect)

    if env.get("MEGASCALE_COORDINATOR_ADDRESS") \
            or env.get("JAX_COORDINATOR_ADDRESS"):
        n = env.get("JAX_NUM_PROCESSES")
        return DistInitPlan(
            True,
            "JAX/MEGASCALE coordinator env",
            {},  # jax.distributed reads its own env vars
            int(n) if n else None)

    hostnames = [h for h in env.get("TPU_WORKER_HOSTNAMES", "").split(",")
                 if h.strip()]
    if len(hostnames) > 1:
        wid = env.get("TPU_WORKER_ID")
        if wid is not None and not 0 <= int(wid) < len(hostnames):
            raise ValueError(
                f"TPU_WORKER_ID={wid} inconsistent with "
                f"TPU_WORKER_HOSTNAMES ({len(hostnames)} workers) — the pod "
                "metadata is corrupt; refusing to guess the job shape")
        return DistInitPlan(True, "TPU pod metadata (TPU_WORKER_HOSTNAMES)",
                            {}, len(hostnames))

    return DistInitPlan(False, "single-process (no multi-host signal)")


_dist_initialized = False


def maybe_initialize_distributed(env: Optional[Mapping[str, str]] = None
                                 ) -> DistInitPlan:
    """Apply :func:`distributed_init_plan`; idempotent; loud on mismatch.

    Launch recipe (multi-host Cloud TPU pod): run the SAME ``m3f train``
    command on every worker (``gcloud compute tpus tpu-vm ssh --worker=all
    --command="m3f train ..."``) — the pod metadata is detected
    automatically. For non-TPU or custom launchers pass
    ``--coordinator host:port,num_processes,process_id`` (or set
    ``M3F_COORDINATOR``) on every process.
    """
    global _dist_initialized
    plan = distributed_init_plan(os.environ if env is None else env)
    if not plan.initialize or _dist_initialized:
        return plan
    try:
        jax.distributed.initialize(**plan.kwargs)
    except Exception as e:  # noqa: BLE001 — re-raise with the decision trail
        raise RuntimeError(
            f"multi-process runtime detected via {plan.reason} but "
            f"jax.distributed.initialize(**{plan.kwargs}) failed. Refusing "
            "to continue single-process: that would train "
            "num_workers independent jobs. Fix the launch environment or "
            "unset the multi-host variables to really run single-process."
        ) from e
    _dist_initialized = True
    if plan.expect_processes is not None \
            and jax.process_count() != plan.expect_processes:
        raise RuntimeError(
            f"jax.process_count()={jax.process_count()} but {plan.reason} "
            f"promised {plan.expect_processes} processes — the workers "
            "disagree about the job shape; aborting before any of them "
            "trains a private copy of the run")
    return plan


def order_devices_for_mesh(devices, num_data: int, num_model: int,
                           slice_ids=None) -> np.ndarray:
    """PURE device layout for ``Mesh(('data','model'))`` — multi-slice aware.

    Returns an object array of shape ``(num_data, num_model)``. Two
    properties make the layout DCN-correct when the devices span multiple
    TPU slices (SURVEY §2.4/§5: "DCN only if multi-slice"):

    1. **Every 'model' row is intra-slice.** The TP collectives (per-layer
       all-gather/psum on the BiGRU gates and fusion head) fire many times
       per step — they must ride ICI. A slice whose device count doesn't
       divide by ``num_model`` raises rather than silently building a TP
       group that straddles DCN.
    2. **The 'data' axis is slice-major.** Rows from the same slice are
       contiguous, so XLA can decompose the once-per-step gradient psum
       into an intra-slice ICI reduce plus one cross-slice DCN exchange.

    ``slice_ids`` defaults to each device's ``slice_index`` attribute
    (present on real multi-slice TPU jobs; ``None``/absent ⇒ slice 0, which
    reproduces the historical single-slice layout bit-for-bit). Within a
    slice the ``jax.devices()`` order is preserved (ICI-contiguous).
    """
    devices = list(devices)
    if slice_ids is None:
        slice_ids = [getattr(d, "slice_index", None) for d in devices]
        slice_ids = [0 if s is None else int(s) for s in slice_ids]
    if len(slice_ids) != len(devices):
        raise ValueError(f"{len(slice_ids)} slice_ids for {len(devices)} devices")

    groups: Dict[int, list] = {}
    for d, s in zip(devices, slice_ids):
        groups.setdefault(s, []).append(d)

    use = num_data * num_model
    if len(groups) == 1:
        # single slice: historical layout, unchanged
        if use > len(devices):
            raise ValueError(f"mesh {num_data}x{num_model} needs {use} "
                             f"devices, have {len(devices)}")
        return np.asarray(devices[:use], dtype=object).reshape(num_data, num_model)

    rows = []
    for s in sorted(groups):
        g = groups[s]
        if len(g) % num_model:
            raise ValueError(
                f"slice {s} has {len(g)} devices, not a multiple of "
                f"num_model={num_model} — a tensor-parallel group would "
                "cross DCN (inter-slice) links; choose num_model to divide "
                "every slice's device count")
        rows.extend(g[i:i + num_model] for i in range(0, len(g), num_model))
    if num_data > len(rows):
        raise ValueError(f"mesh {num_data}x{num_model} needs {num_data} "
                         f"rows, slices provide {len(rows)}")
    return np.asarray(rows[:num_data], dtype=object)


def create_mesh(num_data: int = -1, num_model: int = 1,
                devices=None, slice_ids=None) -> Mesh:
    """Mesh(('data', 'model')) over one slice or several.

    ``num_data=-1`` uses every available device (divided by ``num_model``).
    Single slice: device order follows ``jax.devices()`` (ICI-contiguous).
    Multi-slice (devices carrying ``slice_index``, or explicit
    ``slice_ids``): devices are re-ordered by :func:`order_devices_for_mesh`
    so TP stays on ICI and only the data-axis gradient reduction crosses
    DCN; the public axes and every downstream sharding stay unchanged.
    """
    devices = list(devices if devices is not None else jax.devices())
    if num_data == -1:
        num_data = len(devices) // num_model
    arr = order_devices_for_mesh(devices, num_data, num_model, slice_ids)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over 'data', everything else replicated."""
    return NamedSharding(mesh, P("data"))


# Tensor-parallel rules, matched on the PATH TAIL of a leaf so the same rule
# tree covers params AND optimizer moments (adam's mu/nu mirror the params'
# structure, including the matched key names).
_TP_GRU_MATS = ("w_ih", "w_hh")   # [D, 3H] → column-parallel
_TP_GRU_VECS = ("b_ih", "b_hh")   # [3H]    → sharded like the matmul output


def _tp_spec(path, leaf, n_model: int) -> P:
    """PartitionSpec for one state leaf under the 'model' axis (TP)."""
    if n_model <= 1:
        return P()
    keys = []
    for entry in path:
        k = getattr(entry, "key", getattr(entry, "name", getattr(entry, "idx", None)))
        keys.append(str(k))
    shape = getattr(leaf, "shape", ())
    last = keys[-1] if keys else ""
    if "gru" in keys and last in _TP_GRU_MATS and len(shape) == 2 \
            and shape[1] % n_model == 0:
        return P(None, "model")
    if "gru" in keys and last in _TP_GRU_VECS and len(shape) == 1 \
            and shape[0] % n_model == 0:
        return P("model")
    if len(keys) >= 2 and keys[-2] == "head" and last == "kernel" \
            and "audio" not in keys and "visual" not in keys \
            and len(shape) == 2 and shape[0] % n_model == 0:
        # the FUSION head only (branch-internal projections also carry a
        # 'head' key; their matmuls are too small to be worth collectives):
        # row-parallel over the BiGRU output dim, GSPMD psums the output
        return P("model", None)
    return P()


def state_shardings(mesh: Mesh, tree) -> Dict:
    """NamedSharding tree implementing the TP layout for any state-like tree.

    With ``num_model == 1`` every leaf is replicated (today's DP behavior).
    With ``num_model > 1`` the BiGRU gate weights go column-parallel, their
    biases follow the gate axis, and the FC head kernel goes row-parallel;
    everything else (conv backbones, BN, step counters) stays replicated.
    Works on params, full TrainStates, and optimizer states alike because the
    rules match on path tails.
    """
    n_model = mesh.shape.get("model", 1)
    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, _tp_spec(p, x, n_model)), tree)


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
    """Host batch dict → device arrays with the batch axis sharded on 'data'.

    The global batch size must divide the data-axis size. With multiple
    processes each host passes its local shard (jax.make_array_from_process_local_data).
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sh, v) for k, v in batch.items()}
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
