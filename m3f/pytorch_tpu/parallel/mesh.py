"""Device mesh and sharding layer — the rebuild's entire distributed backend.

Capability parity: the reference distributes with Lightning ``dp``/``ddp``
over torch.distributed + NCCL (SURVEY.md §2.4).  TPU-native replacement
(C-P1): ONE ``jax.sharding.Mesh``, ``NamedSharding`` annotations on the batch,
and GSPMD — the compiler inserts the gradient ``psum`` over ICI; there is no
hand-written communication backend to maintain.

Axes:
- ``data``  — batch dim of every array in the batch dict; gradients reduce
  over it automatically.
- ``model`` — stub axis (size 1 by default). The model is ~35M params so TP
  is unnecessary (SURVEY §2.3), but the axis exists so the GRU/FC matmuls
  could be sharded by passing ``num_model > 1`` — documented, not enabled.

Multi-host: call ``maybe_initialize_distributed()`` first (no-op single-host);
the mesh then spans all slices and the same code runs unchanged — DCN
collectives only appear if the mesh crosses slices.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed():
    """jax.distributed.initialize() iff launched under a multi-process runtime."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def create_mesh(num_data: int = -1, num_model: int = 1,
                devices=None) -> Mesh:
    """Mesh(('data', 'model')) over the slice.

    ``num_data=-1`` uses every available device (divided by ``num_model``).
    Device order follows ``jax.devices()`` which is ICI-contiguous on a slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    if num_data == -1:
        num_data = len(devices) // num_model
    use = num_data * num_model
    arr = np.asarray(devices[:use]).reshape(num_data, num_model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over 'data', everything else replicated."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
    """Host batch dict → device arrays with the batch axis sharded on 'data'.

    The global batch size must divide the data-axis size. With multiple
    processes each host passes its local shard (jax.make_array_from_process_local_data).
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sh, v) for k, v in batch.items()}
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
