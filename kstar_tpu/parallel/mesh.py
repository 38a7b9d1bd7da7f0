"""Device mesh construction + sharding specs.

TPU-native replacement for the reference's NCCL DDP (reference
src/distributed.py:129 init_process_group / :46 DDP wrapper): a
``jax.sharding.Mesh`` with a ``data`` axis (and an optional ``model`` axis
for fusion-head tensor sharding), NamedSharding annotations on batches and
replicated state, and XLA-inserted all-reduces over ICI instead of NCCL
collectives. ``DistributedSampler``'s role is covered by sharded device_put:
each host feeds its local slice of the global batch.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over available devices. data=-1 means
    'all remaining devices'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(cfg.model, 1)
    data = cfg.data if cfg.data > 0 else n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def stack_sharding(mesh: Mesh) -> NamedSharding:
    """(K, B, ...) multi-step batch stacks (loader.grouped_batches): shard
    the SECOND axis (the batch) over data — axis 0 is the scan's step axis
    and must stay whole on every device."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def put_batch(mesh: Mesh, batch):
    """device_put a host batch (array / dict / tuple pytree) with the batch
    axis sharded over 'data' — the per-host input-sharding equivalent of the
    reference's DistributedSampler (src/distributed.py:20-27)."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(np.asarray(x), sh), batch)


def put_stack(mesh: Mesh, batch):
    """device_put a (K, B, ...) batch stack with the BATCH axis sharded
    (see stack_sharding)."""
    sh = stack_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(np.asarray(x), sh), batch)


def put_replicated(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
