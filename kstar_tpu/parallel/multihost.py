"""Multi-host utilities: process-group initialization + per-host data feeding.

Replaces the reference's MASTER_ADDR/PORT + mp.spawn rendezvous
(reference src/distributed.py:205-246) with the JAX distributed runtime:
every host runs the same script, calls ``init_multihost()`` once before any
backend use, and feeds only its local slice of the global batch.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime (no-op on a single process).
    With no args, configuration comes from the cluster environment
    (TPU pods auto-configure)."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError):
        pass  # already initialized or single-process


def host_batch_slice(n_global: int) -> slice:
    """The [start, stop) slice of the global batch this host should load."""
    per = n_global // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def global_batch_from_local(mesh: Mesh, local_batch) -> "jax.Array":
    """Assemble a globally-sharded array from each host's local shard
    (the multi-host analogue of put_batch; the reference's
    DistributedSampler role). local_batch is this host's slice with the
    batch axis leading."""
    def put(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P(DATA_AXIS))
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, local_batch)
