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
    """Initialize the JAX distributed runtime.

    With no args, configuration comes from the cluster environment (TPU
    pods auto-configure); failures there mean "single process" and are
    swallowed. With EXPLICIT args the caller is declaring a pod topology,
    so initialization failure raises — a misconfigured pod must not
    silently fall back to single-process training. Exercised for real by
    the 2-process localhost run in tests/test_multihost.py."""
    explicit = (coordinator_address is not None or num_processes is not None
                or process_id is not None)
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError):
        if explicit:
            raise
        # env-configured probe: already initialized or single-process


def host_batch_slice(n_global: int) -> slice:
    """The [start, stop) slice of the global batch this host should load."""
    per = n_global // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def replicate_tree_multihost(mesh: Mesh, tree):
    """Replicate a pytree (e.g. the TrainState) over a multi-host mesh.

    ``device_put`` refuses shardings with non-addressable devices, so the
    global replicated array is assembled from each host's local copy via
    ``make_array_from_process_local_data`` (every host holds the same
    value — states are created from the same seed on every process, the
    SPMD analogue of DDP broadcasting rank-0 weights,
    reference src/distributed.py:40-46). Typed PRNG keys round-trip
    through key_data/wrap_key_data (raw uint32 replicates like any leaf).
    """
    import jax.numpy as jnp

    sh = NamedSharding(mesh, P())

    def put(x):
        if not isinstance(x, (jax.Array, np.ndarray, np.generic)):
            return x
        if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
            impl = jax.random.key_impl(x)
            raw = put(np.asarray(jax.random.key_data(x)))
            return jax.random.wrap_key_data(raw, impl=impl)
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree.map(put, tree)


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
