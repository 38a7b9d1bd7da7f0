"""Tensor-parallel parameter sharding over the mesh's ``model`` axis.

The reference has no tensor parallelism (SURVEY.md §2.6: data parallel
only); this is the TPU-native extension for scaling past one chip's memory
or FLOPs: large Dense kernels are sharded column-wise over MODEL_AXIS via
NamedSharding, and GSPMD inserts the forward all-gather / backward
reduce-scatter over ICI. Everything else stays replicated, so the same
jitted train step works for dp-only (model=1) and hybrid dp x tp meshes.

The main beneficiary here is the TFN fusion head: the outer-product fusion
dim is (d+1)^2 (16k+ at d=128), making its classifier kernel the largest
matmul in the model family.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def tp_param_shardings(params: Any, mesh: Mesh, min_size: int = 1 << 16):
    """Per-leaf shardings: 2-D kernels with >= min_size elements whose output
    dim divides the model-axis size are sharded P(None, 'model'); everything
    else replicated."""
    n_model = mesh.shape[MODEL_AXIS]
    rep = NamedSharding(mesh, P())
    col = NamedSharding(mesh, P(None, MODEL_AXIS))

    def spec(x):
        if (hasattr(x, "ndim") and x.ndim == 2 and x.size >= min_size
                and x.shape[-1] % n_model == 0 and n_model > 1):
            return col
        return rep

    return jax.tree.map(spec, params)


def shard_state_tp(state, mesh: Mesh, min_size: int = 1 << 16):
    """Place a TrainState on the mesh: large kernels tensor-sharded, the
    rest (incl. optimizer moments, which mirror the params' tree) matching."""
    p_shard = tp_param_shardings(state.params, mesh, min_size)
    rep = NamedSharding(mesh, P())

    params = jax.tree.map(jax.device_put, state.params, p_shard)

    def put_opt(x):
        return jax.device_put(x, rep)

    # optimizer state trees mirror params where they hold moments; exact
    # matching shardings would need tree alignment — replicating them is
    # correct (GSPMD reshards on use) and keeps this simple
    return state.replace(
        params=params,
        batch_stats=jax.tree.map(put_opt, state.batch_stats),
        opt_state=jax.tree.map(put_opt, state.opt_state),
        step=jax.device_put(state.step, rep),
        rng=jax.device_put(state.rng, rep),
    )
