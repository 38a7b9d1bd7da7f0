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


def _shard_mirrored(tree, p_shard, p_struct, rep):
    """Place every params-shaped subtree (optimizer moments mu/nu, etc.)
    with the params' shardings and everything else (step counts, scalars)
    replicated. Without this, replicated Adam moments force GSPMD to
    all-gather the sharded params (or reshard the moments) every update."""
    def is_mirror(t):
        try:
            return jax.tree.structure(t) == p_struct
        except Exception:
            return False

    def place(sub):
        if is_mirror(sub):
            return jax.tree.map(jax.device_put, sub, p_shard)
        return jax.device_put(sub, rep)

    if is_mirror(tree):
        return jax.tree.map(jax.device_put, tree, p_shard)
    return jax.tree.map(place, tree, is_leaf=is_mirror)


def shard_state_tp(state, mesh: Mesh, min_size: int = 1 << 16):
    """Place a TrainState on the mesh: large kernels tensor-sharded, the
    optimizer moments sharded to MATCH the params (they mirror the params'
    tree structure), and everything else replicated."""
    p_shard = tp_param_shardings(state.params, mesh, min_size)
    p_struct = jax.tree.structure(state.params)
    rep = NamedSharding(mesh, P())

    params = jax.tree.map(jax.device_put, state.params, p_shard)
    opt_state = _shard_mirrored(state.opt_state, p_shard, p_struct, rep)

    return state.replace(
        params=params,
        batch_stats=jax.tree.map(lambda x: jax.device_put(x, rep), state.batch_stats),
        opt_state=opt_state,
        step=jax.device_put(state.step, rep),
        rng=jax.device_put(state.rng, rep),
    )
