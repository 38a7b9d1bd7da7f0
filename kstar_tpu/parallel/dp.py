"""Sharded training: data-parallel steps over a device mesh.

Replaces reference src/distributed.py (mp.spawn + NCCL DDP + rank-0
checkpoint barriers) with single-controller SPMD: the train state is
replicated over the mesh, input batches are device_put with their leading
axis sharded over the ``data`` axis (parallel/mesh.py:put_batch — the
equivalent of the reference's DistributedSampler), and the ordinary jitted
train step (train/loop.py:make_train_step) is GSPMD-partitioned by XLA,
which inserts the gradient all-reduce over ICI. There are no process
groups, barriers, or rank-conditional saves: state is logically global and
checkpointing works unchanged on any mesh.

BatchNorm under data parallelism: the step is jitted over the *global*
batch, so batch statistics reduce over the full batch by construction —
stronger than DDP's per-replica BN stats.

Multi-host: call jax.distributed.initialize() before building the mesh
(replacing the reference's MASTER_ADDR/PORT rendezvous,
src/distributed.py:245-246); per-host data loading feeds local shards via
jax.make_array_from_process_local_data.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from ..config import LossConfig
from ..train.loop import make_eval_step, make_train_step
from ..train.state import TrainState
from .mesh import put_batch, put_replicated


def make_dp_step_fns(model, loss_cfg: LossConfig, mesh: Mesh,
                     model_type: str = "single") -> Tuple[Callable, Callable, Callable]:
    """Returns (train_step, eval_step, put) for data-parallel training.

    ``put`` moves a host (batch, labels) tuple onto the mesh with the batch
    axis sharded; the step fns are the standard jitted steps — GSPMD does
    the rest. Batch size must be divisible by the data-axis size.
    """
    train_step = make_train_step(model, loss_cfg, model_type)
    eval_step = make_eval_step(model, loss_cfg, model_type)

    def put(batch_and_labels):
        batch, labels = batch_and_labels
        return put_batch(mesh, batch), put_batch(mesh, labels)

    return train_step, eval_step, put


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Replicate train state across the mesh."""
    return put_replicated(mesh, state)
