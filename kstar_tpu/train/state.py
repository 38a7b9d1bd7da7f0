"""Train state + checkpointing.

Unlike the reference (model state_dict only, no optimizer/RNG state —
reference src/train.py:249-264, no true mid-run resume), the full functional
state (params, batch_stats, opt_state, step, rng) is checkpointed, giving
exact resume. Serialization is flax msgpack; best/last policy matches the
reference tag naming (train_vision_network.py:176-182).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import serialization, struct

from ..config import OptimConfig


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats if new_batch_stats is not None else self.batch_stats,
            opt_state=new_opt_state,
        )


def make_optimizer(cfg: OptimConfig, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    """Optimizer dispatch + StepLR-style staircase decay + global-norm clip
    (reference train_vision_network.py:271-290; clip src/train.py:63-64)."""
    if cfg.use_scheduler:
        lr = optax.exponential_decay(
            cfg.lr, transition_steps=cfg.step_size * steps_per_epoch,
            decay_rate=cfg.gamma, staircase=True,
        )
    else:
        lr = cfg.lr

    name = cfg.optimizer.lower()
    if name == "sgd":
        tx = optax.sgd(lr, momentum=0.9)
    elif name in ("rmsprop", "rmsprops"):
        tx = optax.rmsprop(lr)
    elif name == "adam":
        tx = optax.adam(lr)
    else:
        tx = optax.adamw(lr)

    chain = []
    if cfg.max_norm_grad is not None:
        chain.append(optax.clip_by_global_norm(cfg.max_norm_grad))
    chain.append(tx)
    return optax.chain(*chain)


def create_train_state(model, sample_batch, rng: jax.Array, optim_cfg: OptimConfig,
                       steps_per_epoch: int = 1, apply_args: Optional[tuple] = None,
                       init_on_cpu: Optional[bool] = None) -> TrainState:
    """Initialize variables with a sample batch and build the optimizer.

    By default ``model.init`` runs on the host CPU backend and the variables
    are transferred to the accelerator once: the init program is pure setup
    (never reused), and compiling it through a remote TPU compiler costs
    60-180 s cold vs seconds on the local CPU (PERFORMANCE.md). Pass
    ``init_on_cpu=False`` to init on the default backend instead.
    """
    init_rng, noise_rng, drop_rng, state_rng = jax.random.split(rng, 4)
    args = apply_args if apply_args is not None else (sample_batch,)
    if init_on_cpu is None:
        init_on_cpu = jax.default_backend() != "cpu"
    cpu = None
    if init_on_cpu:
        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            init_on_cpu = False
    tx = make_optimizer(optim_cfg, steps_per_epoch)
    if init_on_cpu:
        # Pull committed-device args/rngs back to host so the init stays on
        # the CPU backend, run it EAGERLY at batch 1 (params are batch-size
        # independent; eager skips the big init-graph compile: measured
        # 16 s vs 45 s jitted-CPU vs 60-180 s remote-TPU), init the
        # optimizer state on host too (eager zeros_like per param would
        # otherwise remote-compile per op), and ship everything over once.
        host = lambda x: jax.device_put(jax.device_get(x), cpu)
        rngs = {"params": host(init_rng), "noise": host(noise_rng),
                "dropout": host(drop_rng)}
        host_args = jax.tree.map(
            lambda x: jax.device_put(jax.device_get(x)[:1], cpu)
            if isinstance(x, jax.Array) and x.ndim > 0 else x, args)
        with jax.default_device(cpu), jax.disable_jit():
            variables = model.init(rngs, *host_args, train=False)
            opt_state = tx.init(variables["params"])
        # local_devices: on multi-host runs jax.devices()[0] can be a
        # non-addressable device on hosts > 0, where device_put would raise
        variables, opt_state = jax.device_put((variables, opt_state),
                                              jax.local_devices()[0])
    else:
        variables = model.init(
            {"params": init_rng, "noise": noise_rng, "dropout": drop_rng},
            *args, train=False,
        )
        opt_state = tx.init(variables["params"])
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        rng=state_rng,
        tx=tx,
    )


# ---------------------------------------------------------------------------
# checkpointing
# ---------------------------------------------------------------------------

def save_checkpoint(state: TrainState, path: str, extra: Optional[Dict] = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        # typed PRNG keys aren't msgpack-serializable; store the raw key data
        "rng": jax.random.key_data(state.rng),
    }
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(payload)))
    if extra:
        import json
        with open(path + ".json", "w") as f:
            json.dump(extra, f, indent=2, default=str)


def load_checkpoint(state: TrainState, path: str) -> TrainState:
    """Restore into an existing (template) state, preserving the optimizer fn."""
    with open(path, "rb") as f:
        raw = f.read()
    template = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "rng": jax.random.key_data(state.rng),
    }
    restored = serialization.from_bytes(template, raw)
    restored["rng"] = jax.random.wrap_key_data(restored["rng"])
    return state.replace(**restored)


def load_params(state_template: TrainState, path: str):
    """Restore only (params, batch_stats) for inference."""
    restored = load_checkpoint(state_template, path)
    return restored.params, restored.batch_stats


# ---------------------------------------------------------------------------
# orbax backend (sharded / async checkpoints for multi-chip runs)
# ---------------------------------------------------------------------------

def save_checkpoint_orbax(state: TrainState, path: str) -> None:
    """Sharded checkpoint via orbax — preserves device shardings, scales to
    multi-host; use for large mesh runs (msgpack path gathers to host)."""
    import orbax.checkpoint as ocp

    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "rng": jax.random.key_data(state.rng),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(state: TrainState, path: str) -> TrainState:
    import orbax.checkpoint as ocp

    template = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "rng": jax.random.key_data(state.rng),
    }
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), template)
    restored["rng"] = jax.random.wrap_key_data(restored["rng"])
    return state.replace(**restored)
