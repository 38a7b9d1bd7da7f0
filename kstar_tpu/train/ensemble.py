"""Multi-seed ensemble training via ``jax.vmap`` over the state axis.

The reference's experiment sweeps train the same configuration once per
seed, serially (reference exp/exp_0D_mlstm.sh, exp/exp_r2plus1d.sh: seeds
40-43 as four separate processes). TPU-native alternative: stack N
independently-initialized train states and ``vmap`` the SAME train step
over them — N models train simultaneously in one compiled program, sharing
each batch's HBM reads. For the small 0D models (1-3% MFU solo, see
PERFORMANCE.md) the chip absorbs the extra arithmetic almost for free, so
N seeds cost ~1x wall-clock instead of Nx.

Semantics: seed i of the ensemble takes exactly the same step sequence as
a solo run initialized with seed i's rng (same fold_in(state.rng,
state.step) stream; batches shared across seeds — the reference's per-seed
DataLoader reshuffle is an rng difference, not a semantic one).
``tests/test_ensemble.py`` asserts SGD-trajectory equality per member.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LossConfig, OptimConfig, TrainConfig
from .loop import History, _loss_aux, _train_step_core
from .metrics import accuracy, macro_f1
from .state import TrainState, create_train_state, save_checkpoint


def create_ensemble_state(model, sample_batch, seeds, optim_cfg: OptimConfig,
                          steps_per_epoch: int = 1,
                          apply_args: Optional[tuple] = None,
                          mesh=None) -> TrainState:
    """Stack N independently-initialized TrainStates (one per seed) into a
    single TrainState whose array leaves carry a leading ensemble axis.

    ``mesh``: shard the ensemble axis over the mesh's 'data' devices —
    members are independent, so GSPMD partitions the vmapped step with NO
    collectives (each chip trains its local members; the shared batch
    replicates). The data-axis size must evenly divide len(seeds).
    """
    states = [create_train_state(model, sample_batch, jax.random.key(int(s)),
                                 optim_cfg, steps_per_epoch=steps_per_epoch,
                                 apply_args=apply_args)
              for s in seeds]
    # tx is a static pytree field; each create_train_state built its own
    # (identical) optax chain — unify so the treedefs match for stacking
    states = [st.replace(tx=states[0].tx) for st in states]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P
        sh = NamedSharding(mesh, P("data"))
        stacked = jax.tree.map(lambda x: jax.device_put(x, sh), stacked)
    return stacked


def unstack_ensemble(state: TrainState, i: int) -> TrainState:
    """Member i of the stacked ensemble as a standalone TrainState."""
    return jax.tree.map(lambda x: x[i], state).replace(tx=state.tx)


def make_ensemble_step(model, loss_cfg: LossConfig, model_type: str = "single",
                       pre_fn=None):
    """step(states, batch, labels, weight, m_list, gb_w)
    -> (states, losses (N,), preds (N, B)); the batch is shared (broadcast)
    across members, everything else vmaps over the ensemble axis."""
    core = _train_step_core(model, loss_cfg, model_type, pre_fn=pre_fn)

    def step(states, batch, labels, weight, m_list, gb_w):
        return jax.vmap(
            lambda st: core(st, batch, labels, weight, m_list, gb_w))(states)

    return jax.jit(step, donate_argnums=(0,))


def make_ensemble_scan_steps(model, loss_cfg: LossConfig,
                             model_type: str = "single", pre_fn=None):
    """K steps x N members in ONE dispatch: ``lax.scan`` over a (K, B, ...)
    batch stack composed under ``vmap`` over the ensemble axis (the
    make_scan_steps pattern, train/loop.py:116-146).

    multi_step(states, batches, labels, weight, m_list, gb_w)
        -> (states, losses (N, K), preds (N, K, B))

    Numerically identical to K sequential make_ensemble_step calls — same
    core, same per-member rng stream."""
    core = _train_step_core(model, loss_cfg, model_type, pre_fn=pre_fn)

    def multi_step(states, batches, labels, weight, m_list, gb_w):
        def member(st):
            def body(s, xs):
                b, y = xs
                s, loss, preds = core(s, b, y, weight, m_list, gb_w)
                return s, (loss, preds)

            return jax.lax.scan(body, st, (batches, labels))

        states, (losses, preds) = jax.vmap(member)(states)
        return states, losses, preds

    return jax.jit(multi_step, donate_argnums=(0,))


def make_ensemble_eval(model, loss_cfg: LossConfig, model_type: str = "single",
                       pre_fn=None):
    """eval(states, batch, labels, weight, m_list, gb_w, mask)
    -> (losses (N,), probs (N, B, C), preds (N, B))."""
    from .loop import _eval_step_core

    one = _eval_step_core(model, loss_cfg, model_type, pre_fn=pre_fn)

    def step(states, batch, labels, weight, m_list, gb_w, mask):
        return jax.vmap(
            lambda st: one(st, batch, labels, weight, m_list, gb_w, mask))(states)

    return jax.jit(step)


def fit_ensemble(
    model,
    states: TrainState,
    seeds,
    train_ds,
    valid_ds,
    train_cfg: TrainConfig,
    loss_cfg: LossConfig,
    model_type: str = "single",
    tag: str = "model",
    sampler=None,
    put=None,
    pre_fn=None,
    pre_fn_eval=None,
    put_stack=None,
) -> Tuple[TrainState, List[History]]:
    """Train all ensemble members simultaneously; per-member History and
    per-member ``{tag}_seed_{s}_{best,last}.ckpt`` checkpoints (the tag
    scheme the reference's per-seed sweep processes produce).

    ``train_cfg.steps_per_dispatch`` > 1 runs full groups of K batches as
    ONE vmap x scan dispatch (make_ensemble_scan_steps) — the fit() driver's
    multi-step mode, composed with the ensemble axis. ``put_stack`` handles
    the (K, B, ...) stacks on a mesh (see loader.grouped_batches).

    Scope notes: no early stopping (members would stop at different epochs,
    splitting the vmapped program — run the full budget and use each
    member's best checkpoint) and no TensorBoard writer (per-member
    histories return to the caller). Batches and the sampler are shared
    across members; relative to the reference's per-seed processes this is
    an rng difference only, since each member keeps its own init, noise,
    dropout, and augmentation streams."""
    from ..data.loader import (epoch_batches, eval_batches, grouped_batches,
                               threaded_batches)

    n = len(seeds)
    train_step = make_ensemble_step(model, loss_cfg, model_type, pre_fn=pre_fn)
    eval_step = make_ensemble_eval(model, loss_cfg, model_type, pre_fn=pre_fn_eval)
    k = getattr(train_cfg, "steps_per_dispatch", 1)
    scan_step = (make_ensemble_scan_steps(model, loss_cfg, model_type, pre_fn=pre_fn)
                 if k > 1 else None)

    cls_counts = train_ds.class_counts()
    gb_w = jnp.zeros(3, jnp.float32)
    rng = np.random.default_rng(train_cfg.seed)
    hists = [History() for _ in range(n)]
    best_f1 = [-1.0] * n

    os.makedirs(train_cfg.weight_dir, exist_ok=True)

    for epoch in range(train_cfg.num_epoch):
        weight, m_list = _loss_aux(loss_cfg, cls_counts, epoch, train_cfg.num_epoch)

        # --- train: shared batches, vmapped step, device-side accumulation
        dev_losses, dev_preds, all_labels = [], [], []
        idx_iter = epoch_batches(len(train_ds), train_cfg.batch_size, rng,
                                 sampler=sampler)
        if scan_step is not None:
            for kind, (batch, labels) in grouped_batches(
                    train_ds, idx_iter, k, put, put_stack=put_stack):
                y = jnp.asarray(labels)
                if kind == "stack":
                    states, losses_k, preds_k = scan_step(
                        states, batch, y, weight, m_list, gb_w)
                    dev_losses.append(jnp.sum(losses_k, axis=1))     # (N,)
                    dev_preds.append(preds_k.reshape(n, -1))         # (N, K*B)
                else:
                    states, losses, preds = train_step(
                        states, batch, y, weight, m_list, gb_w)
                    dev_losses.append(losses)
                    dev_preds.append(preds)
                all_labels.append(np.asarray(labels).reshape(-1))
        else:
            for batch, labels in threaded_batches(train_ds, idx_iter, put):
                states, losses, preds = train_step(states, batch,
                                                   jnp.asarray(labels), weight,
                                                   m_list, gb_w)
                dev_losses.append(losses)          # (N,)
                dev_preds.append(preds)            # (N, B)
                all_labels.append(np.asarray(labels))
        tr_loss = np.asarray(jnp.sum(jnp.stack(dev_losses), axis=0))  # (N,)
        preds_all = np.concatenate([np.asarray(p) for p in dev_preds], axis=1)
        labels_all = np.concatenate(all_labels)
        n_samples = max(len(labels_all), 1)

        # --- valid
        v_losses, v_preds, v_labels, v_masks = [], [], [], []
        for idx, mask in eval_batches(len(valid_ds), train_cfg.batch_size):
            batch, labels = valid_ds.batch(idx)
            if put is not None:
                batch, labels = put((batch, labels))
            losses, _, preds = eval_step(states, batch, jnp.asarray(labels),
                                         weight, m_list, gb_w,
                                         jnp.asarray(mask, jnp.float32))
            v_losses.append(losses)
            v_preds.append(preds)
            v_labels.append(np.asarray(labels))
            v_masks.append(mask)
        va_loss = np.asarray(jnp.sum(jnp.stack(v_losses), axis=0))
        mask_all = np.concatenate(v_masks)
        v_preds_all = np.concatenate([np.asarray(p) for p in v_preds], axis=1)
        v_labels_all = np.concatenate(v_labels)[mask_all]
        nv = max(int(mask_all.sum()), 1)

        for i, s in enumerate(seeds):
            tr_f1 = macro_f1(labels_all, preds_all[i])
            va_f1 = macro_f1(v_labels_all, v_preds_all[i][mask_all])
            h = hists[i]
            h.train_loss.append(float(tr_loss[i]) / n_samples)
            h.valid_loss.append(float(va_loss[i]) / nv)
            h.train_f1.append(tr_f1); h.valid_f1.append(va_f1)
            h.train_acc.append(accuracy(labels_all, preds_all[i]))
            h.valid_acc.append(accuracy(v_labels_all, v_preds_all[i][mask_all]))
            member = unstack_ensemble(states, i)
            save_checkpoint(member, os.path.join(
                train_cfg.weight_dir, f"{tag}_seed_{s}_last.ckpt"))
            if va_f1 > best_f1[i]:
                best_f1[i] = va_f1
                h.best_f1 = va_f1
                h.best_epoch = epoch
                save_checkpoint(member, os.path.join(
                    train_cfg.weight_dir, f"{tag}_seed_{s}_best.ckpt"),
                    extra={"epoch": epoch, "valid_f1": va_f1, "seed": int(s)})

        if train_cfg.verbose and epoch % train_cfg.verbose == 0:
            f1s = " ".join(f"{hists[i].valid_f1[-1]:.3f}" for i in range(n))
            print(f"epoch {epoch+1:3d} | ensemble valid f1 [{f1s}]")

    return states, hists
