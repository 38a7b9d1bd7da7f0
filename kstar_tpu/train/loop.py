"""Jitted train/eval steps + epoch drivers.

Rebuild of reference src/train.py (train_per_epoch/valid_per_epoch/train/
train_DRW) designed for XLA:

  * one traced train step per (model, loss_type): class weights, LDAM
    margins, and GB weights are traced *inputs*, so DRW / dynamic GB never
    recompile;
  * the NaN-loss skip guard (reference src/train.py:56-58) is a
    ``jnp.where`` select inside the step — no host sync;
  * static batch shapes (loaders drop/pad), donated state;
  * metrics (macro-F1) accumulate host-side from device preds, exactly like
    the reference's sklearn f1_score over concatenated epoch predictions.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LossConfig, TrainConfig
from ..losses import (classification_loss, drw_weights, gradient_blending_loss,
                      inverse_freq_weights, ldam_margins)
from .early_stopping import EarlyStopping
from .logging import MetricWriter
from .metrics import accuracy, macro_f1
from .state import TrainState, save_checkpoint


def _model_outputs(model, params, batch_stats, batch, train: bool, rngs, model_type: str):
    """Apply the model for either modality layout. Returns (outputs, new_stats);
    outputs is logits or a (multi, vis, ts) tuple for model_type='multi-GB'."""
    variables = {"params": params, "batch_stats": batch_stats}
    if model_type == "single":
        args = (batch,)
    else:
        args = (batch["video"], batch["0D"])
    if train:
        out, mut = model.apply(variables, *args, train=True, rngs=rngs,
                               mutable=["batch_stats"])
        return out, mut.get("batch_stats", batch_stats)
    out = model.apply(variables, *args, train=False)
    return out, batch_stats


def _train_step_core(model, loss_cfg: LossConfig, model_type: str = "single",
                     loss_scale: float = 1.0, pre_fn: Optional[Callable] = None) -> Callable:
    """Pure (un-jitted) train step — shared by make_train_step (one step per
    dispatch) and make_scan_steps (K steps per dispatch)."""
    loss_type = loss_cfg.loss_type
    gamma = loss_cfg.focal_gamma
    s = loss_cfg.ldam_s

    def step(state: TrainState, batch, labels, weight, m_list, gb_w):
        rng = jax.random.fold_in(state.rng, state.step)
        noise_rng, drop_rng, pre_rng = jax.random.split(rng, 3)
        rngs = {"noise": noise_rng, "dropout": drop_rng}
        if pre_fn is not None:
            batch = pre_fn(pre_rng, batch)

        def loss_fn(params):
            out, new_stats = _model_outputs(model, params, state.batch_stats,
                                            batch, True, rngs, model_type)
            if model_type == "multi-GB":
                out_multi, out_vis, out_ts = out
                loss = gradient_blending_loss(
                    out_multi, out_vis, out_ts, labels, gb_w,
                    loss_type=loss_type, weight=weight, gamma=gamma,
                    m_list=m_list, s=s, loss_scale=loss_scale,
                )
                logits = out_multi
            else:
                loss = classification_loss(out, labels, loss_type, weight=weight,
                                           gamma=gamma, m_list=m_list, s=s)
                logits = out
            return loss, (logits, new_stats)

        (loss, (logits, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = guarded_update(state, grads, new_stats, jnp.isfinite(loss))
        preds = jnp.argmax(logits, axis=-1)
        return new_state, loss, preds

    return step


def guarded_update(state: "TrainState", grads, new_stats, finite) -> "TrainState":
    """NaN-loss skip guard, shared by every train-step core (this file,
    train/gb.py, train/hpo_vmap.py): zero the gradients and keep the old
    params/stats/opt_state/step when the loss is non-finite, so one bad
    batch cannot poison the run (the reference simply crashes on NaN)."""
    grads = jax.tree.map(lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
    candidate = state.apply_gradients(grads, new_batch_stats=new_stats)
    sel = lambda new, old: jax.tree.map(lambda n, o: jnp.where(finite, n, o), new, old)
    return state.replace(
        step=jnp.where(finite, candidate.step, state.step),
        params=sel(candidate.params, state.params),
        batch_stats=sel(candidate.batch_stats, state.batch_stats),
        opt_state=sel(candidate.opt_state, state.opt_state),
    )


def make_train_step(model, loss_cfg: LossConfig, model_type: str = "single",
                    loss_scale: float = 1.0, pre_fn: Optional[Callable] = None) -> Callable:
    """Build the jitted train step.

    step(state, batch, labels, weight, m_list, gb_w) -> (state, loss, preds)

    pre_fn(key, batch) — optional in-graph preprocessing (crop / augment /
    normalize of raw uint8 video), fused into the same dispatch as the
    forward/backward instead of costing a separate device round-trip.
    """
    return jax.jit(_train_step_core(model, loss_cfg, model_type, loss_scale, pre_fn),
                   donate_argnums=(0,))


def make_scan_steps(model, loss_cfg: LossConfig, model_type: str = "single",
                    loss_scale: float = 1.0, pre_fn: Optional[Callable] = None) -> Callable:
    """Multi-step train program: K steps in ONE dispatch via ``lax.scan``.

    multi_step(state, batches, labels, weight, m_list, gb_w)
        -> (state, losses (K,), preds (K, B))

    ``batches``/``labels`` carry a leading step axis (K, B, ...) — a stack of
    K batches resident in device memory. Because the per-step rng derives
    from ``fold_in(state.rng, state.step)`` and ``state.step`` advances
    inside the scan, the result is numerically equivalent to K sequential
    ``make_train_step`` calls — same traced step function, same rng stream,
    differing only by XLA reassociation (tests/test_train_e2e.py asserts
    SGD-trajectory equality) — this only changes how much work ships per
    dispatch. Through a high-latency
    link (the axon relay here costs ~25 ms per round-trip, comparable to a
    whole fused ViViT step) scanning K steps amortizes that fixed cost K-way;
    XLA compiles the scan body once, so compile time matches the single step.
    """
    step_core = _train_step_core(model, loss_cfg, model_type, loss_scale, pre_fn)

    def multi_step(state: TrainState, batches, labels, weight, m_list, gb_w):
        def body(st, xs):
            b, y = xs
            st, loss, preds = step_core(st, b, y, weight, m_list, gb_w)
            return st, (loss, preds)

        state, (losses, preds) = jax.lax.scan(body, state, (batches, labels))
        return state, losses, preds

    return jax.jit(multi_step, donate_argnums=(0,))


def _eval_step_core(model, loss_cfg: LossConfig, model_type: str = "single",
                    loss_scale: float = 1.0, pre_fn: Optional[Callable] = None) -> Callable:
    """Pure (un-jitted) eval step — shared by make_eval_step and the
    vmapped ensemble eval (train/ensemble.py)."""
    loss_type = loss_cfg.loss_type
    gamma = loss_cfg.focal_gamma
    s = loss_cfg.ldam_s

    def step(state: TrainState, batch, labels, weight, m_list, gb_w, mask):
        if pre_fn is not None:
            batch = pre_fn(None, batch)
        out, _ = _model_outputs(model, state.params, state.batch_stats,
                                batch, False, None, model_type)
        if model_type == "multi-GB":
            out_multi, out_vis, out_ts = out
            loss = gradient_blending_loss(
                out_multi, out_vis, out_ts, labels, gb_w,
                loss_type=loss_type, weight=weight, mask=mask,
                gamma=gamma, m_list=m_list, s=s, loss_scale=loss_scale,
            )
            logits = out_multi
        else:
            loss = classification_loss(out, labels, loss_type, weight=weight,
                                       mask=mask, gamma=gamma, m_list=m_list, s=s)
            logits = out
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        preds = jnp.argmax(logits, axis=-1)
        return loss, probs, preds

    return step


def make_eval_step(model, loss_cfg: LossConfig, model_type: str = "single",
                   loss_scale: float = 1.0, pre_fn: Optional[Callable] = None) -> Callable:
    """eval_step(state, batch, labels, weight, m_list, gb_w, mask)
    -> (loss, probs, preds); probs = softmax(logits)."""
    return jax.jit(_eval_step_core(model, loss_cfg, model_type, loss_scale, pre_fn))


# ---------------------------------------------------------------------------
# epoch drivers
# ---------------------------------------------------------------------------

@dataclass
class History:
    train_loss: List[float] = field(default_factory=list)
    valid_loss: List[float] = field(default_factory=list)
    train_f1: List[float] = field(default_factory=list)
    valid_f1: List[float] = field(default_factory=list)
    train_acc: List[float] = field(default_factory=list)
    valid_acc: List[float] = field(default_factory=list)
    epoch_s: List[float] = field(default_factory=list)   # wall-clock per epoch
    best_epoch: int = 0
    best_f1: float = 0.0


def _loss_aux(loss_cfg: LossConfig, cls_counts: np.ndarray, epoch: int, num_epoch: int):
    """Per-epoch (weight, m_list) arrays for the step fns."""
    if loss_cfg.use_drw:
        weight = jnp.asarray(drw_weights(epoch, num_epoch, cls_counts, loss_cfg.drw_beta))
    elif loss_cfg.use_weighting:
        weight = jnp.asarray(inverse_freq_weights(cls_counts))
    else:
        weight = jnp.ones(len(cls_counts), jnp.float32)
    m_list = jnp.asarray(ldam_margins(cls_counts, loss_cfg.ldam_max_m))
    return weight, m_list


def run_train_epoch(train_step, state, dataset, batch_size, rng, weight, m_list,
                    gb_w, sampler=None, put=None, prefetch=True,
                    scan_step=None, steps_per_dispatch: int = 1,
                    put_stack=None):
    """One training epoch, fully pipelined: batches are gathered (and put on
    device) ahead of consumption, and per-step losses/preds stay ON DEVICE —
    the host fetches them once at epoch end, so step N+1 dispatches while
    step N runs (a per-step ``float(loss)`` costs one host round-trip per
    step — ~25 ms through the axon relay, more than a ViViT step itself).

    scan_step + steps_per_dispatch > 1: full groups of K batches run as ONE
    multi-step dispatch (make_scan_steps); the remainder uses ``train_step``.
    Numerically identical to the per-step path."""
    from ..data.loader import (epoch_batches, grouped_batches,
                               prefetch_to_device, threaded_batches)

    n_samples = 0
    dev_losses, dev_preds, all_labels = [], [], []
    idx_iter = epoch_batches(len(dataset), batch_size, rng, sampler=sampler)

    if scan_step is not None and steps_per_dispatch > 1:
        for kind, (batch, labels) in grouped_batches(dataset, idx_iter,
                                                     steps_per_dispatch, put,
                                                     put_stack=put_stack):
            if kind == "stack":
                state, losses_k, preds_k = scan_step(
                    state, batch, jnp.asarray(labels), weight, m_list, gb_w)
                dev_losses.append(jnp.sum(losses_k))
                dev_preds.append(preds_k.reshape(-1))
            else:
                state, loss, preds = train_step(state, batch, jnp.asarray(labels),
                                                weight, m_list, gb_w)
                dev_losses.append(loss)
                dev_preds.append(preds)
            n_samples += int(np.asarray(labels).size)
            all_labels.append(np.asarray(labels).reshape(-1))
    else:
        if prefetch:
            # background host gather (+ device put) overlaps TPU compute
            batch_iter = threaded_batches(dataset, idx_iter, put)
        else:
            def _host():
                for idx in idx_iter:
                    yield dataset.batch(idx)
            batch_iter = (prefetch_to_device(_host(), put) if put is not None
                          else _host())
        for batch, labels in batch_iter:
            state, loss, preds = train_step(state, batch, jnp.asarray(labels),
                                            weight, m_list, gb_w)
            dev_losses.append(loss)
            dev_preds.append(preds)
            n_samples += batch_size
            all_labels.append(np.asarray(labels))
    if n_samples == 0:
        return state, 0.0, 0.0, 0.0
    losses = float(jnp.sum(jnp.stack(dev_losses)))   # single host sync
    preds = np.concatenate([np.asarray(p) for p in dev_preds])
    labels = np.concatenate(all_labels)
    return state, losses / n_samples, accuracy(labels, preds), macro_f1(labels, preds)


def run_eval_epoch(eval_step, state, dataset, batch_size, weight, m_list, gb_w,
                   put=None, collect_probs: bool = False):
    from ..data.loader import eval_batches

    n_samples = 0
    dev_losses, dev_preds, dev_probs, all_labels, all_masks = [], [], [], [], []
    for idx, mask in eval_batches(len(dataset), batch_size):
        batch, labels = dataset.batch(idx)
        if put is not None:
            batch, labels = put((batch, labels))
        loss, probs, preds = eval_step(state, batch, jnp.asarray(labels),
                                       weight, m_list, gb_w, jnp.asarray(mask, jnp.float32))
        dev_losses.append(loss)
        dev_preds.append(preds)
        if collect_probs:
            dev_probs.append(probs)
        n_samples += int(mask.sum())
        all_labels.append(np.asarray(labels))
        all_masks.append(mask)
    if n_samples == 0:
        out = (0.0, 0.0, 0.0)
        return out + ((np.zeros((0, 2)), np.zeros((0,))),) if collect_probs else out
    # device results fetched once after every batch is dispatched
    losses = float(jnp.sum(jnp.stack(dev_losses)))
    mask_all = np.concatenate(all_masks)
    preds = np.concatenate([np.asarray(p) for p in dev_preds])[mask_all]
    labels = np.concatenate(all_labels)[mask_all]
    res = (losses / n_samples, accuracy(labels, preds), macro_f1(labels, preds))
    if collect_probs:
        probs_all = np.concatenate([np.asarray(p) for p in dev_probs])[mask_all]
        return res + ((probs_all, labels),)
    return res


def fit(
    model,
    state: TrainState,
    train_ds,
    valid_ds,
    train_cfg: TrainConfig,
    loss_cfg: LossConfig,
    model_type: str = "single",
    tag: str = "model",
    sampler=None,
    writer: Optional[MetricWriter] = None,
    gb_weights: Optional[np.ndarray] = None,
    num_epoch: Optional[int] = None,
    put=None,
    put_eval=None,
    pre_fn=None,
    pre_fn_eval=None,
    put_stack=None,
    eval_stats_fn=None,
) -> Tuple[TrainState, History]:
    """Epoch driver covering the reference's ``train`` and ``train_DRW``
    (src/train.py:147-274, :277-422): per-epoch train/valid, metric logging,
    last/best checkpointing on valid macro-F1, early stopping, optional DRW.

    ``eval_stats_fn(batch_stats) -> batch_stats`` runs after each train epoch
    and PERSISTS into the state (so checkpoints carry it) — the SubBatchNorm
    aggregate-before-eval contract (reference aggregate_stats,
    src/models/resnet.py:52-61, which writes the aggregated stats into the
    module in place)."""
    num_epoch = num_epoch or train_cfg.num_epoch
    train_step = make_train_step(model, loss_cfg, model_type, pre_fn=pre_fn)
    eval_step = make_eval_step(model, loss_cfg, model_type, pre_fn=pre_fn_eval)
    k = getattr(train_cfg, "steps_per_dispatch", 1)
    scan_step = (make_scan_steps(model, loss_cfg, model_type, pre_fn=pre_fn)
                 if k > 1 else None)

    cls_counts = train_ds.class_counts()
    gb_w = jnp.asarray(gb_weights if gb_weights is not None else np.zeros(3, np.float32))

    rng = np.random.default_rng(train_cfg.seed)
    stopper = EarlyStopping(train_cfg.early_stopping_patience,
                            train_cfg.early_stopping_delta) if train_cfg.early_stopping else None
    hist = History()

    os.makedirs(train_cfg.weight_dir, exist_ok=True)
    last_path = os.path.join(train_cfg.weight_dir, f"{tag}_last.ckpt")
    best_path = os.path.join(train_cfg.weight_dir, f"{tag}_best.ckpt")

    import time as _time
    for epoch in range(num_epoch):
        weight, m_list = _loss_aux(loss_cfg, cls_counts, epoch, num_epoch)

        t_ep = _time.perf_counter()
        state, tr_loss, tr_acc, tr_f1 = run_train_epoch(
            train_step, state, train_ds, train_cfg.batch_size, rng,
            weight, m_list, gb_w, sampler=sampler, put=put,
            scan_step=scan_step, steps_per_dispatch=k, put_stack=put_stack)
        if eval_stats_fn is not None:
            state = state.replace(batch_stats=eval_stats_fn(state.batch_stats))
        # probs collected here feed the improvement figure below — the eval
        # step computes them either way, so this costs one host transfer,
        # not a second validation epoch
        va_loss, va_acc, va_f1, va_probs = run_eval_epoch(
            eval_step, state, valid_ds, train_cfg.batch_size,
            weight, m_list, gb_w, put=put_eval if put_eval is not None else put,
            collect_probs=True)
        ep_s = _time.perf_counter() - t_ep

        hist.train_loss.append(tr_loss); hist.valid_loss.append(va_loss)
        hist.train_acc.append(tr_acc); hist.valid_acc.append(va_acc)
        hist.train_f1.append(tr_f1); hist.valid_f1.append(va_f1)
        hist.epoch_s.append(ep_s)

        if writer:
            writer.scalars({"Loss/train": tr_loss, "Loss/valid": va_loss,
                            "F1/train": tr_f1, "F1/valid": va_f1,
                            "time/epoch_s": ep_s}, epoch)
        if train_cfg.verbose and epoch % train_cfg.verbose == 0:
            print(f"epoch {epoch+1:3d} | train loss {tr_loss:.4f} f1 {tr_f1:.4f} "
                  f"| valid loss {va_loss:.4f} f1 {va_f1:.4f} | {ep_s:.1f}s")

        save_checkpoint(state, last_path)
        improved = stopper(va_f1) if stopper else va_f1 > hist.best_f1
        if improved:
            hist.best_f1 = va_f1
            hist.best_epoch = epoch
            save_checkpoint(state, best_path, extra={"epoch": epoch, "valid_f1": va_f1})
            if writer:
                # evaluation figure on improvement (the reference emits one
                # per epoch via evaluate_tensorboard, src/train.py:242-245)
                try:
                    from ..eval.evaluate import evaluate_probs, evaluation_figure
                    probs, labels = va_probs
                    fig = evaluation_figure(evaluate_probs(probs, labels))
                    writer.figure("eval/valid", fig, epoch)
                    import matplotlib.pyplot as plt
                    plt.close(fig)
                except Exception as e:  # figure emission is best-effort,
                    # but a broken pipeline must surface in the logs
                    print(f"[fit] eval figure emission failed: {type(e).__name__}: {e}")
        if stopper and stopper.should_stop:
            print(f"early stopping at epoch {epoch+1}")
            break

    return state, hist
