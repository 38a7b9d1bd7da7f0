"""Gradient Blending training (rebuild of reference src/GradientBlending.py).

Components:
  * per-stream train/eval steps — the reference gates streams by mutating
    ``model.use_stream`` and reloading checkpoints (reference :74-76); here
    each stream is a separate jitted graph over the same param pytree
    (gradients flow only into that stream's submodule);
  * ``gb_estimate`` — offline G-Blend weight estimation
    (reference GB_estimate :52-114): per stream, clone the state, train
    n epochs, measure overfitting Oi/Of and generalization G, weight
    w = G/(Of-Oi)^2, normalize;
  * ``fit_gb`` — the train_GB / train_GB_dynamic epoch driver
    (reference :165-446): GB-weighted multi-stream loss, optional periodic
    re-estimation, per-stream F1 monitoring, best/last checkpointing.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LossConfig, TrainConfig
from ..losses import classification_loss, estimate_gb_weights
from .early_stopping import EarlyStopping
from .logging import MetricWriter
from .loop import (History, _loss_aux, guarded_update, make_eval_step,
                   make_scan_steps, make_train_step, run_eval_epoch,
                   run_train_epoch)
from .metrics import macro_f1
from .state import TrainState, save_checkpoint

STREAMS = ("video", "0D", "multi")


def _stream_step_core(model, loss_cfg: LossConfig, stream: str,
                      pre_fn: Optional[Callable] = None) -> Callable:
    """Pure (un-jitted) per-stream train step — shared by make_stream_step
    (one step per dispatch) and make_stream_scan_steps (K per dispatch)."""
    loss_type, gamma, s = loss_cfg.loss_type, loss_cfg.focal_gamma, loss_cfg.ldam_s

    def step(state: TrainState, batch, labels, weight, m_list):
        rng = jax.random.fold_in(state.rng, state.step)
        noise_rng, drop_rng, pre_rng = jax.random.split(rng, 3)
        rngs = {"noise": noise_rng, "dropout": drop_rng}
        if pre_fn is not None:
            batch = pre_fn(pre_rng, batch)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if stream == "video":
                out, mut = model.apply(variables, batch["video"], train=True,
                                       rngs=rngs, mutable=["batch_stats"],
                                       method="forward_video")
            elif stream == "0D":
                out, mut = model.apply(variables, batch["0D"], train=True,
                                       rngs=rngs, mutable=["batch_stats"],
                                       method="forward_ts")
            else:
                (out, _, _), mut = model.apply(variables, batch["video"], batch["0D"],
                                               train=True, rngs=rngs,
                                               mutable=["batch_stats"])
            loss = classification_loss(out, labels, loss_type, weight=weight,
                                       gamma=gamma, m_list=m_list, s=s)
            return loss, mut.get("batch_stats", state.batch_stats)

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = guarded_update(state, grads, new_stats, jnp.isfinite(loss))

        # torch skips params with grad=None, so the inactive stream must not
        # move (AdamW weight decay would otherwise shrink it): restore the
        # frozen top-level subtrees (reference GB_estimate trains one stream
        # at a time, src/GradientBlending.py:74-76)
        keep = {"video": ("vis_model",), "0D": ("ts_model",)}.get(stream)
        if keep is not None:
            new_state = new_state.replace(params={
                k: (new_state.params[k] if k in keep else state.params[k])
                for k in state.params})

        return new_state, loss

    return step


def make_stream_step(model, loss_cfg: LossConfig, stream: str,
                     pre_fn: Optional[Callable] = None) -> Callable:
    """Jitted train step for one stream of a *-GB model. ``stream`` selects
    which forward runs and which logits the loss sees. ``pre_fn(key, batch)``
    fuses raw-uint8 preprocessing into the step (train/loop.py semantics);
    streams that ignore the video modality have its preprocessing dead-code
    eliminated by XLA. NOT donated: gb_estimate probes train from a
    functional copy of the caller's state, which must stay valid."""
    return jax.jit(_stream_step_core(model, loss_cfg, stream, pre_fn))


def make_stream_scan_steps(model, loss_cfg: LossConfig, stream: str,
                           pre_fn: Optional[Callable] = None) -> Callable:
    """K probe steps in ONE dispatch (the make_scan_steps pattern,
    train/loop.py:116-146, applied to the per-stream GB probe): batches and
    labels carry a leading (K, B, ...) step axis. Numerically identical to
    K sequential make_stream_step calls (same rng fold-in over
    state.step)."""
    core = _stream_step_core(model, loss_cfg, stream, pre_fn)

    def multi_step(state: TrainState, batches, labels, weight, m_list):
        def body(st, xs):
            b, y = xs
            st, loss = core(st, b, y, weight, m_list)
            return st, loss

        return jax.lax.scan(body, state, (batches, labels))

    return jax.jit(multi_step)


def make_stream_eval(model, loss_cfg: LossConfig, stream: str,
                     pre_fn: Optional[Callable] = None) -> Callable:
    loss_type, gamma, s = loss_cfg.loss_type, loss_cfg.focal_gamma, loss_cfg.ldam_s

    def step(state: TrainState, batch, labels, weight, m_list, mask):
        if pre_fn is not None:
            batch = pre_fn(None, batch)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if stream == "video":
            out = model.apply(variables, batch["video"], train=False, method="forward_video")
        elif stream == "0D":
            out = model.apply(variables, batch["0D"], train=False, method="forward_ts")
        else:
            out, _, _ = model.apply(variables, batch["video"], batch["0D"], train=False)
        loss = classification_loss(out, labels, loss_type, weight=weight, mask=mask,
                                   gamma=gamma, m_list=m_list, s=s)
        preds = jnp.argmax(out, axis=-1)
        return loss, preds

    return jax.jit(step)


def _epoch_stream(step, state, dataset, batch_size, rng, weight, m_list, put=None,
                  scan_step=None, steps_per_dispatch: int = 1, put_stack=None):
    from ..data.loader import epoch_batches, grouped_batches, threaded_batches

    dev_losses, n = [], 0
    idx_iter = epoch_batches(len(dataset), batch_size, rng)
    if scan_step is not None and steps_per_dispatch > 1:
        # full groups of K batches run as ONE multi-step dispatch; the
        # remainder uses the per-step program (run_train_epoch's pattern)
        for kind, (batch, labels) in grouped_batches(
                dataset, idx_iter, steps_per_dispatch, put, put_stack=put_stack):
            y = jnp.asarray(labels)
            if kind == "stack":
                state, losses_k = scan_step(state, batch, y, weight, m_list)
                dev_losses.append(jnp.sum(losses_k))
            else:
                state, loss = step(state, batch, y, weight, m_list)
                dev_losses.append(loss)
            n += int(np.asarray(labels).size)
    else:
        for batch, labels in threaded_batches(dataset, idx_iter, put):
            state, loss = step(state, batch, jnp.asarray(labels), weight, m_list)
            dev_losses.append(loss)     # stays on device; one fetch at the end
            n += len(labels)
    if n == 0:
        return state, 0.0
    return state, float(jnp.sum(jnp.stack(dev_losses))) / n


def _eval_stream(step, state, dataset, batch_size, weight, m_list, put=None):
    from ..data.loader import eval_batches

    dev_losses, dev_preds, n = [], [], 0
    labels_all, masks_all = [], []
    for idx, mask in eval_batches(len(dataset), batch_size):
        batch, labels = dataset.batch(idx)
        if put is not None:
            batch, labels = put((batch, labels))
        loss, preds = step(state, batch, jnp.asarray(labels), weight, m_list,
                           jnp.asarray(mask, jnp.float32))
        dev_losses.append(loss)
        dev_preds.append(preds)
        n += int(mask.sum())
        labels_all.append(np.asarray(labels))
        masks_all.append(mask)
    if n == 0:
        return 0.0, 0.0
    total = float(jnp.sum(jnp.stack(dev_losses)))   # single host sync
    mask_all = np.concatenate(masks_all)
    preds = np.concatenate([np.asarray(p) for p in dev_preds])[mask_all]
    labels = np.concatenate(labels_all)[mask_all]
    return total / n, macro_f1(labels, preds)


def gb_estimate(
    model, state: TrainState, train_ds, valid_ds,
    loss_cfg: LossConfig, batch_size: int, n_epochs: int = 4,
    seed: int = 42, put=None, pre_fn=None, pre_fn_eval=None,
    steps_per_dispatch: int = 1, put_stack=None,
    step_cache: Optional[Dict] = None,
) -> Dict[str, float]:
    """Offline G-Blend estimate. The reference reloads last.pt per stream
    (reference :74-76); here each stream trains from a copy of the current
    functional state — no disk round-trip. steps_per_dispatch > 1 runs each
    probe epoch as ceil(steps/K) scan dispatches instead of one dispatch per
    step (the relay's per-dispatch round-trip dominates these small
    epochs). Pass a ``step_cache`` dict when calling repeatedly (fit_gb's
    dynamic re-estimation does) so the per-stream jitted programs are built
    once instead of retraced+recompiled on every call."""
    counts = train_ds.class_counts()
    weight, m_list = _loss_aux(loss_cfg, counts, 0, max(n_epochs, 1))

    train_hist: Dict[str, list] = {}
    valid_hist: Dict[str, list] = {}
    rng = np.random.default_rng(seed)
    cache = step_cache if step_cache is not None else {}

    for stream in STREAMS:
        if (stream, "step") not in cache:
            cache[(stream, "step")] = make_stream_step(
                model, loss_cfg, stream, pre_fn=pre_fn)
            cache[(stream, "scan")] = (
                make_stream_scan_steps(model, loss_cfg, stream, pre_fn=pre_fn)
                if steps_per_dispatch > 1 else None)
            cache[(stream, "eval")] = make_stream_eval(
                model, loss_cfg, stream, pre_fn=pre_fn_eval)
        step = cache[(stream, "step")]
        scan_step = cache[(stream, "scan")]
        ev = cache[(stream, "eval")]
        s = state  # functional copy: updates below never mutate the original
        tr_losses, va_losses = [], []
        for _ in range(n_epochs):
            s, tr = _epoch_stream(step, s, train_ds, batch_size, rng, weight,
                                  m_list, put, scan_step=scan_step,
                                  steps_per_dispatch=steps_per_dispatch,
                                  put_stack=put_stack)
            va, _ = _eval_stream(ev, s, valid_ds, batch_size, weight, m_list, put)
            tr_losses.append(tr)
            va_losses.append(va)
        train_hist[stream] = tr_losses
        valid_hist[stream] = va_losses

    return estimate_gb_weights(train_hist, valid_hist)


def fit_gb(
    model,
    state: TrainState,
    train_ds,
    valid_ds,
    train_cfg: TrainConfig,
    loss_cfg: LossConfig,
    tag: str = "gb",
    gb_weights: Optional[Dict[str, float]] = None,
    dynamic: bool = False,
    epoch_per_gb_estimate: int = 16,
    n_epochs_gb_estimate: int = 4,
    sampler=None,
    writer: Optional[MetricWriter] = None,
    put=None,
    pre_fn=None,
    pre_fn_eval=None,
    put_stack=None,
) -> Tuple[TrainState, History, Dict[str, float]]:
    """train_GB / train_GB_dynamic driver (reference :165-446). Initial
    weights default to the reference's w_fusion=.5, w_vis=.1, w_0D=.4
    (reference train_multimodal.py:374-385)."""
    gb_weights = gb_weights or {"video": 0.1, "0D": 0.4, "multi": 0.5}
    gb_arr = jnp.asarray([gb_weights["video"], gb_weights["0D"], gb_weights["multi"]],
                         jnp.float32)

    train_step = make_train_step(model, loss_cfg, "multi-GB", pre_fn=pre_fn)
    eval_step = make_eval_step(model, loss_cfg, "multi-GB", pre_fn=pre_fn_eval)
    k = getattr(train_cfg, "steps_per_dispatch", 1)
    scan_step = (make_scan_steps(model, loss_cfg, "multi-GB", pre_fn=pre_fn)
                 if k > 1 else None)
    stream_evals = {s: make_stream_eval(model, loss_cfg, s, pre_fn=pre_fn_eval)
                    for s in STREAMS}

    counts = train_ds.class_counts()
    rng = np.random.default_rng(train_cfg.seed)
    stopper = EarlyStopping(train_cfg.early_stopping_patience,
                            train_cfg.early_stopping_delta) if train_cfg.early_stopping else None
    hist = History()

    os.makedirs(train_cfg.weight_dir, exist_ok=True)
    last_path = os.path.join(train_cfg.weight_dir, f"{tag}_last.ckpt")
    best_path = os.path.join(train_cfg.weight_dir, f"{tag}_best.ckpt")

    gb_step_cache: Dict = {}   # shared across re-estimations: compile once
    for epoch in range(train_cfg.num_epoch):
        weight, m_list = _loss_aux(loss_cfg, counts, epoch, train_cfg.num_epoch)

        if dynamic and epoch > 0 and epoch % epoch_per_gb_estimate == 0:
            gb_weights = gb_estimate(model, state, train_ds, valid_ds, loss_cfg,
                                     train_cfg.batch_size, n_epochs_gb_estimate,
                                     train_cfg.seed, put, pre_fn=pre_fn,
                                     pre_fn_eval=pre_fn_eval,
                                     steps_per_dispatch=k, put_stack=put_stack,
                                     step_cache=gb_step_cache)
            gb_arr = jnp.asarray([gb_weights["video"], gb_weights["0D"],
                                  gb_weights["multi"]], jnp.float32)
            if writer:
                writer.scalars({f"GB/{k}": v for k, v in gb_weights.items()}, epoch)

        state, tr_loss, tr_acc, tr_f1 = run_train_epoch(
            train_step, state, train_ds, train_cfg.batch_size, rng,
            weight, m_list, gb_arr, sampler=sampler, put=put,
            scan_step=scan_step, steps_per_dispatch=k, put_stack=put_stack)
        va_loss, va_acc, va_f1 = run_eval_epoch(
            eval_step, state, valid_ds, train_cfg.batch_size, weight, m_list, gb_arr, put=put)

        hist.train_loss.append(tr_loss); hist.valid_loss.append(va_loss)
        hist.train_f1.append(tr_f1); hist.valid_f1.append(va_f1)
        hist.train_acc.append(tr_acc); hist.valid_acc.append(va_acc)

        if writer:
            writer.scalars({"Loss/train": tr_loss, "Loss/valid": va_loss,
                            "F1/train": tr_f1, "F1/valid": va_f1}, epoch)
            # per-stream valid F1 monitoring (reference evaluate_GB :116-163)
            for stream, ev in stream_evals.items():
                _, f1_s = _eval_stream(ev, state, valid_ds, train_cfg.batch_size,
                                       weight, m_list, put)
                writer.scalar(f"F1_valid/{stream}", f1_s, epoch)

        if train_cfg.verbose and epoch % train_cfg.verbose == 0:
            print(f"epoch {epoch+1:3d} | GB w={np.asarray(gb_arr).round(3)} | "
                  f"train loss {tr_loss:.4f} f1 {tr_f1:.4f} | valid f1 {va_f1:.4f}")

        save_checkpoint(state, last_path)
        improved = stopper(va_f1) if stopper else va_f1 > hist.best_f1
        if improved:
            hist.best_f1 = va_f1
            hist.best_epoch = epoch
            save_checkpoint(state, best_path, extra={"epoch": epoch, "valid_f1": va_f1,
                                                     "gb_weights": gb_weights})
        if stopper and stopper.should_stop:
            print(f"early stopping at epoch {epoch+1}")
            break

    return state, hist, gb_weights
