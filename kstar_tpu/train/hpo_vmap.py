"""Whole-ASHA-rung training as ONE compiled program (vmap over trials).

The reference runs HPO trials as separate Ray Tune workers, one process per
GPU (reference hyperparameter_tuning.py:527-546). On a TPU the small 0D
models leave the chip almost idle (1-3% MFU solo, PERFORMANCE.md), so a
rung of N same-architecture trials trains as one ``jax.vmap``-ed step —
the train/ensemble.py pattern, extended so the *hyperparameters* that vary
across trials are traced inputs instead of compile-time constants:

  * learning rate — ``optax.inject_hyperparams`` moves it into the
    opt_state, so stacking N states yields a per-trial lr leaf that vmap
    carries automatically;
  * focal gamma — an explicit (N,) step input (the standard step bakes it
    in statically, train/loop.py _train_step_core).

Trials whose ARCHITECTURE differs (different fcn_dim/feature_dims/
batch_size draws) cannot share a program — run_asha groups each rung by
the non-traced config keys and advances each group in one call; the thread
pool remains the fallback for anything ungroupable.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import LossConfig, OptimConfig
from ..losses import classification_loss
from .loop import _loss_aux, _model_outputs, guarded_update
from .metrics import macro_f1
from .state import TrainState, create_train_state

TRACED_KEYS = ("lr", "focal_gamma")


def group_key(config: Dict) -> tuple:
    """Hashable architecture key: everything vmap can NOT trace over."""
    return tuple(sorted((k, str(v)) for k, v in config.items()
                        if k not in TRACED_KEYS))


def make_hpo_optimizer(optim_cfg: OptimConfig, steps_per_epoch: int = 1):
    """make_optimizer (train/state.py:42-67) with the learning rate routed
    through ``inject_hyperparams``: lr becomes an opt_state array leaf, so
    trials with different lrs share one tx object (static pytree field) and
    differ only in data. The StepLR-style staircase decay is applied as a
    post-``scale_by_schedule`` factor — every supported optimizer's update
    is linear in lr, so scaling the update by gamma^(step//k) is exactly
    equal to make_optimizer's exponential_decay(lr) while keeping the BASE
    lr a per-trial traced leaf."""
    name = optim_cfg.optimizer.lower()
    # NOTE: inject_hyperparams passes learning_rate by keyword, so the sgd
    # wrapper's parameter must be named learning_rate (optax.sgd's own name)
    inner = {"sgd": lambda learning_rate: optax.sgd(learning_rate, momentum=0.9),
             "rmsprop": optax.rmsprop, "rmsprops": optax.rmsprop,
             "adam": optax.adam}.get(name, optax.adamw)
    tx = optax.inject_hyperparams(inner)(learning_rate=optim_cfg.lr)
    chain = []
    if optim_cfg.max_norm_grad is not None:
        chain.append(optax.clip_by_global_norm(optim_cfg.max_norm_grad))
    chain.append(tx)
    if optim_cfg.use_scheduler:
        decay = optax.exponential_decay(
            1.0, transition_steps=optim_cfg.step_size * steps_per_epoch,
            decay_rate=optim_cfg.gamma, staircase=True)
        chain.append(optax.scale_by_schedule(decay))
    return optax.chain(*chain)


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Override the injected lr leaf of a make_hpo_optimizer state."""
    import optax.tree_utils as otu
    return state.replace(opt_state=otu.tree_set(
        state.opt_state, learning_rate=jnp.asarray(lr, jnp.float32)))


def make_rung_step(model, loss_type: str, ldam_s: float = 1.0) -> Callable:
    """Vmapped train step with per-trial focal gamma.

    step(states, batch, labels, weight, m_list, gammas (N,))
        -> (states, losses (N,))

    The body mirrors _train_step_core (train/loop.py:52-104: rng fold-in,
    NaN-skip guard, donated state) for the 'single' model type, except that
    ``gamma`` arrives as a traced input so one program serves every trial.
    """

    def one(st: TrainState, batch, labels, weight, m_list, gamma):
        rng = jax.random.fold_in(st.rng, st.step)
        noise_rng, drop_rng = jax.random.split(rng)
        rngs = {"noise": noise_rng, "dropout": drop_rng}

        def loss_fn(params):
            out, new_stats = _model_outputs(model, params, st.batch_stats,
                                            batch, True, rngs, "single")
            loss = classification_loss(out, labels, loss_type, weight=weight,
                                       gamma=gamma, m_list=m_list, s=ldam_s)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        return guarded_update(st, grads, new_stats, jnp.isfinite(loss)), loss

    def step(states, batch, labels, weight, m_list, gammas):
        return jax.vmap(
            lambda st, g: one(st, batch, labels, weight, m_list, g)
        )(states, gammas)

    return jax.jit(step, donate_argnums=(0,))


def make_group_trainable_0d(
    make_model: Callable[[Dict], object],
    train_ds,
    valid_ds,
    seed: int = 42,
    loss_type: str = "Focal",
) -> Callable:
    """Build run_asha's ``group_trainable`` for the 0D models.

    group_trainable(configs, n_epochs, carries) -> (carries, scores) where
    every config in the group shares group_key(config); carries are
    per-trial ``(model, solo_state, None)`` tuples (the same layout the
    thread-pool trainable returns, so the caller's best-trial evaluation
    works unchanged). Scores are per-trial per-epoch valid macro-F1.
    """
    from ..data.loader import epoch_batches, eval_batches, threaded_batches
    from .ensemble import make_ensemble_eval, unstack_ensemble

    step_cache: Dict[tuple, Tuple] = {}

    def group_trainable(configs: Sequence[Dict], n_epochs: int,
                        carries: Sequence[Optional[tuple]]):
        n = len(configs)
        batch_size = int(configs[0].get("batch_size", 128))
        loss_cfg = LossConfig(loss_type=loss_type)

        if carries[0] is None:
            model = make_model(configs[0])
            x0, _ = train_ds.batch(np.arange(min(batch_size, len(train_ds))))
            # one shared tx (static field); per-trial lr lives in opt_state.
            # Every trial inits from the same seed — matching the thread-pool
            # trainable (cli/hpo_run.py), where each trial uses
            # key(random_seed): trials differ by hyperparameters, not init.
            tx = make_hpo_optimizer(OptimConfig(lr=1e-3))
            init = create_train_state(model, jnp.asarray(x0),
                                      jax.random.key(seed),
                                      OptimConfig(lr=1e-3))
            init = init.replace(tx=tx, opt_state=tx.init(init.params))
            solos = [set_learning_rate(init, cfg.get("lr", 1e-3))
                     for cfg in configs]
        else:
            model = carries[0][0]
            solos = [c[1] for c in carries]
        states = jax.tree.map(lambda *xs: jnp.stack(xs), *[
            s.replace(tx=solos[0].tx) for s in solos])

        key = group_key(configs[0]) + (n,)
        if key not in step_cache:
            step_cache[key] = (
                make_rung_step(model, loss_type, loss_cfg.ldam_s),
                make_ensemble_eval(model, loss_cfg),
            )
        train_step, eval_step = step_cache[key]

        gammas = jnp.asarray([c.get("focal_gamma", 2.0) for c in configs],
                             jnp.float32)
        counts = train_ds.class_counts()
        rng = np.random.default_rng(seed)
        gb = jnp.zeros(3)
        scores: List[List[float]] = [[] for _ in range(n)]

        for ep in range(n_epochs):
            w, m = _loss_aux(loss_cfg, counts, ep, max(n_epochs, 1))
            idx_iter = epoch_batches(len(train_ds), batch_size, rng)
            for batch, labels in threaded_batches(train_ds, idx_iter):
                states, _ = train_step(states, jnp.asarray(batch),
                                       jnp.asarray(labels), w, m, gammas)
            # valid macro-F1 per trial (argmax preds are gamma-independent,
            # so the shared-gamma ensemble eval scores every trial exactly)
            v_preds, v_labels, v_masks = [], [], []
            for idx, mask in eval_batches(len(valid_ds), batch_size):
                batch, labels = valid_ds.batch(idx)
                _, _, preds = eval_step(states, jnp.asarray(batch),
                                        jnp.asarray(labels), w, m, gb,
                                        jnp.asarray(mask, jnp.float32))
                v_preds.append(np.asarray(preds))
                v_labels.append(np.asarray(labels))
                v_masks.append(mask)
            mask_all = np.concatenate(v_masks)
            labels_all = np.concatenate(v_labels)[mask_all]
            preds_all = np.concatenate(v_preds, axis=1)
            for i in range(n):
                scores[i].append(macro_f1(labels_all, preds_all[i][mask_all]))

        out = [(model, unstack_ensemble(states, i), None) for i in range(n)]
        return out, scores

    return group_trainable
