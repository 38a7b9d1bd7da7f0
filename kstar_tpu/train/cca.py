"""Deep CCA training for multimodal encoder alignment.

Rebuild of reference src/CCA.py: a paired-encoder wrapper (DeepCCA :8-21)
trained with the negative-canonical-correlation loss (kstar_tpu/losses.py:
cca_loss) via its own loop (reference train_cca :178-222). Used to pre-align
the video and 0D latent spaces before fusion fine-tuning.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..losses import cca_loss
from .state import TrainState


def make_cca_step(model, out_dim: int, use_all_singular_values: bool = False):
    """Jitted CCA train step for a fusion model exposing ``encode``:
    maximizes canonical correlation between the two modality latents."""

    def step(state: TrainState, batch):
        # deterministic: every fusion encode method runs train=False, so no
        # noise/dropout rng streams are consumed during CCA pretraining
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            _, h_vis, h_ts = model.apply(variables, batch["video"], batch["0D"],
                                         method="encode")
            return cca_loss(h_vis, h_ts, out_dim, use_all_singular_values)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        finite = jnp.isfinite(loss)
        grads = jax.tree.map(lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        new_state = state.apply_gradients(grads)
        return new_state, loss

    return jax.jit(step)


def train_cca(model, state: TrainState, train_ds, batch_size: int = 32,
              n_epochs: int = 8, out_dim: int = 16, seed: int = 42,
              put=None) -> Tuple[TrainState, list]:
    """CCA pre-training loop (reference train_cca, src/CCA.py:178-222)."""
    from ..data.loader import epoch_batches

    step = make_cca_step(model, out_dim)
    rng = np.random.default_rng(seed)
    losses = []
    for _ in range(n_epochs):
        total, n = 0.0, 0
        for idx in epoch_batches(len(train_ds), batch_size, rng):
            batch, _ = train_ds.batch(idx)
            if put is not None:
                batch, _ = put((batch, np.zeros(len(idx))))
            state, loss = step(state, batch)
            total += float(loss)
            n += 1
        losses.append(total / max(n, 1))
    return state, losses
