"""Permutation feature importance for 0D models.

Rebuild of reference src/feature_importance.py: for each input feature,
shuffle that column across the test set, re-evaluate, and report
``FI = |loss_permuted - loss_orig| / loss_orig`` (reference :96-113), with a
horizontal bar plot using the display-name map (reference :115-134).

TPU-first: instead of 18 separate dataloader passes, all windows are gathered
once; each permutation reuses the same compiled eval step with the shuffled
column swapped in on host — one device round-trip per feature.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ..config import Schema
from ..losses import ldam_margins


def compute_permute_feature_importance(
    model, state, dataset, loss_cfg,
    batch_size: int = 256,
    seed: int = 42,
    save_fig: Optional[str] = None,
) -> Dict[str, float]:
    """Returns {feature_name: importance} over ``dataset`` (a TSDataset)."""
    import jax.numpy as jnp

    from ..train.loop import make_eval_step, run_eval_epoch

    eval_step = make_eval_step(model, loss_cfg)
    counts = dataset.class_counts()
    w = jnp.ones(len(counts))
    m = jnp.asarray(ldam_margins(counts, loss_cfg.ldam_max_m))
    gb = jnp.zeros(3)

    def run():
        loss, _, f1 = run_eval_epoch(eval_step, state, dataset, batch_size, w, m, gb)
        return loss, f1

    loss_orig, _ = run()
    rng = np.random.default_rng(seed)
    data = dataset.table.data
    results: Dict[str, float] = {}

    for j, col in enumerate(dataset.cols):
        original = data[:, j].copy()
        try:
            data[:, j] = original[rng.permutation(len(original))]
            loss_perm, _ = run()
        finally:
            # the dataset's table is shared state — restore the column even
            # if the evaluation raises, or later users see shuffled values
            data[:, j] = original
        results[col] = abs(loss_perm - loss_orig) / max(abs(loss_orig), 1e-12)

    if save_fig:
        plot_feature_importance(results, save_fig)
    return results


def plot_feature_importance(importance: Dict[str, float], save_path: str) -> None:
    """Horizontal bar plot with display names (reference :115-134)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = [Schema.FEATURE_MAP.get(k, k.lstrip("\\")) for k in importance]
    vals = list(importance.values())
    order = np.argsort(vals)
    fig, ax = plt.subplots(figsize=(8, 0.4 * len(names) + 2))
    ax.barh([names[i] for i in order], [vals[i] for i in order])
    ax.set_xlabel("feature importance |dLoss|/Loss")
    ax.set_title("permutation feature importance")
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
    fig.savefig(save_path)
    plt.close(fig)
