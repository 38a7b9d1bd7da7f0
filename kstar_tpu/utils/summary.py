"""Model structure summaries (rebuild of reference plot_model_structure.py +
the per-model ``summary()`` methods): flax ``nn.tabulate`` renders the module
tree with shapes and parameter counts — the JAX equivalent of
pytorch_model_summary / torchviz graphs."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def model_summary(model, *sample_args, save_path: Optional[str] = None,
                  depth: int = 3) -> str:
    """Tabulated module tree with parameter shapes/counts."""
    tab = nn.tabulate(
        model,
        {"params": jax.random.key(0), "noise": jax.random.key(1),
         "dropout": jax.random.key(2)},
        depth=depth,
    )
    text = tab(*sample_args, train=False)
    if save_path:
        import os
        os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
        with open(save_path, "w") as f:
            f.write(text)
    return text


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
