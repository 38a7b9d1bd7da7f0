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


def render_model_graph(model, *sample_args, save_path: str,
                       depth: int = 3, title: Optional[str] = None) -> str:
    """Render the module hierarchy as a layered box-and-edge diagram
    (replaces the reference's torchviz/hiddenlayer graphs,
    reference plot_model_structure.py:1-3): one column per module depth,
    a box per submodule annotated with its parameter count, edges from
    parent to child. Pure matplotlib — no graphviz dependency."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    variables = model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1),
         "dropout": jax.random.key(2)},
        *sample_args, train=False)
    params = variables.get("params", {})

    def count(tree) -> int:
        return sum(int(x.size) for x in jax.tree.leaves(tree))

    # flatten the module tree to (path, n_params) nodes up to `depth`
    nodes = {(): count(params)}

    def walk(tree, path):
        if len(path) >= depth or not isinstance(tree, dict):
            return
        for name, sub in tree.items():
            if not isinstance(sub, dict):
                continue      # leaf arrays (kernel/bias) are not modules
            nodes[path + (name,)] = count(sub)
            walk(sub, path + (name,))

    walk(params, ())

    # leaf-first vertical layout: each childless node takes a row; parents
    # center on their children
    children = {p: [q for q in nodes if q[:-1] == p and len(q) == len(p) + 1]
                for p in nodes}
    ys: dict = {}
    next_row = [0.0]

    def place(p):
        ch = children[p]
        if not ch:
            ys[p] = next_row[0]
            next_row[0] += 1.0
            return ys[p]
        ys[p] = float(np.mean([place(c) for c in ch]))
        return ys[p]

    place(())

    fig_h = max(2.5, 0.42 * next_row[0] + 1)
    fig_w = 3.2 * (depth + 1)
    fig, ax = plt.subplots(figsize=(fig_w, fig_h))
    root_name = type(model).__name__

    def fmt(n):
        return f"{n/1e6:.2f}M" if n >= 1e6 else (f"{n/1e3:.1f}k" if n >= 1e3 else str(n))

    for path, n in nodes.items():
        x, y = len(path), ys[path]
        label = (path[-1] if path else root_name) + f"\n{fmt(n)} params"
        ax.text(x, y, label, ha="center", va="center", fontsize=7,
                bbox=dict(boxstyle="round,pad=0.35", fc="#e8f0fe", ec="#4472c4"))
        if path:
            ax.plot([x - 1 + 0.32, x - 0.32], [ys[path[:-1]], y],
                    color="#888888", lw=0.8, zorder=0)

    ax.set_xlim(-0.6, depth + 0.6)
    ax.set_ylim(-1, next_row[0])
    ax.invert_yaxis()
    ax.axis("off")
    ax.set_title(title or f"{root_name} module graph "
                 f"({fmt(count(params))} parameters)")
    fig.tight_layout()
    import os
    os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
    fig.savefig(save_path, dpi=130)
    plt.close(fig)
    return save_path
