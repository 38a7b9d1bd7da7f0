"""Sub-batch BatchNorm + multigrid long-cycle helpers.

Rebuild of the reference's SubBatchNorm3d (src/models/resnet.py:11-61) and
``update_bn_splits_long_cycle`` (:267-273): during training, batch statistics
are computed over ``num_splits`` interleaved sub-batches (the reference's
``x.view(n//s, c*s, ...)`` groups sample ``a*s + g`` into split ``g`` — the
same interleave ``reshape(n//s, s, ...)`` produces here), each split keeps its
own running stats, and ``aggregate_stats`` folds them into one (mean, var)
pair used at eval time via the law of total variance (reference
``_get_aggregated_mean_std``, :45-50, which aggregates *variances* without
Bessel correction despite its name).

TPU-first design notes:
- ``num_splits`` is a static module field, so the whole train step stays a
  single traced program — the per-split stats are one ``(splits, C)`` reshape
  + reduction, not a Python loop over splits.
- The multigrid long cycle changes ``num_splits`` between cycles; in torch the
  reference mutates the module and re-allocates ``split_bn`` in place. Here
  the model definition is immutable, so the cycle is two pure steps: rebuild
  the module with the new ``bn_splits`` (a retrace, amortized over the cycle)
  and map the old variables through :func:`reset_bn_splits_long_cycle`, which
  reproduces the reference's "fresh split_bn, keep affine + aggregated stats"
  semantics functionally.
- Stats run in fp32 regardless of compute dtype, matching the plain
  ``nn.BatchNorm(dtype=jnp.float32)`` usage elsewhere in the backbone.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn
from flax.core import unfreeze

Dtype = Any

_SPLIT_KEYS = ("split_mean", "split_var")


class SubBatchNorm(nn.Module):
    """Channels-last SubBatchNorm (reference SubBatchNorm3d semantics).

    Train: normalize each of ``num_splits`` interleaved sub-batches with its
    own biased batch statistics; update per-split running stats with torch's
    ``(1-m)*old + m*new`` rule and unbiased running variance. Eval: normalize
    with the *aggregated* stats (``mean`` / ``var`` in ``batch_stats``),
    which :func:`aggregate_subbn_stats` refreshes from the split stats —
    mirroring the reference where ``aggregate_stats()`` must be called before
    switching to eval (reference src/models/resnet.py:52-61).
    """

    num_splits: int = 1
    momentum: float = 0.1        # torch BatchNorm3d default
    epsilon: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        s = self.num_splits
        split_mean = self.variable("batch_stats", "split_mean",
                                   lambda: jnp.zeros((s, c), jnp.float32))
        split_var = self.variable("batch_stats", "split_var",
                                  lambda: jnp.ones((s, c), jnp.float32))
        agg_mean = self.variable("batch_stats", "mean",
                                 lambda: jnp.zeros((c,), jnp.float32))
        agg_var = self.variable("batch_stats", "var",
                                lambda: jnp.ones((c,), jnp.float32))

        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        if train:
            n = xf.shape[0]
            if n % s:
                raise ValueError(f"batch {n} not divisible by num_splits {s}")
            spatial = xf.shape[1:-1]
            # (n, *spatial, c) -> (n//s, s, *spatial, c): second axis g holds
            # samples {g, s+g, 2s+g, ...} — the reference view's interleave.
            xg = xf.reshape((n // s, s) + spatial + (c,))
            red = (0,) + tuple(range(2, 2 + len(spatial)))
            mean = xg.mean(axis=red)                                   # (s, c)
            var = jnp.square(xg - jnp.expand_dims(mean, red)).mean(axis=red)
            bshape = (1, s) + (1,) * len(spatial) + (c,)
            xg = (xg - mean.reshape(bshape)) / jnp.sqrt(var.reshape(bshape) + self.epsilon)
            out = xg.reshape(xf.shape)
            if not self.is_initializing():
                count = (n // s) * math.prod(spatial)
                # torch tracks the UNBIASED variance in running stats
                unbiased = var * (count / max(count - 1, 1))
                m = self.momentum
                split_mean.value = (1.0 - m) * split_mean.value + m * mean
                split_var.value = (1.0 - m) * split_var.value + m * unbiased
        else:
            out = (xf - agg_mean.value) / jnp.sqrt(agg_var.value + self.epsilon)

        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            out = out * scale + bias
        return out.astype(orig_dtype) if orig_dtype != jnp.float32 else out


def _is_subbn_stats(node: Any) -> bool:
    return isinstance(node, dict) and all(k in node for k in _SPLIT_KEYS)


def _map_subbn(tree: Any, fn) -> Any:
    """Apply ``fn`` to every SubBatchNorm stats dict in a batch_stats tree."""
    if _is_subbn_stats(tree):
        return fn(dict(tree))
    if isinstance(tree, dict):
        return {k: _map_subbn(v, fn) for k, v in tree.items()}
    return tree


def aggregate_batch_stats(batch_stats: Dict) -> Dict:
    """Tree-level form of :func:`aggregate_subbn_stats`: folds each
    SubBatchNorm's per-split running stats into its aggregated eval stats
    (reference ``aggregate_stats``, src/models/resnet.py:52-61):
    ``mean = split_means.mean(splits)``;
    ``var = split_vars.mean(splits) + ((split_means - mean)**2).mean(splits)``.

    The split axis is ``-2`` so vmapped ensemble stats ``(seeds, s, C)``
    aggregate per-seed.
    """

    def agg(node):
        means, varis = node["split_mean"], node["split_var"]
        mean = means.mean(axis=-2)
        node["mean"] = mean
        node["var"] = (varis.mean(axis=-2)
                       + jnp.square(means - jnp.expand_dims(mean, -2)).mean(axis=-2))
        return node

    return _map_subbn(unfreeze(batch_stats), agg)


def aggregate_subbn_stats(variables: Dict) -> Dict:
    """Variables-level wrapper around :func:`aggregate_batch_stats`; call
    before any eval forward, exactly where the reference calls
    ``aggregate_stats()`` on each module.
    """
    variables = unfreeze(variables)
    if "batch_stats" not in variables:
        return variables
    out = dict(variables)
    out["batch_stats"] = aggregate_batch_stats(variables["batch_stats"])
    return out


def reset_bn_splits_long_cycle(variables: Dict, new_splits: int) -> Dict:
    """Multigrid long-cycle step (reference ``update_bn_splits_long_cycle``,
    src/models/resnet.py:267-273): the reference re-allocates each module's
    ``split_bn`` at ``base_bn_splits * long_cycle_bn_scale`` features, i.e.
    fresh running stats at the new split count, keeping the affine params and
    the aggregated eval stats. Functionally: rebuild the model with
    ``bn_splits=new_splits`` and run its next step with these variables.
    """
    variables = unfreeze(variables)
    if "batch_stats" not in variables:
        return variables

    def reset(node):
        c = node["split_mean"].shape[-1]
        node["split_mean"] = jnp.zeros((new_splits, c), jnp.float32)
        node["split_var"] = jnp.ones((new_splits, c), jnp.float32)
        return node

    out = dict(variables)
    out["batch_stats"] = _map_subbn(variables["batch_stats"], reset)
    return out
