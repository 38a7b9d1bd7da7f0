"""Mixup + video CutMix (rebuild of reference src/utils/mixup.py).

Pure functions usable inside a jitted train step: mixed inputs plus the
(y_a, y_b, lam) triple for loss mixing ``lam*L(y_a) + (1-lam)*L(y_b)``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def mixup(key: jax.Array, x: jnp.ndarray, y: jnp.ndarray,
          alpha: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Standard mixup (reference :5-23): convex-combine shuffled pairs."""
    k1, k2 = jax.random.split(key)
    lam = jax.random.beta(k1, alpha, alpha) if alpha > 0 else jnp.float32(1.0)
    perm = jax.random.permutation(k2, x.shape[0])
    x_mix = lam * x + (1.0 - lam) * x[perm]
    return x_mix, y, y[perm], lam


def video_cutmix(key: jax.Array, x: jnp.ndarray, y: jnp.ndarray,
                 mode: str = "spatio", alpha: float = 1.0):
    """Video CutMix (reference video_mixup_data :26-89): replace a random
    spatial patch, temporal span, or both with the shuffled clip's content.
    x: (B, T, H, W, C)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lam = jax.random.beta(k1, alpha, alpha)
    perm = jax.random.permutation(k2, x.shape[0])
    B, T, H, W, C = x.shape

    cut = jnp.sqrt(1.0 - lam)

    if mode in ("spatio", "both"):
        cw = (W * cut).astype(jnp.int32)
        ch = (H * cut).astype(jnp.int32)
        cx = jax.random.randint(k3, (), 0, W)
        cy = jax.random.randint(k4, (), 0, H)
        x1, x2 = jnp.clip(cx - cw // 2, 0, W), jnp.clip(cx + cw // 2, 0, W)
        y1, y2 = jnp.clip(cy - ch // 2, 0, H), jnp.clip(cy + ch // 2, 0, H)
        rows = jnp.arange(H)[None, None, :, None, None]
        cols = jnp.arange(W)[None, None, None, :, None]
        box = (rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2)
        x = jnp.where(box, x[perm], x)
        lam_adj = 1.0 - ((x2 - x1) * (y2 - y1)) / (W * H)
    else:
        lam_adj = lam

    if mode in ("temporal", "both"):
        ct = (T * cut).astype(jnp.int32)
        t0 = jax.random.randint(k3, (), 0, T)
        t1, t2 = jnp.clip(t0 - ct // 2, 0, T), jnp.clip(t0 + ct // 2, 0, T)
        ts = jnp.arange(T)[None, :, None, None, None]
        span = (ts >= t1) & (ts < t2)
        x = jnp.where(span, x[perm], x)
        lam_adj = 1.0 - (t2 - t1) / T if mode == "temporal" else lam_adj * (1.0 - (t2 - t1) / T)

    return x, y, y[perm], lam_adj


def mixup_loss(loss_fn, logits, y_a, y_b, lam):
    """lam * L(y_a) + (1-lam) * L(y_b) (reference mixup_criterion)."""
    return lam * loss_fn(logits, y_a) + (1.0 - lam) * loss_fn(logits, y_b)
