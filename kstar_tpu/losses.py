"""Losses and class-imbalance machinery as pure JAX functions.

Rebuilds reference src/loss.py (FocalLoss/LDAMLoss/CELoss), the DRW schedule
(reference src/train.py:318-329) and Gradient Blending loss (reference
src/GradientBlending.py:20-50) functionally: class weights / margins / GB
weights are *inputs* to the jitted train step, so per-epoch DRW or dynamic
GB re-estimation never trigger recompilation.

Label convention: 0 = disruptive, 1 = normal.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _ce_per_sample(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Unreduced cross entropy, fp32."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def ce_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Weighted cross entropy, sum reduction (reference CELoss,
    src/loss.py:71-81 uses reduction='sum')."""
    ce = _ce_per_sample(logits, labels)
    if weight is not None:
        ce = ce * weight[labels]
    if mask is not None:
        ce = ce * mask
    return jnp.sum(ce)


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    gamma: float = 2.0,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Focal loss, sum reduction (reference FocalLoss, src/loss.py:14-34):
    ``sum(alpha * (1 - p)^gamma * CE)`` with ``p = exp(-CE)`` and alpha the
    per-class weight gathered by target."""
    ce = _ce_per_sample(logits, labels)
    p = jnp.exp(-ce)
    alpha = weight[labels] if weight is not None else 1.0
    loss = alpha * (1.0 - p) ** gamma * ce
    if mask is not None:
        loss = loss * mask
    return jnp.sum(loss)


def ldam_margins(cls_num_list: np.ndarray, max_m: float = 0.5) -> np.ndarray:
    """Per-class margins ``m_c = max_m * n_c^(-1/4) / max(...)``
    (reference LDAMLoss.update_m_list, src/loss.py:52-56)."""
    m = 1.0 / np.sqrt(np.sqrt(np.maximum(np.asarray(cls_num_list, np.float64), 1.0)))
    return (m * (max_m / np.max(m))).astype(np.float32)


def ldam_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    m_list: jnp.ndarray,
    s: float = 1.0,
    weight: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """LDAM loss (reference LDAMLoss.forward, src/loss.py:58-69): subtract the
    true-class margin from its logit, scale by ``s``, weighted-mean CE
    (torch cross_entropy default reduction with class weights)."""
    logits = logits.astype(jnp.float32)
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
    x_m = logits - onehot * m_list[labels][:, None]
    ce = _ce_per_sample(s * x_m, labels)
    if mask is None:
        mask = jnp.ones_like(ce)
    if weight is not None:
        w = weight[labels] * mask
        return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-8)
    return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1e-8)


def classification_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    loss_type: str,
    weight: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    gamma: float = 2.0,
    m_list: Optional[jnp.ndarray] = None,
    s: float = 1.0,
) -> jnp.ndarray:
    """Dispatch on loss_type in {CE, Focal, LDAM}. ``loss_type`` is a static
    python string — it selects the traced graph at jit time."""
    if loss_type == "Focal":
        return focal_loss(logits, labels, weight, gamma, mask)
    if loss_type == "LDAM":
        assert m_list is not None
        return ldam_loss(logits, labels, m_list, s, weight, mask)
    return ce_loss(logits, labels, weight, mask)


# ---------------------------------------------------------------------------
# Re-weighting schedules
# ---------------------------------------------------------------------------

def inverse_freq_weights(cls_num_list: np.ndarray) -> np.ndarray:
    """Inverse-frequency class weights, normalized to sum to n_classes
    (reference train_vision_network.py:312-318)."""
    n = np.asarray(cls_num_list, np.float64)
    w = 1.0 / np.maximum(n, 1.0)
    return (w / w.sum() * len(n)).astype(np.float32)


def drw_weights(epoch: int, num_epoch: int, cls_num_list: np.ndarray,
                beta: float = 0.25) -> np.ndarray:
    """Deferred re-weighting: step betas = [0, b, 2b, 3b] across epoch
    quarters, effective-number weights ``(1-beta)/(1-beta^n_c)`` normalized
    to sum to n_classes (reference src/train.py:318-329)."""
    betas = [0.0, beta, 2 * beta, 3 * beta]
    idx = min(epoch // max(int(num_epoch / len(betas)), 1), len(betas) - 1)
    b = betas[idx]
    n = np.asarray(cls_num_list, np.float64)
    effective = 1.0 - np.power(b, n)
    w = (1.0 - b) / np.maximum(effective, 1e-12)
    return (w / w.sum() * len(n)).astype(np.float32)


# ---------------------------------------------------------------------------
# Gradient Blending
# ---------------------------------------------------------------------------

def gradient_blending_loss(
    out_multi: jnp.ndarray,
    out_vis: jnp.ndarray,
    out_ts: jnp.ndarray,
    labels: jnp.ndarray,
    gb_weights: jnp.ndarray,   # (3,) = [w_vis, w_ts, w_multi], traced input
    loss_type: str = "Focal",
    weight: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    gamma: float = 2.0,
    m_list: Optional[jnp.ndarray] = None,
    s: float = 1.0,
    loss_scale: float = 1.0,
) -> jnp.ndarray:
    """Weighted sum of per-stream losses (reference GradientBlending.forward,
    src/GradientBlending.py:45-50). GB weights ride in as a traced (3,) array
    so online re-estimation (GB_estimate) needs no retrace."""
    kw = dict(weight=weight, mask=mask, gamma=gamma, m_list=m_list, s=s)
    l_vis = classification_loss(out_vis, labels, loss_type, **kw) * loss_scale
    l_ts = classification_loss(out_ts, labels, loss_type, **kw) * loss_scale
    l_multi = classification_loss(out_multi, labels, loss_type, **kw) * loss_scale
    return gb_weights[0] * l_vis + gb_weights[1] * l_ts + gb_weights[2] * l_multi


def estimate_gb_weights(train_losses: Dict[str, list], valid_losses: Dict[str, list]) -> Dict[str, float]:
    """Offline G-Blend weight estimate from per-stream loss trajectories
    (reference GB_estimate, src/GradientBlending.py:52-114):
    ``w = G / (Of - Oi)^2`` with O = valid - train overfitting measures,
    normalized across streams.

    Deviation from the reference on MIXED-sign trajectories only: when every
    stream's raw ratio shares one sign (all improving or all worsening over
    the probe — the normal case) the normalization below reproduces the
    reference's positive weights exactly. With mixed signs the reference's
    ``w / sum(w)`` hands the minority-sign streams NEGATIVE blending weights
    — the combined objective then actively maximizes those streams' losses
    until the next re-estimate. Here the minority-sign streams drop to 0
    instead and the dominant side normalizes to 1."""
    raw = {}
    for key in train_losses:
        tr, va = train_losses[key], valid_losses[key]
        Oi = va[0] - tr[0]
        Of = va[-1] - tr[-1]
        G = va[-1] - va[0]
        raw[key] = G / max((Of - Oi) ** 2, 1e-12)
    pos = {k: max(v, 0.0) for k, v in raw.items()}
    neg = {k: max(-v, 0.0) for k, v in raw.items()}
    ws = neg if sum(neg.values()) >= sum(pos.values()) else pos
    total = sum(ws.values())
    if total == 0:
        return {k: 1.0 / len(ws) for k in ws}
    return {k: v / total for k, v in ws.items()}


# ---------------------------------------------------------------------------
# Deep CCA loss (reference src/CCA.py:25-83)
# ---------------------------------------------------------------------------

def cca_loss(h1: jnp.ndarray, h2: jnp.ndarray, out_dim: int,
             use_all_singular_values: bool = False,
             r1: float = 1e-3, r2: float = 1e-3, eps: float = 1e-9) -> jnp.ndarray:
    """Negative total canonical correlation between two views.

    Whitens per-view covariances, forms T = S11^-1/2 S12 S22^-1/2, and returns
    -sum of its singular values (or -sqrt(trace(T'T)) of the top-k), as in the
    reference's torch.symeig implementation."""
    h1 = h1.T.astype(jnp.float32)  # (d, N)
    h2 = h2.T.astype(jnp.float32)
    d1, n = h1.shape
    d2 = h2.shape[0]

    h1c = h1 - h1.mean(axis=1, keepdims=True)
    h2c = h2 - h2.mean(axis=1, keepdims=True)

    s12 = (h1c @ h2c.T) / (n - 1)
    s11 = (h1c @ h1c.T) / (n - 1) + r1 * jnp.eye(d1)
    s22 = (h2c @ h2c.T) / (n - 1) + r2 * jnp.eye(d2)

    def inv_sqrt(s):
        vals, vecs = jnp.linalg.eigh(s)
        vals = jnp.clip(vals, eps, None)
        return (vecs * (vals ** -0.5)) @ vecs.T

    t = inv_sqrt(s11) @ s12 @ inv_sqrt(s22)
    if use_all_singular_values:
        corr = jnp.sqrt(jnp.clip(jnp.trace(t.T @ t), eps, None))
    else:
        tt = t.T @ t + r1 * jnp.eye(d2)
        vals = jnp.linalg.eigvalsh(tt)
        topk = jax.lax.top_k(vals, min(out_dim, d2))[0]
        corr = jnp.sum(jnp.sqrt(jnp.clip(topk, eps, None)))
    return -corr
