"""XAI: Grad-CAM for R(2+1)D and attention rollout for ViViT.

Rebuilds of reference src/visualization/visualize_cam.py (GradCAM_R2Plus1D)
and visualize_attention.py (ViViTAttentionRollout), redesigned functionally:

  * Grad-CAM — the reference registers forward/backward hooks on
    ``res2plus1d.conv5`` (reference :75-76). Here the conv5 activations are
    captured with flax ``capture_intermediates`` and the gradient of the
    class score w.r.t. them comes from ``jax.grad`` over the (pool -> head)
    tail, which is everything after conv5 in this architecture. Weights are
    the time+space-averaged gradients; the CAM is the ReLU of the weighted
    activation sum, bilinearly upsampled (reference :80-116).
  * Attention rollout — the reference hooks ``to_qkv`` and recomputes
    attention (reference :41-55); here the MHSA modules ``sow`` their
    attention maps, and rollout multiplies (A + I)/2 across layers with
    top-k discard masking (reference spatio/temporal_rollout :70-135).
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Grad-CAM (R2Plus1D)
# ---------------------------------------------------------------------------

def gradcam_r2plus1d(model, params, batch_stats, video: jnp.ndarray,
                     target_class: int = 0) -> np.ndarray:
    """CAM heatmaps for a batch of clips.

    video: (B, T, H, W, C) float input. Returns (B, T', H, W) heatmaps in
    [0, 1] upsampled to the input's spatial size.
    """
    variables = {"params": params, "batch_stats": batch_stats}

    # capture the conv5 stage output
    _, inter = model.apply(
        variables, video, train=False,
        capture_intermediates=lambda mdl, _: mdl.name == "conv5",
        mutable=["intermediates"],
    )
    leaves = jax.tree.leaves(inter)
    acts = leaves[0]  # (B, T', H', W', C')

    def score(a):
        pooled = a.mean(axis=(1, 2, 3)).astype(jnp.float32)
        logits = model.apply(variables, pooled, train=False,
                             method=lambda mdl, x, train: mdl.head(x, train=train))
        return logits[:, target_class].sum()

    grads = jax.grad(score)(acts)

    # weights: gradients averaged over time and space (reference :85-90)
    w = grads.mean(axis=(1, 2, 3), keepdims=True)          # (B,1,1,1,C')
    cam = jnp.maximum((w * acts).sum(axis=-1), 0.0)        # (B, T', H', W')

    H, W = video.shape[2], video.shape[3]
    cam = jax.image.resize(cam, (cam.shape[0], cam.shape[1], H, W), "bilinear")
    cam = np.asarray(cam, np.float32)
    mx = cam.reshape(cam.shape[0], -1).max(axis=1)[:, None, None, None]
    return cam / np.maximum(mx, 1e-8)


def overlay_cam(frame_u8: np.ndarray, cam: np.ndarray, alpha: float = 0.4) -> np.ndarray:
    """JET-style heatmap overlay on a BGR frame (reference :100-116)."""
    import matplotlib.cm as cm

    heat = (cm.jet(np.clip(cam, 0, 1))[..., :3] * 255).astype(np.uint8)[..., ::-1]
    return np.clip((1 - alpha) * frame_u8 + alpha * heat, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Attention rollout (ViViT)
# ---------------------------------------------------------------------------

def collect_attention(model, params, video: jnp.ndarray, which: str = "space"):
    """Run ViViT capturing the sown attention maps of the chosen transformer.

    Returns a list of (B', heads, N, N) arrays, one per depth layer, where
    B' = B*T for the spatial transformer and B for the temporal one."""
    variables = {"params": params}
    _, inter = model.apply(
        variables, video, train=False, mutable=["intermediates"],
    )
    flat = jax.tree_util.tree_flatten_with_path(inter)[0]
    key = "space_transformer" if which == "space" else "temporal_transformer"
    out = []
    for path, val in flat:
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        if key in p and "attn" in p:
            out.append((p, np.asarray(val, np.float32)))
    if not out:
        raise ValueError(
            "no sown attention maps found — attention rollout needs the "
            "einsum attention path (the fused Pallas attention never "
            "materializes the attention matrix); rebuild the model with "
            "use_pallas=False for XAI")
    # numeric layer order: a lexicographic sort puts attn_10 before attn_2,
    # silently scrambling the (non-commutative) rollout product at depth >= 10
    def layer_index(p: str) -> tuple:
        m = re.search(r"attn_(\d+)", p)
        return (int(m.group(1)) if m else -1, p)

    out.sort(key=lambda kv: layer_index(kv[0]))
    return [v for _, v in out]


def rollout(attentions, discard_ratio: float = 0.9, head_fusion: str = "mean") -> np.ndarray:
    """Multiply (A + I)/2 across layers with per-layer top-k discard
    (reference spatio_rollout/temporal_rollout :70-135). attentions:
    list of (B, H, N, N). Returns (B, N) cls-token attention per batch."""
    B, _, N, _ = attentions[0].shape
    result = np.broadcast_to(np.eye(N, dtype=np.float32), (B, N, N)).copy()
    for attn in attentions:
        if head_fusion == "max":
            fused = attn.max(axis=1)
        elif head_fusion == "min":
            fused = attn.min(axis=1)
        else:
            fused = attn.mean(axis=1)                      # (B, N, N)
        flat = fused.reshape(B, -1)
        k = int(flat.shape[1] * discard_ratio)
        if k > 0:
            thresh = np.partition(flat, k - 1, axis=1)[:, k - 1][:, None, None]
            keep = fused >= thresh
            # never discard the cls column
            keep[:, :, 0] = True
            fused = fused * keep
        a = (fused + np.eye(N, dtype=np.float32)) / 2.0
        a = a / np.maximum(a.sum(axis=-1, keepdims=True), 1e-8)
        result = np.einsum("bij,bjk->bik", a, result)
    mask = result[:, 0, 1:]                                # cls -> patches
    return mask / np.maximum(mask.max(axis=1, keepdims=True), 1e-8)


from contextlib import contextmanager


@contextmanager
def guided_backprop():
    """Within this context, conv-stack activations traced through
    models.common.act_leaky_relu / act_relu (R2Plus1D's LeakyReLUs and the
    3D-ResNet/SlowFast ReLUs) use the guided-backprop VJP (reference
    GuidedBackpropReLU, visualize_cam.py:21-54): gradient flows only where
    input > 0 AND upstream grad > 0.

    ONLY use around un-jitted jax.grad calls (as guided_backprop_saliency
    does): the flag is read at TRACE time, so any jitted program first
    compiled inside this context permanently bakes the guided VJP into the
    jit cache — a train/eval step traced here would silently keep masked
    gradients after the context exits. Not thread-safe for the same reason;
    prefer calling guided_backprop_saliency over entering this directly."""
    from ..models import common
    common.GUIDED_BACKPROP[0] = True
    try:
        yield
    finally:
        common.GUIDED_BACKPROP[0] = False


def guided_backprop_saliency(model, params, batch_stats, video: jnp.ndarray,
                             target_class: int = 0) -> np.ndarray:
    """Input-space guided-backprop saliency for a conv video model
    (R2Plus1D / SlowFast): |d score / d input| with the guided rule, maxed
    over channels and normalized per clip. video: (B, T, H, W, C) float.
    Returns (B, T, H, W) in [0, 1]."""
    variables = {"params": params, "batch_stats": batch_stats}

    def score(v):
        logits = model.apply(variables, v, train=False)
        return logits[:, target_class].sum()

    with guided_backprop():
        g = jax.grad(score)(jnp.asarray(video, jnp.float32))
    sal = np.abs(np.asarray(g, np.float32)).max(axis=-1)
    mx = sal.reshape(sal.shape[0], -1).max(axis=1)[:, None, None, None]
    return sal / np.maximum(mx, 1e-8)


def vivit_attention_rollout(model, params, video: jnp.ndarray,
                            which: str = "space", discard_ratio: float = 0.9,
                            head_fusion: str = "mean") -> np.ndarray:
    """End-to-end rollout.

    which='space': returns (B, T, h, w) per-frame patch heatmaps.
    which='temporal': returns (B, T) per-frame importances."""
    attns = collect_attention(model, params, video, which)
    mask = rollout(attns, discard_ratio, head_fusion)
    B, T = video.shape[0], video.shape[1]
    if which == "space":
        n = mask.shape[1]
        side = int(np.sqrt(n))
        return mask.reshape(B, T, side, side)
    return mask
