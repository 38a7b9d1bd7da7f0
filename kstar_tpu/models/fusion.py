"""Multimodal fusion models (rebuild of reference src/models/MultiModal.py).

Four variants:
  * MultiModalConcat  — ViViT encoder + 0D Transformer encoder, concat
    latents -> connector -> classifier (reference MultiModalModel :10-53).
  * MultiModalGB      — full ViViT + Transformer classifiers; the forward
    returns (multi, vis, ts) logits for Gradient Blending. Where the
    reference captures penultimate latents via forward hooks
    (reference :95-97, :123-127), here the submodels expose
    ``forward_with_latent`` — a functional redesign with identical
    semantics (the hooked latents *are* the encoder outputs).
  * TFN               — Tensor Fusion Network: latents (capped at 128) are
    augmented with a constant 1 and outer-producted (reference :173-243).
  * TFNGB             — TFN with unimodal heads, triple logits (reference :246-331).

The reference's ``use_stream`` runtime switch (reference :103-151) becomes
explicit methods (forward_video / forward_ts / __call__): under jit each is
its own traced graph, which is the XLA-native equivalent of stream gating.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .ts_transformer import Transformer0D, TransformerEncoder0D
from .vivit import ViViT, ViViTEncoder

Dtype = Any


def _encoder_kwargs(kwargs: Dict, drop=("cls_dims", "n_classes", "alpha")) -> Dict:
    """Encoder variants take the classifier-free subset of the model kwargs."""
    return {k: v for k, v in kwargs.items() if k not in drop}


class MultiModalConcat(nn.Module):
    """Concat fusion over encoder latents."""
    vivit_kwargs: Dict
    ts_kwargs: Dict
    n_classes: int = 2
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder_video = ViViTEncoder(dtype=self.dtype, **_encoder_kwargs(self.vivit_kwargs))
        self.encoder_0d = TransformerEncoder0D(dtype=self.dtype, **_encoder_kwargs(self.ts_kwargs))
        d = self.vivit_kwargs.get("dim", 128) + self.ts_kwargs.get("feature_dims", 128)
        self.connector = nn.Dense(d // 2, dtype=jnp.float32)
        self.cls_fc1 = nn.Dense(d // 2, dtype=jnp.float32)
        self.cls_ln = nn.LayerNorm(dtype=jnp.float32)
        self.cls_fc2 = nn.Dense(self.n_classes, dtype=jnp.float32)

    def _fuse(self, h_vis, h_ts):
        h = jnp.concatenate([h_vis, h_ts], axis=-1)
        return nn.relu(self.connector(h))

    def _classify(self, h):
        x = nn.relu(self.cls_ln(self.cls_fc1(h)))
        return self.cls_fc2(x)

    def __call__(self, x_video: jnp.ndarray, x_0d: jnp.ndarray, train: bool = False):
        h_vis = self.encoder_video(x_video, train)
        h_ts = self.encoder_0d(x_0d, train)
        return self._classify(self._fuse(h_vis, h_ts))

    def encode(self, x_video: jnp.ndarray, x_0d: jnp.ndarray):
        h_vis = self.encoder_video(x_video, False)
        h_ts = self.encoder_0d(x_0d, False)
        return self._fuse(h_vis, h_ts), h_vis, h_ts

    # -- sweep fast path (see ViViTEncoder.spatial_cls) ----------------------
    def embed_frames(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.encoder_video.embed_frames(x)

    def spatial_cls(self, tokens: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
        return self.encoder_video.spatial_cls(tokens, offset)

    def forward_spatial_cls(self, win_cls: jnp.ndarray, x_0d: jnp.ndarray):
        h_vis = self.encoder_video.encode_spatial_cls(win_cls)
        h_ts = self.encoder_0d(x_0d, False)
        return self._classify(self._fuse(h_vis, h_ts))


class MultiModalGB(nn.Module):
    """Concat fusion with unimodal heads for Gradient Blending."""
    vivit_kwargs: Dict
    ts_kwargs: Dict
    n_classes: int = 2
    dtype: Dtype = jnp.float32

    def setup(self):
        self.vis_model = ViViT(n_classes=self.n_classes, dtype=self.dtype, **self.vivit_kwargs)
        self.ts_model = Transformer0D(n_classes=self.n_classes, dtype=self.dtype, **self.ts_kwargs)
        d = self.vivit_kwargs.get("dim", 128) + self.ts_kwargs.get("feature_dims", 128)
        self.connector = nn.Dense(d // 2, dtype=jnp.float32)
        self.cls_fc1 = nn.Dense(d // 2, dtype=jnp.float32)
        self.cls_ln = nn.LayerNorm(dtype=jnp.float32)
        self.cls_fc2 = nn.Dense(self.n_classes, dtype=jnp.float32)

    def _fusion_logits(self, h_vis, h_ts):
        h = jnp.concatenate([h_vis, h_ts], axis=-1)
        h = nn.relu(self.connector(h))
        x = nn.relu(self.cls_ln(self.cls_fc1(h)))
        return self.cls_fc2(x)

    def __call__(self, x_video: jnp.ndarray, x_0d: jnp.ndarray, train: bool = False):
        out_vis, h_vis = self.vis_model.forward_with_latent(x_video, train)
        out_ts, h_ts = self.ts_model.forward_with_latent(x_0d, train)
        out_multi = self._fusion_logits(h_vis, h_ts)
        return out_multi, out_vis, out_ts

    def forward_video(self, x_video: jnp.ndarray, train: bool = False):
        """Video-only stream (reference use_stream='video')."""
        return self.vis_model(x_video, train)

    def forward_ts(self, x_0d: jnp.ndarray, train: bool = False):
        """0D-only stream (reference use_stream='0D')."""
        return self.ts_model(x_0d, train)

    def encode(self, x_video: jnp.ndarray, x_0d: jnp.ndarray):
        h_vis = self.vis_model.encode(x_video)
        h_ts = self.ts_model.encode(x_0d)
        h = jnp.concatenate([h_vis, h_ts], axis=-1)
        return nn.relu(self.connector(h)), h_vis, h_ts

    # -- sweep fast path (fusion logits only; see ViViTEncoder.spatial_cls) --
    def embed_frames(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.vis_model.embed_frames(x)

    def spatial_cls(self, tokens: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
        return self.vis_model.spatial_cls(tokens, offset)

    def forward_spatial_cls(self, win_cls: jnp.ndarray, x_0d: jnp.ndarray):
        h_vis = self.vis_model.encoder.encode_spatial_cls(win_cls)
        h_ts = self.ts_model.encoder(x_0d, False)
        return self._fusion_logits(h_vis, h_ts)


def _outer_fusion(h_vis: jnp.ndarray, h_ts: jnp.ndarray) -> jnp.ndarray:
    """Tensor fusion: append constant 1 to each latent, take the batched outer
    product, flatten (reference TFN.forward, src/models/MultiModal.py:217-221)."""
    ones = jnp.ones((h_vis.shape[0], 1), h_vis.dtype)
    hv = jnp.concatenate([ones, h_vis], axis=-1)
    ht = jnp.concatenate([ones, h_ts], axis=-1)
    fused = jnp.einsum("bi,bj->bij", hv, ht)
    return fused.reshape(h_vis.shape[0], -1)


class TFN(nn.Module):
    """Tensor Fusion Network (encoder dims capped at 128, reference :181-185)."""
    vivit_kwargs: Dict
    ts_kwargs: Dict
    n_classes: int = 2
    dtype: Dtype = jnp.float32

    def setup(self):
        vk = dict(self.vivit_kwargs); vk["dim"] = min(vk.get("dim", 128), 128)
        tk = dict(self.ts_kwargs); tk["feature_dims"] = min(tk.get("feature_dims", 128), 128)
        self.encoder_video = ViViTEncoder(dtype=self.dtype, **_encoder_kwargs(vk))
        self.encoder_0d = TransformerEncoder0D(dtype=self.dtype, **_encoder_kwargs(tk))
        d = vk["dim"] + tk["feature_dims"]
        self.connector = nn.Dense(d, dtype=jnp.float32)
        self.cls_fc1 = nn.Dense(d // 2, dtype=jnp.float32)
        self.cls_ln = nn.LayerNorm(dtype=jnp.float32)
        self.cls_fc2 = nn.Dense(self.n_classes, dtype=jnp.float32)

    def _head(self, fused):
        x = nn.relu(self.connector(fused))
        x = nn.relu(self.cls_ln(self.cls_fc1(x)))
        return self.cls_fc2(x)

    def __call__(self, x_video: jnp.ndarray, x_0d: jnp.ndarray, train: bool = False):
        h_vis = self.encoder_video(x_video, train)
        h_ts = self.encoder_0d(x_0d, train)
        return self._head(_outer_fusion(h_vis, h_ts))

    def encode(self, x_video: jnp.ndarray, x_0d: jnp.ndarray):
        h_vis = self.encoder_video(x_video, False)
        h_ts = self.encoder_0d(x_0d, False)
        fused = _outer_fusion(h_vis, h_ts)
        return nn.relu(self.connector(fused)), h_vis, h_ts

    # -- sweep fast path (see ViViTEncoder.spatial_cls) ----------------------
    def embed_frames(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.encoder_video.embed_frames(x)

    def spatial_cls(self, tokens: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
        return self.encoder_video.spatial_cls(tokens, offset)

    def forward_spatial_cls(self, win_cls: jnp.ndarray, x_0d: jnp.ndarray):
        h_vis = self.encoder_video.encode_spatial_cls(win_cls)
        h_ts = self.encoder_0d(x_0d, False)
        return self._head(_outer_fusion(h_vis, h_ts))


class TFNGB(nn.Module):
    """TFN with unimodal heads for Gradient Blending (reference TFN_GB :246-331):
    the fusion classifier consumes the outer product of the two penultimate
    latents; forward returns (multi, vis, ts) logits."""
    vivit_kwargs: Dict
    ts_kwargs: Dict
    n_classes: int = 2
    dtype: Dtype = jnp.float32

    def setup(self):
        vk = dict(self.vivit_kwargs); vk["dim"] = min(vk.get("dim", 128), 128)
        tk = dict(self.ts_kwargs); tk["feature_dims"] = min(tk.get("feature_dims", 128), 128)
        self.vis_model = ViViT(n_classes=self.n_classes, dtype=self.dtype, **vk)
        self.ts_model = Transformer0D(n_classes=self.n_classes, dtype=self.dtype, **tk)
        fusion_dim = (vk["dim"] + 1) * (tk["feature_dims"] + 1)
        self.cls_fc1 = nn.Dense(fusion_dim // 2, dtype=jnp.float32)
        self.cls_bn = nn.BatchNorm(dtype=jnp.float32)
        self.cls_fc2 = nn.Dense(self.n_classes, dtype=jnp.float32)

    def _head(self, fused, train: bool):
        x = self.cls_fc1(fused)
        x = self.cls_bn(x, use_running_average=not train)
        x = nn.relu(x)
        return self.cls_fc2(x)

    def __call__(self, x_video: jnp.ndarray, x_0d: jnp.ndarray, train: bool = False):
        out_vis, h_vis = self.vis_model.forward_with_latent(x_video, train)
        out_ts, h_ts = self.ts_model.forward_with_latent(x_0d, train)
        out_multi = self._head(_outer_fusion(h_vis, h_ts), train)
        return out_multi, out_vis, out_ts

    def forward_video(self, x_video: jnp.ndarray, train: bool = False):
        return self.vis_model(x_video, train)

    def forward_ts(self, x_0d: jnp.ndarray, train: bool = False):
        return self.ts_model(x_0d, train)

    def encode(self, x_video: jnp.ndarray, x_0d: jnp.ndarray):
        h_vis = self.vis_model.encode(x_video)
        h_ts = self.ts_model.encode(x_0d)
        return _outer_fusion(h_vis, h_ts), h_vis, h_ts

    # -- sweep fast path (fusion logits only; see ViViTEncoder.spatial_cls) --
    def embed_frames(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.vis_model.embed_frames(x)

    def spatial_cls(self, tokens: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
        return self.vis_model.spatial_cls(tokens, offset)

    def forward_spatial_cls(self, win_cls: jnp.ndarray, x_0d: jnp.ndarray):
        h_vis = self.vis_model.encoder.encode_spatial_cls(win_cls)
        h_ts = self.ts_model.encoder(x_0d, False)
        return self._head(_outer_fusion(h_vis, h_ts), train=False)
