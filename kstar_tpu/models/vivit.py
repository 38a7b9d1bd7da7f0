"""ViViT — factorized space/time video transformer (ViViT Model 2).

Rebuild of reference src/models/ViViT.py: patch embedding, learnable
(1, T, N+1, dim) positional embedding, per-frame spatial cls token, spatial
transformer over each frame's 65 tokens, temporal cls token, temporal
transformer over T+1 tokens, cls/mean pool, LayerNorm+ELU MLP head.

TPU-first notes:
  * channels-last input (B, T, H, W, C); patchify is a reshape/transpose that
    XLA fuses into the embedding matmul (one big (B*T*N, p*p*C) x (p*p*C, D)
    MXU op);
  * spatial attention batches (B*T) sequences of 65 tokens into single
    einsums — no per-frame loop;
  * pre-norm blocks, bf16 compute, fp32 softmax/LayerNorm;
  * optionally dispatches attention to the fused Pallas kernel
    (ops/attention.py) when the shapes warrant it.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class MHSA(nn.Module):
    """Multi-head self-attention with explicit d_head (reference Attention,
    src/models/ViViT.py:50-91): inner_dim = n_heads*d_head; output projection
    skipped iff single head with d_head == dim."""
    dim: int
    n_heads: int = 3
    d_head: int = 64
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    norm_dtype: Dtype = jnp.float32   # softmax/LN accumulation dtype; bf16 is
                                      # the measured VPU-serialization A/B
                                      # (PERFORMANCE.md), f32 is the default
                                      # (parity numerics)

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, N, _ = x.shape
        h, dh = self.n_heads, self.d_head
        inner = h * dh
        project_out = not (h == 1 and dh == self.dim)

        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, N, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, h, dh).transpose(0, 2, 1, 3)

        if self.use_pallas:
            from ..ops.attention import fused_attention
            out = fused_attention(q, k, v, scale=dh ** -0.5)
        else:
            logits = jnp.einsum("bhid,bhjd->bhij", q, k).astype(self.norm_dtype) * (dh ** -0.5)
            attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            # exposed for attention rollout (viz/xai.py); no-op unless the
            # 'intermediates' collection is mutable
            self.sow("intermediates", "attn", attn)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v)

        out = out.transpose(0, 2, 1, 3).reshape(B, N, inner)
        if project_out:
            out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class PreNormTransformer(nn.Module):
    """Depth x (PreNorm attention + PreNorm feedforward) with residuals and a
    final LayerNorm (reference Transformer, src/models/ViViT.py:93-109)."""
    dim: int
    depth: int
    n_heads: int
    d_head: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    norm_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for i in range(self.depth):
            a = nn.LayerNorm(dtype=self.norm_dtype, name=f"attn_norm_{i}")(x).astype(self.dtype)
            a = MHSA(self.dim, self.n_heads, self.d_head, self.dropout, self.dtype,
                     self.use_pallas, self.norm_dtype, name=f"attn_{i}")(a, deterministic)
            x = x + a
            f = nn.LayerNorm(dtype=self.norm_dtype, name=f"ff_norm_{i}")(x).astype(self.dtype)
            f = nn.Dense(self.mlp_dim, dtype=self.dtype, name=f"ff1_{i}")(f)
            f = nn.gelu(f)
            f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
            f = nn.Dense(self.dim, dtype=self.dtype, name=f"ff2_{i}")(f)
            f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
            x = x + f
        return nn.LayerNorm(dtype=self.norm_dtype, name="final_norm")(x).astype(self.dtype)


def patchify(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, T, N, patch*patch*C).

    Token feature layout matches the reference einops rearrange
    'b t c (h p1) (w p2) -> b t (h w) (p1 p2 c)'."""
    B, T, H, W, C = x.shape
    hh, ww = H // patch, W // patch
    x = x.reshape(B, T, hh, patch, ww, patch, C)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)           # B T hh ww p1 p2 C
    return x.reshape(B, T, hh * ww, patch * patch * C)


class ViViTEncoder(nn.Module):
    """Encoder emitting the (B, dim) latent (reference ViViTEncoder,
    src/models/ViViT.py:226-299).

    Split into ``embed_frames`` (per-frame patch embedding — independent of
    the frame's offset within a clip) and ``encode_tokens`` (offset-dependent
    positional embedding + transformers). The continuous-inference sweep
    exploits this: embed every frame of a shot once, then gather embedded
    tokens per sliding window — ~6x less gather traffic than pixels and no
    recomputed embeddings across the ~seq_len windows sharing each frame.
    """
    image_size: int = 128
    patch_size: int = 16
    n_frames: int = 21
    dim: int = 128
    depth: int = 2
    n_heads: int = 4
    d_head: int = 64
    scale_dim: int = 8
    dropout: float = 0.1
    embedd_dropout: float = 0.1
    pool: str = "cls"
    in_channels: int = 3
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    remat: bool = False   # rematerialize transformer blocks (memory <-> FLOPs)
    norm_dtype: Dtype = jnp.float32

    def setup(self):
        n_patches = (self.image_size // self.patch_size) ** 2
        self.patch_embed = nn.Dense(self.dim, dtype=self.dtype)
        self.space_token = self.param("space_token", nn.initializers.normal(1.0),
                                      (1, 1, self.dim), jnp.float32)
        self.temporal_token = self.param("temporal_token", nn.initializers.normal(1.0),
                                         (1, 1, self.dim), jnp.float32)
        self.pos_embedding = self.param("pos_embedding", nn.initializers.normal(1.0),
                                        (1, self.n_frames, n_patches + 1, self.dim),
                                        jnp.float32)
        self.embed_drop = nn.Dropout(self.embedd_dropout)
        transformer_cls = (nn.remat(PreNormTransformer, static_argnums=(2,))
                           if self.remat else PreNormTransformer)
        self.space_transformer = transformer_cls(
            self.dim, self.depth, self.n_heads, self.d_head,
            self.dim * self.scale_dim, self.dropout, self.dtype, self.use_pallas,
            self.norm_dtype)
        self.temporal_transformer = transformer_cls(
            self.dim, self.depth, self.n_heads, self.d_head,
            self.dim * self.scale_dim, self.dropout, self.dtype, self.use_pallas,
            self.norm_dtype)

    def embed_frames(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T, H, W, C) or (T, H, W, C) pixels -> (..., N, dim) patch
        embeddings (no cls token / positional embedding — offset-free)."""
        squeeze = x.ndim == 4
        if squeeze:
            x = x[None]
        x = patchify(x.astype(self.dtype), self.patch_size)
        x = self.patch_embed(x)
        return x[0] if squeeze else x

    def encode_tokens(self, tokens: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, T, N, dim) embedded patches -> (B, dim) pooled latent."""
        det = not train
        B, T = tokens.shape[0], tokens.shape[1]
        x = tokens.astype(self.dtype)

        cls_s = jnp.broadcast_to(self.space_token.astype(self.dtype),
                                 (B, T, 1, self.dim))
        x = jnp.concatenate([cls_s, x], axis=2)                    # (B,T,N+1,D)
        x = x + self.pos_embedding[:, :T, : x.shape[2]].astype(self.dtype)
        x = self.embed_drop(x, deterministic=det)

        x = x.reshape(B * T, x.shape[2], self.dim)
        x = self.space_transformer(x, det)
        x = x[:, 0].reshape(B, T, self.dim)                        # spatial cls

        cls_t = jnp.broadcast_to(self.temporal_token.astype(self.dtype),
                                 (B, 1, self.dim))
        x = jnp.concatenate([cls_t, x], axis=1)                    # (B,T+1,D)
        x = self.temporal_transformer(x, det)

        x = x.mean(axis=1) if self.pool == "mean" else x[:, 0]
        return x.astype(jnp.float32)

    def spatial_cls(self, tokens: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
        """Spatial-transformer cls embedding for frames at a given in-window
        offset. tokens (T, N, dim) embedded patches; offset scalar in
        [0, n_frames). Returns (T, dim).

        Because the positional embedding depends only on a frame's offset
        within its window, a stride-1 sweep over a whole shot needs just
        n_frames spatial passes over the shot — the sweep itself then runs
        only the temporal transformer per window.
        """
        T = tokens.shape[0]
        x = tokens.astype(self.dtype)
        cls_s = jnp.broadcast_to(self.space_token.astype(self.dtype),
                                 (T, 1, self.dim))
        x = jnp.concatenate([cls_s, x], axis=1)                   # (T, N+1, D)
        pos = jax.lax.dynamic_index_in_dim(self.pos_embedding[0], offset,
                                           axis=0, keepdims=False)
        x = x + pos[None, : x.shape[1]].astype(self.dtype)
        x = self.space_transformer(x, True)                       # deterministic
        return x[:, 0].astype(self.dtype)                         # (T, D)

    def encode_spatial_cls(self, window_cls: jnp.ndarray) -> jnp.ndarray:
        """(B, T, dim) per-frame spatial cls embeddings -> (B, dim) latent
        (temporal transformer + pool only)."""
        B = window_cls.shape[0]
        x = window_cls.astype(self.dtype)
        cls_t = jnp.broadcast_to(self.temporal_token.astype(self.dtype),
                                 (B, 1, self.dim))
        x = jnp.concatenate([cls_t, x], axis=1)
        x = self.temporal_transformer(x, True)
        x = x.mean(axis=1) if self.pool == "mean" else x[:, 0]
        return x.astype(jnp.float32)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.encode_tokens(self.embed_frames(x), train)


class ViViT(nn.Module):
    """Encoder + LayerNorm/ELU MLP head (reference ViViT, src/models/ViViT.py:111-224)."""
    image_size: int = 128
    patch_size: int = 16
    n_frames: int = 21
    n_classes: int = 2
    dim: int = 128
    depth: int = 2
    n_heads: int = 4
    d_head: int = 64
    scale_dim: int = 8
    dropout: float = 0.1
    embedd_dropout: float = 0.1
    pool: str = "cls"
    in_channels: int = 3
    alpha: float = 1.0
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    remat: bool = False
    norm_dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = ViViTEncoder(
            self.image_size, self.patch_size, self.n_frames, self.dim, self.depth,
            self.n_heads, self.d_head, self.scale_dim, self.dropout,
            self.embedd_dropout, self.pool, self.in_channels, self.dtype,
            self.use_pallas, self.remat, self.norm_dtype,
        )
        self.mlp_fc1 = nn.Dense(self.dim // 2, dtype=jnp.float32)
        self.mlp_ln = nn.LayerNorm(dtype=jnp.float32)
        self.mlp_fc2 = nn.Dense(self.n_classes, dtype=jnp.float32)

    def classify(self, latent: jnp.ndarray) -> jnp.ndarray:
        x = self.mlp_fc1(latent)
        x = self.mlp_ln(x)
        x = nn.elu(x)
        return self.mlp_fc2(x)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.classify(self.encoder(x, train))

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """Pooled latent — also the GB fusion latent (the reference hooks
        vis_model.mlp[0]'s input, src/models/MultiModal.py:95-97, which is
        exactly the encoder output)."""
        return self.encoder(x, train=False)

    def forward_with_latent(self, x: jnp.ndarray, train: bool = False):
        h = self.encoder(x, train)
        return self.classify(h), h

    def embed_frames(self, x: jnp.ndarray) -> jnp.ndarray:
        """Offset-free per-frame patch embeddings (see ViViTEncoder)."""
        return self.encoder.embed_frames(x)

    def forward_tokens(self, tokens: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Logits from pre-embedded (B, T, N, dim) patch tokens."""
        return self.classify(self.encoder.encode_tokens(tokens, train))

    def spatial_cls(self, tokens: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
        """Per-frame spatial cls at one in-window offset (see ViViTEncoder)."""
        return self.encoder.spatial_cls(tokens, offset)

    def forward_spatial_cls(self, window_cls: jnp.ndarray) -> jnp.ndarray:
        """Logits from precomputed per-frame spatial cls embeddings."""
        return self.classify(self.encoder.encode_spatial_cls(window_cls))
