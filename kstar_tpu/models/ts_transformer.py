"""0D time-series Transformer (rebuild of reference src/models/transformer.py).

Pipeline: input noise -> 2x Conv1d feature filter (+BN+ReLU) -> sinusoidal
positional encoding -> causally-masked post-norm transformer encoder with
tanh-GELU feedforward -> mean pool over time -> connector (Dense+LN+GELU);
classifier head Dense->LN->GELU->Dense (reference :133-138).

TPU-first notes: the whole window (21x18) is tiny; attention runs as one
fused batched matmul on the MXU in bf16, mask baked in at trace time.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import NoiseLayer, gelu_tanh, sinusoidal_positions

Dtype = Any


class _CausalSelfAttention(nn.Module):
    feature_dims: int
    n_heads: int
    dropout: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, T, D = x.shape
        h = self.n_heads
        dh = D // h
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, h, dh).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / jnp.sqrt(dh)
        mask = jnp.tril(jnp.ones((T, T), dtype=bool))  # causal (reference :106-109)
        logits = jnp.where(mask[None, None], logits, -jnp.inf)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3).reshape(B, T, D)
        return nn.Dense(D, dtype=self.dtype, name="proj")(out)


class _PostNormBlock(nn.Module):
    """torch nn.TransformerEncoderLayer default (norm_first=False):
    x = LN(x + attn(x)); x = LN(x + ff(x))."""
    feature_dims: int
    n_heads: int
    dim_feedforward: int
    dropout: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        a = _CausalSelfAttention(self.feature_dims, self.n_heads, self.dropout,
                                 self.dtype)(x, deterministic)
        a = nn.Dropout(self.dropout)(a, deterministic=deterministic)
        x = nn.LayerNorm(dtype=jnp.float32)(x + a).astype(self.dtype)
        f = nn.Dense(self.dim_feedforward, dtype=self.dtype)(x)
        f = gelu_tanh(f)
        f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
        f = nn.Dense(self.feature_dims, dtype=self.dtype)(f)
        f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
        x = nn.LayerNorm(dtype=jnp.float32)(x + f).astype(self.dtype)
        return x


class TransformerEncoder0D(nn.Module):
    """Encoder producing the (B, feature_dims) latent
    (reference TransformerEncoder, src/models/transformer.py:39-113)."""
    n_features: int = 18
    kernel_size: int = 5
    feature_dims: int = 128
    max_len: int = 21
    n_layers: int = 4
    n_heads: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1
    noise_std: float = 1e-3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # x: (B, T, F)
        det = not train
        x = NoiseLayer(std=self.noise_std)(x, deterministic=det)
        x = x.astype(self.dtype)

        # conv feature filter over time (reference :64-69)
        x = nn.Conv(self.feature_dims, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="filter1")(x)
        x = nn.Conv(self.feature_dims, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="filter2")(x)
        x = nn.BatchNorm(use_running_average=det, dtype=jnp.float32, name="filter_bn")(x)
        x = nn.relu(x).astype(self.dtype)

        x = x + sinusoidal_positions(x.shape[1], self.feature_dims).astype(self.dtype)[None]

        for i in range(self.n_layers):
            x = _PostNormBlock(self.feature_dims, self.n_heads, self.dim_feedforward,
                               self.dropout, self.dtype, name=f"block_{i}")(x, det)

        x = x.mean(axis=1)  # (B, D)

        # connector (reference :82-86)
        x = nn.Dense(self.feature_dims, dtype=self.dtype, name="connector")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="connector_ln")(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU default (erf)
        return x.astype(jnp.float32)


class Transformer0D(nn.Module):
    """Encoder + classifier (reference Transformer, src/models/transformer.py:115-153)."""
    n_features: int = 18
    kernel_size: int = 5
    feature_dims: int = 128
    max_len: int = 21
    n_layers: int = 4
    n_heads: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1
    cls_dims: int = 128
    n_classes: int = 2
    noise_std: float = 1e-3
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = TransformerEncoder0D(
            self.n_features, self.kernel_size, self.feature_dims, self.max_len,
            self.n_layers, self.n_heads, self.dim_feedforward, self.dropout,
            self.noise_std, self.dtype,
        )
        self.cls_fc1 = nn.Dense(self.cls_dims, dtype=jnp.float32)
        self.cls_ln = nn.LayerNorm(dtype=jnp.float32)
        self.cls_fc2 = nn.Dense(self.n_classes, dtype=jnp.float32)

    def classify(self, latent: jnp.ndarray) -> jnp.ndarray:
        x = self.cls_fc1(latent)
        x = self.cls_ln(x)
        x = gelu_tanh(x)
        return self.cls_fc2(x)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.classify(self.encoder(x, train))

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """Latent extraction (reference Transformer.encode). For GB fusion the
        penultimate latent is the classifier input, i.e. this encoder output
        (the reference hooks ts_model.classifier[0], src/models/MultiModal.py:97)."""
        return self.encoder(x, train=False)

    def forward_with_latent(self, x: jnp.ndarray, train: bool = False):
        h = self.encoder(x, train)
        return self.classify(h), h
