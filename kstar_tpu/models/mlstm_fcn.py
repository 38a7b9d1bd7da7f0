"""MLSTM-FCN 0D classifier (rebuild of reference src/models/MLSTM_FCN.py).

Two parallel branches over the (B, T, F) window:
  FCN : 2x (valid-padding Conv1d + BN + LeakyReLU + squeeze-excite), mean
        pooled over time (reference :106-111).
  RNN : bidirectional attention-LSTM over time (reference SelfAttentionRnn :46-82).
Concat -> converter Dense -> MLP head.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .common import AttentionPool, BiLSTM, MLPHead, NoiseLayer, SqueezeExcite1D

Dtype = Any


class _ConvBlock(nn.Module):
    """Conv1d (VALID padding, as torch Conv1d default padding=0) + BN + LeakyReLU
    (reference ConvBlock, src/models/MLSTM_FCN.py:36-44)."""
    channels: int
    kernel: int
    stride: int
    alpha: float
    dtype: Dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.channels, (self.kernel,), strides=(self.stride,),
                    padding="VALID", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        return nn.leaky_relu(x, negative_slope=self.alpha).astype(self.dtype)


class MLSTMFCN(nn.Module):
    n_features: int = 18
    fcn_dim: int = 128
    kernel_size: int = 5
    stride: int = 1
    seq_len: int = 21
    lstm_dim: int = 128
    lstm_n_layers: int = 1
    lstm_bidirectional: bool = True
    lstm_dropout: float = 0.1
    reduction: int = 16
    alpha: float = 1.0
    n_classes: int = 2
    noise_std: float = 1e-3
    dtype: Dtype = jnp.float32

    def setup(self):
        self.noise = NoiseLayer(std=self.noise_std)
        self.fcn1 = _ConvBlock(self.fcn_dim, self.kernel_size, self.stride, self.alpha, self.dtype)
        self.se1 = SqueezeExcite1D(self.fcn_dim, self.reduction, self.dtype)
        self.fcn2 = _ConvBlock(2 * self.fcn_dim, self.kernel_size, self.stride, self.alpha, self.dtype)
        self.se2 = SqueezeExcite1D(2 * self.fcn_dim, self.reduction, self.dtype)
        self.rnn = BiLSTM(self.lstm_dim, self.lstm_n_layers, self.lstm_bidirectional, self.dtype)
        self.pool = AttentionPool(self.lstm_dim, self.dtype)
        rnn_out = self.lstm_dim * (2 if self.lstm_bidirectional else 1)
        feat = rnn_out + 2 * self.fcn_dim
        self.converter = nn.Dense(feat, dtype=jnp.float32)
        self.head = MLPHead(feat // 2, self.n_classes, norm="batch",
                            act="leaky_relu", alpha=self.alpha, dtype=jnp.float32)

    def _encode(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = self.noise(x, deterministic=not train)
        x = x.astype(self.dtype)

        h_rnn = self.pool(self.rnn(x))                     # (B, rnn_out)

        f = self.fcn1(x, train)
        f = self.se1(f)
        f = self.fcn2(f, train)
        f = self.se2(f)
        h_fcn = f.mean(axis=1)                             # (B, 2*fcn_dim)

        h = jnp.concatenate([h_rnn, h_fcn], axis=-1).astype(jnp.float32)
        return self.converter(h)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.head(self._encode(x, train), train=train)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._encode(x, train=False)
