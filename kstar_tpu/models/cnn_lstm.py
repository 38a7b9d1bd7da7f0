"""CnnLSTM 0D classifier (rebuild of reference src/models/CnnLSTM.py).

Pipeline: input noise -> 2x Conv1d over time (channels = conv_dim) + BN +
ReLU -> bidirectional LSTM *over the channel axis* (a reference quirk: the
conv output (B, C, T') is fed to the LSTM as C tokens of feature size T',
reference src/models/CnnLSTM.py:51,99) -> attention pooling -> MLP head.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .common import AttentionPool, BiLSTM, MLPHead, NoiseLayer

Dtype = Any


class CnnLSTM(nn.Module):
    seq_len: int = 21
    n_features: int = 18
    conv_dim: int = 64
    conv_kernel: int = 3
    conv_stride: int = 1
    conv_padding: int = 1
    lstm_dim: int = 128
    n_layers: int = 4
    bidirectional: bool = True
    n_classes: int = 2
    noise_std: float = 1e-3
    dtype: Dtype = jnp.float32

    def setup(self):
        self.noise = NoiseLayer(std=self.noise_std)
        self.conv1 = nn.Conv(self.conv_dim, (self.conv_kernel,), strides=(self.conv_stride,),
                             padding=[(self.conv_padding, self.conv_padding)], dtype=self.dtype)
        self.conv2 = nn.Conv(self.conv_dim, (self.conv_kernel,), strides=(self.conv_stride,),
                             padding=[(self.conv_padding, self.conv_padding)], dtype=self.dtype)
        self.bn = nn.BatchNorm(dtype=jnp.float32)
        self.lstm = BiLSTM(self.lstm_dim, self.n_layers, self.bidirectional, self.dtype)
        self.pool = AttentionPool(self.lstm_dim, self.dtype)
        out_dim = self.lstm_dim * (2 if self.bidirectional else 1)
        self.head = MLPHead(out_dim // 2, self.n_classes, norm="batch", act="relu",
                            dtype=jnp.float32)

    def _encode(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        # x: (B, T, F)
        x = self.noise(x, deterministic=not train)
        x = x.astype(self.dtype)
        x = self.conv1(x)
        x = self.conv2(x)
        x = self.bn(x, use_running_average=not train)
        x = nn.relu(x).astype(self.dtype)       # (B, T', C)
        # LSTM over channels: C tokens of feature size T' (reference quirk)
        x = x.transpose(0, 2, 1)                 # (B, C, T')
        h = self.lstm(x)                         # (B, C, D_out)
        return self.pool(h).astype(jnp.float32)  # (B, D_out)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.head(self._encode(x, train), train=train)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._encode(x, train=False)
