"""R(2+1)D — factorized spatiotemporal conv video classifier.

Rebuild of reference src/models/R2Plus1D.py: every 3D conv is factorized into
a spatial (1,k,k) conv followed by a temporal (k,1,1) conv with the paper's
middle-channel formula (reference :150-155); residual blocks with optional
(2,2,2)-stride downsampling; stem 3 -> 45 -> 32 (spatial 1x7x7 s(1,2,2) then
temporal 3x1x1); stages 32/32/64/64/128; global average pool; BatchNorm+ELU
MLP head (reference :243-248).

TPU-first notes: channels-last (B, T, H, W, C) NDHWC convs map directly onto
MXU conv tiling; compute in bfloat16 with fp32 BN; the stem's spatial conv
over 21x128x128 is the FLOPs hot spot and XLA fuses the BN+LeakyReLU chain
into it.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .common import MLPHead, act_leaky_relu

Dtype = Any


def _middle_channels(kt: int, ks: int, cin: int, cout: int) -> int:
    """(2+1)D intermediate width: floor((t*k^2*Cin*Cout) / (k^2*Cin + t*Cout))
    (reference src/models/R2Plus1D.py:150-155)."""
    return int(math.floor((kt * ks * ks * cin * cout) / (ks * ks * cin + kt * cout)))


def _sym(p: Tuple[int, int, int]):
    """torch-style symmetric padding triple -> flax [(lo,hi)] list.

    Stride-2 convs pad differently under XLA 'SAME' (asymmetric) than torch
    (symmetric); explicit padding keeps numerical parity with the reference.
    """
    return [(p[0], p[0]), (p[1], p[1]), (p[2], p[2])]


class Conv3dBN(nn.Module):
    """Conv3d + BatchNorm + LeakyReLU (reference Conv3dBlock, :25-59)."""
    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (1, 1, 1)
    alpha: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding=_sym(self.padding), use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        return act_leaky_relu(x, self.alpha).astype(self.dtype)


class SpatioTemporalConv(nn.Module):
    """Factorized (2+1)D conv: spatial (1,k,k) then temporal (kt,1,1), each as
    Conv3dBN (reference SpatioTemporalConv, :115-161)."""
    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    alpha: float = 0.01
    is_first: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kt, kh, kw = self.kernel
        st, sh, sw = self.stride
        pt, ph, pw = kt // 2, kh // 2, kw // 2
        if self.is_first:
            # stem: fixed middle width 45, spatial 1x7x7 pad (0,3,3) then
            # temporal 3x1x1 pad (1,0,0) (reference :137-146)
            mid = 45
            x = Conv3dBN(mid, (1, kh, kw), (1, sh, sw), (0, ph, pw), self.alpha,
                         self.dtype, name="spatial")(x, train)
            x = Conv3dBN(self.features, (3, 1, 1), (st, 1, 1), (1, 0, 0), self.alpha,
                         self.dtype, name="temporal")(x, train)
        else:
            cin = x.shape[-1]
            mid = max(_middle_channels(kt, kh, cin, self.features), 1)
            x = Conv3dBN(mid, (1, kh, kw), (1, sh, sw), (0, ph, pw), self.alpha,
                         self.dtype, name="spatial")(x, train)
            x = Conv3dBN(self.features, (kt, 1, 1), (st, 1, 1), (pt, 0, 0), self.alpha,
                         self.dtype, name="temporal")(x, train)
        return x


class STResBlock(nn.Module):
    """Residual block of two (2+1)D convs; downsampling strides (2,2,2) with a
    1x1x1 stride-2 projection shortcut (reference SpatioTemporalResBlock,
    :164-188)."""
    features: int
    kernel: int = 3
    downsample: bool = False
    alpha: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = (self.kernel,) * 3
        stride = (2, 2, 2) if self.downsample else (1, 1, 1)
        res = SpatioTemporalConv(self.features, k, stride, self.alpha,
                                 dtype=self.dtype, name="conv1")(x, train)
        res = SpatioTemporalConv(self.features, k, (1, 1, 1), self.alpha,
                                 dtype=self.dtype, name="conv2")(res, train)
        if self.downsample:
            x = SpatioTemporalConv(self.features, (1, 1, 1), (2, 2, 2), self.alpha,
                                   dtype=self.dtype, name="shortcut")(x, train)
        return act_leaky_relu(x + res, self.alpha).astype(res.dtype)


class STResLayer(nn.Module):
    """First block optionally downsamples, remaining blocks keep shape
    (reference SpatioTemporalResLayer, :190-204)."""
    features: int
    layer_size: int
    downsample: bool = False
    alpha: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = STResBlock(self.features, 3, self.downsample, self.alpha,
                       self.dtype, name="block_0")(x, train)
        for i in range(1, self.layer_size):
            x = STResBlock(self.features, 3, False, self.alpha,
                           self.dtype, name=f"block_{i}")(x, train)
        return x


class R2Plus1DNet(nn.Module):
    """Backbone: stem + 4 residual stages + global average pool
    (reference R2Plus1DNet, :207-226)."""
    layer_sizes: Sequence[int] = (1, 2, 2, 1)
    alpha: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # x: (B, T, H, W, C)
        x = x.astype(self.dtype)
        x = SpatioTemporalConv(32, (1, 7, 7), (1, 2, 2), self.alpha, is_first=True,
                               dtype=self.dtype, name="conv1")(x, train)
        x = STResLayer(32, self.layer_sizes[0], False, self.alpha, self.dtype, name="conv2")(x, train)
        x = STResLayer(64, self.layer_sizes[1], True, self.alpha, self.dtype, name="conv3")(x, train)
        x = STResLayer(64, self.layer_sizes[2], True, self.alpha, self.dtype, name="conv4")(x, train)
        x = STResLayer(128, self.layer_sizes[3], True, self.alpha, self.dtype, name="conv5")(x, train)
        return x.mean(axis=(1, 2, 3)).astype(jnp.float32)  # (B, 128)


class R2Plus1DClassifier(nn.Module):
    """Backbone + BatchNorm/ELU MLP head (reference R2Plus1DClassifier, :228-297)."""
    image_size: int = 128
    n_frames: int = 21
    n_classes: int = 2
    layer_sizes: Sequence[int] = (1, 2, 2, 1)
    alpha: float = 0.01
    in_channels: int = 3
    dtype: Dtype = jnp.float32

    def setup(self):
        self.backbone = R2Plus1DNet(tuple(self.layer_sizes), self.alpha, self.dtype)
        # head ELU uses the same alpha as the backbone's LeakyReLU slope
        # (reference R2Plus1DClassifier passes one alpha to both, :228-248)
        self.head = MLPHead(64, self.n_classes, norm="batch", act="elu",
                            alpha=self.alpha, dtype=jnp.float32)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.head(self.backbone(x, train), train=train)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.backbone(x, train=False)
