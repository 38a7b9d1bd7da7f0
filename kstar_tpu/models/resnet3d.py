"""3D ResNet backbone shared by the SlowFast pathways.

Rebuild of reference src/models/resnet.py: Bottleneck3D (1x1x1 -> 1x3x3
stride -> 1x1x1 x4 expand) with optional temporal 3x1x1 head conv
(head_conv=3), squeeze-excite + Swish on every block (the reference
constructs all blocks with index=0, reference :267 _make_layer never passes
index, so the `index % 2 == 0` SE gate is always true — replicated here),
and the slow/fast channel arithmetic m=16, slow inplanes (m + m/alpha),
lateral-concat growth after each stage (reference :263).

SubBatchNorm3d (multigrid training) is rebuilt in subbn.py and wired here via
``bn_splits``: when set, bn1/bn2/bn3 become SubBatchNorm while the shortcut
projection and the stem keep plain BatchNorm — exactly the reference's split
(src/models/resnet.py:129-141 swap only the block BNs; the downsample at
:248-252 and layer0 at :220-225 stay nn.BatchNorm3d). Every reference entry
path passes base_bn_splits=None (src/models/slowfast.py:108-109), so the
default here is None too.

TPU-first: channels-last NDHWC, bf16 compute / fp32 BN.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .common import act_relu
from .subbn import SubBatchNorm

Dtype = Any
EXPANSION = 4


def _round_width(width: int, multiplier: float = 0.0625, min_width: int = 8,
                 divisor: int = 8) -> int:
    """Squeeze-excite bottleneck width (reference Bottleneck3D.round_width,
    src/models/resnet.py:154-169)."""
    if not multiplier:
        return width
    w = width * multiplier
    width_out = max(min_width, int(w + divisor / 2) // divisor * divisor)
    if width_out < 0.9 * w:
        width_out += divisor
    return int(width_out)


class Bottleneck3D(nn.Module):
    planes: int
    stride: int = 1
    head_conv: int = 1
    has_shortcut_proj: bool = False
    dtype: Dtype = jnp.float32
    bn_splits: Optional[int] = None

    def _bn(self, out, name, train):
        """Block BN: SubBatchNorm when bn_splits is set (reference
        src/models/resnet.py:129-141), else plain BatchNorm."""
        if self.bn_splits:
            return SubBatchNorm(num_splits=self.bn_splits, name=name)(out, train)
        return nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                            name=name)(out)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ra = not train
        residual = x

        if self.head_conv == 3:
            out = nn.Conv(self.planes, (3, 1, 1), padding=[(1, 1), (0, 0), (0, 0)],
                          use_bias=False, dtype=self.dtype, name="conv1")(x)
        else:
            out = nn.Conv(self.planes, (1, 1, 1), use_bias=False,
                          dtype=self.dtype, name="conv1")(x)
        out = self._bn(out, "bn1", train)
        out = act_relu(out).astype(self.dtype)

        out = nn.Conv(self.planes, (1, 3, 3), strides=(1, self.stride, self.stride),
                      padding=[(0, 0), (1, 1), (1, 1)], use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = self._bn(out, "bn2", train)
        out = act_relu(out).astype(self.dtype)

        # squeeze-excite (applied on every block, see module docstring)
        width = _round_width(self.planes)
        se = out.mean(axis=(1, 2, 3), keepdims=True)                 # (B,1,1,1,C)
        se = nn.Conv(width, (1, 1, 1), dtype=self.dtype, name="se_fc1")(se)
        se = act_relu(se)
        se = nn.Conv(self.planes, (1, 1, 1), dtype=self.dtype, name="se_fc2")(se)
        se = nn.sigmoid(se.astype(jnp.float32)).astype(out.dtype)
        out = out * se

        out = nn.swish(out)  # Swish x*sigmoid(x) (reference :63-81)

        out = nn.Conv(self.planes * EXPANSION, (1, 1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = self._bn(out, "bn3", train)

        if self.has_shortcut_proj:
            residual = nn.Conv(self.planes * EXPANSION, (1, 1, 1),
                               strides=(1, self.stride, self.stride), use_bias=False,
                               dtype=self.dtype, name="shortcut_conv")(x)
            residual = nn.BatchNorm(use_running_average=ra, dtype=jnp.float32,
                                    name="shortcut_bn")(residual)

        return act_relu(out + residual).astype(self.dtype)


class ResStage(nn.Module):
    """One _make_layer stage (reference src/models/resnet.py:245-265): first
    block projects when stride != 1 or channel mismatch."""
    planes: int
    blocks: int
    stride: int = 1
    head_conv: int = 1
    dtype: Dtype = jnp.float32
    bn_splits: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        needs_proj = self.stride != 1 or x.shape[-1] != self.planes * EXPANSION
        x = Bottleneck3D(self.planes, self.stride, self.head_conv,
                         needs_proj, self.dtype, self.bn_splits,
                         name="block_0")(x, train)
        for i in range(1, self.blocks):
            x = Bottleneck3D(self.planes, 1, self.head_conv, False,
                             self.dtype, self.bn_splits, name=f"block_{i}")(x, train)
        return x


class Stem3D(nn.Module):
    """layer0: 1x7x7 s(1,2,2) conv + BN + ReLU + 1x3x3 s(1,2,2) maxpool
    (reference src/models/resnet.py:219-230)."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.features, (1, 7, 7), strides=(1, 2, 2),
                    padding=[(0, 0), (3, 3), (3, 3)], dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn")(x)
        x = act_relu(x).astype(self.dtype)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=[(0, 0), (1, 1), (1, 1)])
        return x
