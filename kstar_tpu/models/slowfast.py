"""SlowFast two-pathway video classifier.

Rebuild of reference src/models/slowfast.py: the fast pathway runs on every
tau_fast-th frame and produces lateral features via temporally-strided
(alpha+2,1,1)/(alpha,1,1) convs after the stem and stages 1-3
(reference :56-63); the slow pathway runs on every (alpha*tau_fast)-th frame
and concatenates each lateral along channels before its next stage
(reference :21-31). Outputs are the concat of both globally-pooled paths;
BatchNorm+ELU MLP head (reference SlowFastClassifier :143-161).

Channel arithmetic (m = 16): fast stem m/alpha; fast stages m/alpha, 2m/alpha,
4m/alpha, 8m/alpha (head_conv=3 everywhere); slow stages m, 2m, 4m, 8m with
head_conv=1 for stages 1-2 and 3 for stages 3-4 (reference resnet.py:232-243).

TPU-first: both pathways are plain NDHWC conv stacks — XLA pipelines them;
temporal subsampling is a strided slice fused into the first conv's input.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .common import MLPHead
from .resnet3d import EXPANSION, ResStage, Stem3D

Dtype = Any


class FastPath(nn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)
    alpha: int = 4
    m: int = 16
    dtype: Dtype = jnp.float32
    bn_splits: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        a, m = self.alpha, self.m
        lat_kernel, lat_stride = (a + 2, 1, 1), (a, 1, 1)

        def lateral(feat, name):
            c = feat.shape[-1]
            return nn.Conv(c, lat_kernel, strides=lat_stride, padding=[(1, 1), (0, 0), (0, 0)],
                           use_bias=False, dtype=self.dtype, name=name)(feat)

        laterals: List[jnp.ndarray] = []
        x = Stem3D(m // a, self.dtype, name="stem")(x, train)
        laterals.append(lateral(x, "l_stem"))
        x = ResStage(m // a, self.layers[0], 1, 3, self.dtype, self.bn_splits, name="stage1")(x, train)
        laterals.append(lateral(x, "l_stage1"))
        x = ResStage(2 * m // a, self.layers[1], 2, 3, self.dtype, self.bn_splits, name="stage2")(x, train)
        laterals.append(lateral(x, "l_stage2"))
        x = ResStage(4 * m // a, self.layers[2], 2, 3, self.dtype, self.bn_splits, name="stage3")(x, train)
        laterals.append(lateral(x, "l_stage3"))
        x = ResStage(8 * m // a, self.layers[3], 2, 3, self.dtype, self.bn_splits, name="stage4")(x, train)
        x = x.mean(axis=(1, 2, 3))
        return x, laterals


class SlowPath(nn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)
    alpha: int = 4
    m: int = 16
    dtype: Dtype = jnp.float32
    bn_splits: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, laterals: List[jnp.ndarray], train: bool = False):
        m = self.m
        x = Stem3D(m, self.dtype, name="stem")(x, train)
        x = jnp.concatenate([x, laterals[0]], axis=-1)
        x = ResStage(m, self.layers[0], 1, 1, self.dtype, self.bn_splits, name="stage1")(x, train)
        x = jnp.concatenate([x, laterals[1]], axis=-1)
        x = ResStage(2 * m, self.layers[1], 2, 1, self.dtype, self.bn_splits, name="stage2")(x, train)
        x = jnp.concatenate([x, laterals[2]], axis=-1)
        x = ResStage(4 * m, self.layers[2], 2, 3, self.dtype, self.bn_splits, name="stage3")(x, train)
        x = jnp.concatenate([x, laterals[3]], axis=-1)
        x = ResStage(8 * m, self.layers[3], 2, 3, self.dtype, self.bn_splits, name="stage4")(x, train)
        return x.mean(axis=(1, 2, 3))


class SlowFastEncoder(nn.Module):
    """Temporal split + both pathways + concat (reference SlowFastEncoder,
    src/models/slowfast.py:92-141)."""
    layers: Sequence[int] = (3, 4, 6, 3)
    alpha: int = 4
    tau_fast: int = 1
    m: int = 16
    dtype: Dtype = jnp.float32
    bn_splits: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # x: (B, T, H, W, C); slow sees stride alpha*tau_fast, fast stride tau_fast
        x = x.astype(self.dtype)
        x_slow = x[:, :: self.alpha * self.tau_fast]
        x_fast = x[:, :: self.tau_fast]
        h_fast, laterals = FastPath(tuple(self.layers), self.alpha, self.m,
                                    self.dtype, self.bn_splits,
                                    name="fast")(x_fast, train)
        h_slow = SlowPath(tuple(self.layers), self.alpha, self.m,
                          self.dtype, self.bn_splits,
                          name="slow")(x_slow, laterals, train)
        return jnp.concatenate([h_slow, h_fast], axis=-1).astype(jnp.float32)


class SlowFast(nn.Module):
    """Encoder + MLP head (reference SlowFast, src/models/slowfast.py:163-195)."""
    image_size: int = 128
    n_frames: int = 20
    n_classes: int = 2
    layers: Sequence[int] = (3, 4, 6, 3)
    alpha: int = 4
    tau_fast: int = 1
    in_channels: int = 3
    base_width: int = 16
    dtype: Dtype = jnp.float32
    base_bn_splits: Optional[int] = None

    def setup(self):
        self.encoder = SlowFastEncoder(tuple(self.layers), self.alpha, self.tau_fast,
                                       self.base_width, self.dtype,
                                       self.base_bn_splits)
        out_dim = 8 * self.base_width * EXPANSION + 8 * self.base_width // self.alpha * EXPANSION
        self.head = MLPHead(out_dim // 2, self.n_classes, norm="batch", act="elu",
                            dtype=jnp.float32)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.head(self.encoder(x, train), train=train)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.encoder(x, train=False)
