"""Shared model building blocks (flax.linen).

Conventions (TPU-native):
  * channels-last layouts everywhere: 0D (B, T, F); video (B, T, H, W, C).
  * ``dtype`` is the compute dtype (bfloat16 on TPU for MXU throughput);
    params and normalization statistics stay float32.
  * logits are returned float32 and unbounded (reference models emit raw
    logits; tests assert outputs outside (0,1), reference test/test_model.py:135-139).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class NoiseLayer(nn.Module):
    """Train-only additive Gaussian input noise (reference
    src/models/NoiseLayer.py:5-16)."""
    mean: float = 0.0
    std: float = 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.std == 0.0:
            return x
        rng = self.make_rng("noise")
        return x + self.mean + self.std * jax.random.normal(rng, x.shape, x.dtype)


class MLPHead(nn.Module):
    """Two-layer classification head ``Linear -> Norm -> act -> Linear``
    used by every reference classifier (e.g. R2Plus1D src/models/R2Plus1D.py:243-248
    with BatchNorm+ELU; ViViT src/models/ViViT.py:165-170 with LayerNorm+ELU)."""
    hidden: int
    n_classes: int = 2
    norm: str = "batch"          # batch | layer
    act: str = "elu"             # elu | relu | leaky_relu | gelu
    alpha: float = 1.0           # ELU alpha / LeakyReLU slope
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        if self.norm == "batch":
            x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="norm")(x)
        else:
            x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        x = apply_act(x, self.act, self.alpha)
        x = nn.Dense(self.n_classes, dtype=jnp.float32, name="fc2")(x)
        return x.astype(jnp.float32)


def apply_act(x: jnp.ndarray, act: str, alpha: float = 1.0) -> jnp.ndarray:
    if act == "elu":
        # torch nn.ELU(alpha): x if x > 0 else alpha * (exp(x) - 1)
        if alpha == 1.0:
            return nn.elu(x)
        return jnp.where(x > 0, x, alpha * jnp.expm1(x))
    if act == "relu":
        return nn.relu(x)
    if act == "leaky_relu":
        return nn.leaky_relu(x, negative_slope=alpha)
    if act == "gelu":
        return nn.gelu(x)
    raise ValueError(act)


# ---------------------------------------------------------------------------
# Guided backprop (reference GuidedBackpropReLU,
# src/visualization/visualize_cam.py:21-54)
# ---------------------------------------------------------------------------

# Trace-time flag flipped by viz.xai.guided_backprop(); when set, the conv
# stacks' activations route through guided_leaky_relu so input-space saliency
# keeps only positive-input AND positive-gradient paths. Read during tracing
# only — the saliency path runs un-jitted (viz/xai.py), so flipping it cannot
# poison a jit cache.
GUIDED_BACKPROP = [False]


def _glr_fwd(x, alpha):
    return _glr(x, alpha), x


def _glr_bwd(alpha, x, g):
    return (g * (x > 0).astype(g.dtype) * (g > 0).astype(g.dtype),)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _glr(x, alpha):
    return jnp.where(x > 0, x, alpha * x)


_glr.defvjp(_glr_fwd, _glr_bwd)


def guided_leaky_relu(x: jnp.ndarray, alpha: float = 0.01) -> jnp.ndarray:
    """Leaky ReLU whose VJP is the guided-backprop rule: the reference's
    custom Function passes gradient only where input > 0 and grad > 0
    (reference visualize_cam.py:35-54); with alpha=0 this is exactly it.
    The custom_vjp is defined once at module scope so repeated traces share
    one function identity (per-call definitions would defeat jit caching)."""
    return _glr(x, alpha)


def act_leaky_relu(x: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """The conv stacks' LeakyReLU, guided-backprop-aware (see above)."""
    if GUIDED_BACKPROP[0]:
        return guided_leaky_relu(x, alpha)
    return nn.leaky_relu(x, negative_slope=alpha)


def act_relu(x: jnp.ndarray) -> jnp.ndarray:
    """ReLU, guided-backprop-aware — the 3D-ResNet/SlowFast stacks route
    through this so viz.xai.guided_backprop() covers them too (the
    reference's GuidedBackpropReLUModel swaps EVERY ReLU module,
    visualize_cam.py:57-66); alpha=0 makes guided_leaky_relu exactly the
    reference rule."""
    if GUIDED_BACKPROP[0]:
        return guided_leaky_relu(x, 0.0)
    return nn.relu(x)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """tanh-approximated GELU matching the reference's custom GELU
    (reference src/models/transformer.py:35-37)."""
    return nn.gelu(x, approximate=True)


class SqueezeExcite1D(nn.Module):
    """Squeeze-and-excitation over (B, T, C) channels-last sequences
    (reference SqueezeExciteBlock, src/models/MLSTM_FCN.py:17-32)."""
    channels: int
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=1)  # (B, C)
        s = nn.Dense(max(self.channels // self.reduction, 1), use_bias=False, dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Dense(self.channels, use_bias=False, dtype=self.dtype)(s)
        s = nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)
        return x * s[:, None, :]


class AttentionPool(nn.Module):
    """Self-attention pooling over LSTM outputs (reference CnnLSTM.attention,
    src/models/CnnLSTM.py:72-75): ``A = softmax(w_s2(tanh(w_s1(H))), axis=-1)``
    (softmax over the *hidden* axis, a reference quirk kept for parity),
    then ``mean_d(A^T H)``."""
    hidden_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        # h: (B, T, D_out)
        a = nn.Dense(self.hidden_dim, dtype=self.dtype, name="w_s1")(h)
        a = nn.Dense(self.hidden_dim, dtype=self.dtype, name="w_s2")(jnp.tanh(a))
        a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(h.dtype)  # (B, T, d)
        pooled = jnp.einsum("btd,bte->bde", a, h)  # A^T H
        return pooled.mean(axis=1)  # (B, D_out)


class BiLSTM(nn.Module):
    """Bidirectional LSTM over (B, T, F) returning (B, T, 2*hidden) (or
    (B, T, hidden) if unidirectional). Zero initial carry, matching the
    reference's explicit zero h_0/c_0 (src/models/CnnLSTM.py:96-98)."""
    hidden: int
    n_layers: int = 1
    bidirectional: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for layer in range(self.n_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                         name=f"fwd_{layer}")(x)
            if self.bidirectional:
                bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                             reverse=True, keep_order=True, name=f"bwd_{layer}")(x)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
        return x


def sinusoidal_positions(max_len: int, d_model: int) -> jnp.ndarray:
    """Sinusoidal positional table (max_len, d_model) with the reference's
    odd-dimension handling (reference PositionalEncoding,
    src/models/transformer.py:10-33)."""
    import numpy as np
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * -(np.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    cos = np.cos(position * div)
    if d_model % 2 != 0:
        pe[:, 1::2] = cos[:, :-1]
    else:
        pe[:, 1::2] = cos
    return jnp.asarray(pe)
