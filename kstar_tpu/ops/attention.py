"""Fused small-sequence attention (Pallas TPU kernel + XLA fallback).

ViViT's factorized attention runs over many short sequences — 65 spatial
tokens per frame across B*T rows, 22 temporal tokens per clip (SURVEY.md §5).
This kernel fuses QK^T -> masked softmax -> AV for one batch row per grid
step entirely in VMEM, padding the token axis to the 128-lane tile. For
these shapes XLA's unfused path materializes the (N, N) score tensor in HBM
between ops; the fused kernel keeps it on-chip.

Fallback: plain einsum attention (used on CPU, under interpret tests, or
when shapes don't fit the kernel's assumptions). Enable per-model with
``use_pallas=True`` (models/vivit.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def reference_attention(q, k, v, scale: float):
    """XLA fallback: q,k,v (B, H, N, D) -> (B, H, N, D)."""
    logits = jnp.einsum("bhid,bhjd->bhij", q, k).astype(jnp.float32) * scale
    attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhij,bhjd->bhid", attn, v)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    from jax.experimental import pallas as pl  # noqa: F401

    q = q_ref[0].astype(jnp.float32)             # (Np, Dp)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale                                     # (Np, Np)

    # mask padded keys
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col < n_valid, scores, -1e30)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    out = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float, interpret: bool = False) -> jnp.ndarray:
    """Pallas fused attention for (B, H, N, D) with small N.

    Pads N up to a 128 multiple and D to 128; one grid step per (b, h) row.
    Falls back to the XLA path if the padded shapes would be degenerate.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, N, D = q.shape
    Np = _round_up(max(N, 8), 128)
    Dp = _round_up(max(D, 8), 128)
    if Np > 512 or Dp > 256:
        return reference_attention(q, k, v, scale)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, Np - N), (0, Dp - D))).reshape(
            B * H, Np, Dp)

    qp, kp, vp = pad(q), pad(k), pad(v)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, n_valid=N),
        out_shape=jax.ShapeDtypeStruct((B * H, Np, Dp), q.dtype),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, Np, Dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, Dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, Dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Np, Dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, kp, vp)

    return out.reshape(B, H, Np, Dp)[:, :, :N, :D]
