"""Fused sliding-window preprocess (Pallas TPU kernel + XLA fallback).

The continuous-inference hot path gathers (B, L) frame windows from the
HBM-resident shot, subtracts the channel mean, and casts to bf16
(infer/continuous.py). XLA lowers that as gather -> sub -> convert with an
HBM round-trip for the f32 intermediate. This kernel streams each window's
frames HBM -> VMEM by async DMA using scalar-prefetched start indices
(pltpu.PrefetchScalarGridSpec), normalizes in VMEM, and writes bf16 —
one pass over memory.

Mosaic constraints shape the layout: HBM slices must cover whole tiles, so
frames are viewed as (T, H, W*C) — the minor dim W*C must be a multiple of
128 lanes and H a multiple of 8 sublanes (true for the 128px crop:
384 = 3x128). ``supports_shape`` reports eligibility; callers fall back to
``gather_normalize_xla`` otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PIXEL_MEAN_BGR


def gather_normalize_xla(frames_u8, starts, seq_len: int,
                         out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """XLA fallback: frames (T,H,W,C) uint8 + starts (B,) ->
    (B, L, H, W, C) normalized out_dtype; window s covers [s+1, s+L]."""
    offsets = jnp.arange(1, seq_len + 1)
    idx = jnp.clip(starts[:, None] + offsets[None, :], 0, frames_u8.shape[0] - 1)
    win = frames_u8[idx]
    mean = jnp.asarray(PIXEL_MEAN_BGR, jnp.float32)
    return (win.astype(jnp.float32) - mean).astype(out_dtype)


def supports_shape(h: int, w: int, c: int = 3) -> bool:
    """Mosaic HBM-slice tiling: minor dim (w*c) must fill 128-lane tiles and
    h must fill 8-sublane tiles. c must be 3 — the kernel's flat-pixel
    normalization indexes the BGR mean with j % 3 (_window_kernel), so any
    other channel count would be silently mis-normalized."""
    return c == 3 and (w * c) % 128 == 0 and h % 8 == 0


def _window_kernel(starts_ref, frames_hbm, o_ref, scratch, sem, *, seq_len: int,
                   n_frames: int):
    """Grid step = one window: DMA its frames HBM->VMEM, normalize, emit.
    frames_hbm is (T, H, W*C); channel of flat index j is j % 3."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    start = starts_ref[b]

    def body(t, _):
        src = jnp.clip(start + 1 + t, 0, n_frames - 1)
        dma = pltpu.make_async_copy(frames_hbm.at[src], scratch.at[t], sem)
        dma.start()
        dma.wait()
        return 0

    jax.lax.fori_loop(0, seq_len, body, 0)

    # Mosaic has no direct uint8->f32 cast; hop through int32
    x = scratch[...].astype(jnp.int32).astype(jnp.float32)
    # channel mean built from iota (pallas kernels cannot capture constants)
    c = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=2) % 3
    mean = jnp.where(c == 0, PIXEL_MEAN_BGR[0],
                     jnp.where(c == 1, PIXEL_MEAN_BGR[1], PIXEL_MEAN_BGR[2]))
    o_ref[0] = (x - mean).astype(o_ref.dtype)


def gather_normalize_pallas(frames_u8, starts, seq_len: int,
                            out_dtype=jnp.bfloat16,
                            interpret: bool = False) -> jnp.ndarray:
    """Pallas window gather + normalize. frames (T,H,W,C) uint8, starts (B,).
    Requires ``supports_shape(H, W, C)`` (128px crop qualifies)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, H, W, C = frames_u8.shape
    B = starts.shape[0]
    flat = frames_u8.reshape(T, H, W * C)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],   # frames stay in HBM
        out_specs=pl.BlockSpec((1, seq_len, H, W * C), lambda b, *_: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((seq_len, H, W * C), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
    )

    kernel = functools.partial(_window_kernel, seq_len=seq_len, n_frames=T)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, seq_len, H, W * C), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts.astype(jnp.int32), flat)
    return out.reshape(B, seq_len, H, W, C)
