"""Fused spatial-cls-table Pallas kernel — the sweep's flagship hot op.

The continuous-inference fast path precomputes, per shot, the ViViT spatial
transformer's cls embedding for every (in-window offset, frame) pair
(models/vivit.py ``spatial_cls``; reference spatial transformer
src/models/ViViT.py:186-191). As 21 XLA passes over (T, 65, 128) this is
HBM-bandwidth-bound: each of the ~15 ops per transformer block reads and
writes 70-550 MB of activations, ~109 GB total per shot (measured 459 ms,
11% of v5e bf16 peak — see PERFORMANCE.md round 2).

This kernel fuses the ENTIRE depth-2 spatial transformer — LayerNorm, qkv,
per-frame 65-token attention, output projection, feed-forward, residuals,
final LayerNorm — over all ``n_offsets`` offsets for a block of frames, with
every intermediate held in VMEM. HBM traffic drops to one read of the token
table (67 MB) plus one write of the (offsets, T, dim) cls table (21 MB);
the pass becomes MXU-bound.

Numerics match the XLA path: f32 LayerNorm/softmax, bf16 matmul operands
with f32 accumulation, tanh-approximate GELU — verified on-chip against
``spatial_cls`` (tests/test_ops_spatial_table.py runs the interpret-mode
kernel against the flax module).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SpatialWeights(NamedTuple):
    """Flat weight bundle for the fused kernel (all bf16 except noted).

    Per depth d: ln_a scale/bias, w_qkv (D, 3*inner), ln_f scale/bias,
    w_out (inner, D), b_out, w_ff1 (D, M), b_ff1, w_ff2 (M, D), b_ff2.
    Plus final LayerNorm scale/bias and the per-offset additive base:
    base (n_off, N, D) with row 0 = space_token + pos[:, 0] and rows 1..N
    = pos[:, 1:] — added to zero-cls-padded tokens, it reproduces
    concat([cls, tokens]) + pos exactly.
    """
    base: jnp.ndarray
    ln_a_s: tuple
    ln_a_b: tuple
    w_qkv: tuple
    ln_f_s: tuple
    ln_f_b: tuple
    w_out: tuple
    b_out: tuple
    w_ff1: tuple
    b_ff1: tuple
    w_ff2: tuple
    b_ff2: tuple
    ln_fin_s: jnp.ndarray
    ln_fin_b: jnp.ndarray


def find_spatial_params(params):
    """Locate the ViViT-encoder subtree (the dict holding space_transformer +
    pos_embedding) anywhere in a params tree — handles the bare ViViT
    (params['encoder']) and the fusion models (encoder_video / vis_model
    nesting, models/fusion.py)."""
    if isinstance(params, dict):
        if "space_transformer" in params and "pos_embedding" in params:
            return params
        for v in params.values():
            found = find_spatial_params(v)
            if found is not None:
                return found
    return None


def extract_spatial_weights(params, n_offsets: int, depth: int = 2,
                            dtype=jnp.bfloat16, pad_d_head: int = 0,
                            n_heads: int = 4, d_head: int = 64) -> SpatialWeights:
    """Pull the spatial-transformer weights out of a ViViT params tree
    (models/vivit.py layout, located anywhere in the tree) into the kernel's
    flat bundle.

    pad_d_head > 0 re-lays w_qkv/w_out with each head slot zero-padded from
    d_head to pad_d_head lanes, so the kernel's per-head q/k/v slices land
    on 128-lane tile boundaries (pass pad_d_head as ``d_head`` and the true
    ``scale = d_head**-0.5`` to ``spatial_table``)."""
    enc = find_spatial_params(params)
    if enc is None:
        raise KeyError("no ViViT spatial transformer found in params tree")
    st = enc["space_transformer"]
    pos = enc["pos_embedding"][0]                     # (T_win, N, D) f32
    tok = enc["space_token"][0, 0]                    # (D,)

    if pos.shape[0] < n_offsets:
        # a short base would make the kernel's per-offset dynamic slice
        # clamp to the last row — silently wrong table rows, not an error
        raise ValueError(
            f"n_offsets={n_offsets} exceeds the checkpoint's positional-"
            f"embedding rows ({pos.shape[0]}) — sweep seq_len must not "
            f"exceed the model's n_frames")
    base = pos[:n_offsets].at[:, 0, :].add(tok[None, :]).astype(dtype)

    def g(name, sub):
        return st[name][sub]

    c = lambda x: jnp.asarray(x, dtype)
    f = lambda x: jnp.asarray(x, jnp.float32)

    def pad_heads_qkv(w):
        """(D, 3*h*dh) -> (D, 3*h*pad): zero-extend each head's q/k/v slot."""
        D_ = w.shape[0]
        w5 = w.reshape(D_, 3, n_heads, d_head)
        w5 = jnp.pad(w5, ((0, 0), (0, 0), (0, 0), (0, pad_d_head - d_head)))
        return w5.reshape(D_, 3 * n_heads * pad_d_head)

    def pad_heads_out(w):
        """(h*dh, D) -> (h*pad, D): zero rows for the padded v lanes."""
        D_ = w.shape[1]
        w3 = w.reshape(n_heads, d_head, D_)
        w3 = jnp.pad(w3, ((0, 0), (0, pad_d_head - d_head), (0, 0)))
        return w3.reshape(n_heads * pad_d_head, D_)

    pq = pad_heads_qkv if pad_d_head else (lambda w: w)
    po = pad_heads_out if pad_d_head else (lambda w: w)
    return SpatialWeights(
        base=base,
        ln_a_s=tuple(f(g(f"attn_norm_{d}", "scale"))[None] for d in range(depth)),
        ln_a_b=tuple(f(g(f"attn_norm_{d}", "bias"))[None] for d in range(depth)),
        w_qkv=tuple(c(pq(st[f"attn_{d}"]["to_qkv"]["kernel"])) for d in range(depth)),
        ln_f_s=tuple(f(g(f"ff_norm_{d}", "scale"))[None] for d in range(depth)),
        ln_f_b=tuple(f(g(f"ff_norm_{d}", "bias"))[None] for d in range(depth)),
        w_out=tuple(c(po(st[f"attn_{d}"]["to_out"]["kernel"])) for d in range(depth)),
        b_out=tuple(c(st[f"attn_{d}"]["to_out"]["bias"])[None] for d in range(depth)),
        w_ff1=tuple(c(st[f"ff1_{d}"]["kernel"]) for d in range(depth)),
        b_ff1=tuple(c(st[f"ff1_{d}"]["bias"])[None] for d in range(depth)),
        w_ff2=tuple(c(st[f"ff2_{d}"]["kernel"]) for d in range(depth)),
        b_ff2=tuple(c(st[f"ff2_{d}"]["bias"])[None] for d in range(depth)),
        ln_fin_s=f(st["final_norm"]["scale"])[None],
        ln_fin_b=f(st["final_norm"]["bias"])[None],
    )


def _attention(qkv, n_heads: int, d_head: int, scale: float, compute_dtype,
               mode: str):
    """Per-frame 65-token multi-head attention inside the kernel.

    modes:
      batched       — one batched dot per head over the frame dim (default;
                      Mosaic streams batched-dot elements at ~1 row/cycle,
                      ~79 ms of the 183 ms kernel at bench shapes — see
                      PERFORMANCE.md for the variants that lost)
      global-masked — flatten frames into one sequence, 2D dots with a
                      block-diagonal mask (F x more FLOPs; loses to batched
                      once the 16x softmax waste is counted)
      none          — skip attention (profiling ceiling; NOT exact)

    Frame-packing modes ('paired'/'packedN', handled by _attention_packed
    on a flat tile-aligned layout, selected in spatial_table) pack g frames
    per 128-lane tile with a block-diagonal mask; measured on-chip they LOSE
    to batched (192.9/233.4 vs 187.9 ms — see PERFORMANCE.md): the padded
    65-token attention is row-streaming/softmax-bound, not lane-bound.
    'padheads' (extract_spatial_weights pad_d_head=128) confirmed the same.
    (heads-in-batch reshapes crash the Mosaic compiler and were removed.)
    """
    F, N, _ = qkv.shape
    inner = n_heads * d_head

    if mode == "none":
        return qkv[:, :, 2 * inner:3 * inner]

    if mode == "batched":
        outs = []
        for hh in range(n_heads):
            q = qkv[:, :, hh * d_head:(hh + 1) * d_head]
            k = qkv[:, :, inner + hh * d_head:inner + (hh + 1) * d_head]
            v = qkv[:, :, 2 * inner + hh * d_head:2 * inner + (hh + 1) * d_head]
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale        # (F, N, N)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(compute_dtype)
            o = jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)                # (F, N, dh)
            outs.append(o.astype(compute_dtype))
        return jnp.concatenate(outs, axis=-1)

    if mode == "global-masked":
        L = F * N
        frame_q = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0) // N
        frame_k = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1) // N
        mask = frame_q == frame_k
        outs = []
        for hh in range(n_heads):
            q = qkv[:, :, hh * d_head:(hh + 1) * d_head].reshape(L, d_head)
            k = qkv[:, :, inner + hh * d_head:inner + (hh + 1) * d_head].reshape(L, d_head)
            v = qkv[:, :, 2 * inner + hh * d_head:2 * inner + (hh + 1) * d_head].reshape(L, d_head)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale        # (L, L)
            s = jnp.where(mask, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(compute_dtype)
            o = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)                # (L, dh)
            outs.append(o.astype(compute_dtype))
        return jnp.concatenate(outs, axis=-1).reshape(F, N, inner)

    raise ValueError(f"unknown attn_mode {mode!r}")


def _pack_group(mode: str) -> int:
    """Frames packed per attention group: 'paired'/'packedN' modes, else 0."""
    if mode == "paired":
        return 2
    if mode.startswith("packed"):
        return int(mode[len("packed"):])
    return 0


def _attention_packed(qkv_flat, n_groups: int, g: int, n_row: int, n_tok: int,
                      n_heads: int, d_head: int, scale: float, compute_dtype):
    """Packed-frame attention on the flat layout.

    ``qkv_flat`` is (n_groups * g*n_row, 3*inner) where each g*n_row slab
    holds g frames padded from n_tok to n_row rows (n_row % 8 == 0 keeps
    every slice tile-aligned). Per group x head the score matmul is a plain
    2D dot with a block-diagonal mask — g x wasted FLOPs (cross-frame
    blocks + pad keys masked to -inf) traded for fewer, larger matmuls
    that Mosaic streams better than batched dots.
    """
    inner = n_heads * d_head
    Ng = g * n_row
    rq = jax.lax.broadcasted_iota(jnp.int32, (Ng, Ng), 0)
    rk = jax.lax.broadcasted_iota(jnp.int32, (Ng, Ng), 1)
    valid = (rq // n_row == rk // n_row) & (rk % n_row < n_tok)

    outs = []
    for p in range(n_groups):
        sl_lo = p * Ng
        houts = []
        for hh in range(n_heads):
            q = qkv_flat[sl_lo:sl_lo + Ng, hh * d_head:(hh + 1) * d_head]
            k = qkv_flat[sl_lo:sl_lo + Ng,
                         inner + hh * d_head:inner + (hh + 1) * d_head]
            v = qkv_flat[sl_lo:sl_lo + Ng,
                         2 * inner + hh * d_head:2 * inner + (hh + 1) * d_head]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale        # (Ng, Ng)
            s = jnp.where(valid, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            pm = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(compute_dtype)
            o = jax.lax.dot_general(
                pm, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)                # (Ng, dh)
            houts.append(o.astype(compute_dtype))
        outs.append(jnp.concatenate(houts, axis=-1))               # (Ng, inner)
    return jnp.concatenate(outs, axis=0)            # (n_groups*Ng, inner)


def _layer_norm(x32, scale, bias, eps=1e-6):
    """flax.linen.LayerNorm semantics in f32 (mean-of-squares variance)."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    mean2 = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return y * scale + bias


def _kernel(tokens_ref, base_ref, *w_refs,
            out_ref, depth: int, n_offsets: int, n_heads: int, d_head: int,
            compute_dtype, attn_mode: str = "batched", debug_skip: tuple = (),
            n_tok: int = 65, n_row: int = 0, scale: float = None):
    """One grid step: F frames x all offsets, everything in VMEM.

    Packed modes ('paired'/'packedN'): tokens_ref is the packed layout
    (n_groups, g*n_row, D) — g frames per slab, each padded n_tok -> n_row
    rows — and out_ref is (n_offsets, n_groups, g*D) with the g frames' cls
    side by side in the lane dim.
    """
    F = tokens_ref.shape[0]
    D = tokens_ref.shape[2]
    scale = d_head ** -0.5 if scale is None else scale

    # unpack flat refs in SpatialWeights field order (minus the two bases)
    it = iter(w_refs)
    ln_a_s = [next(it) for _ in range(depth)]
    ln_a_b = [next(it) for _ in range(depth)]
    w_qkv = [next(it) for _ in range(depth)]
    ln_f_s = [next(it) for _ in range(depth)]
    ln_f_b = [next(it) for _ in range(depth)]
    w_out = [next(it) for _ in range(depth)]
    b_out = [next(it) for _ in range(depth)]
    w_ff1 = [next(it) for _ in range(depth)]
    b_ff1 = [next(it) for _ in range(depth)]
    w_ff2 = [next(it) for _ in range(depth)]
    b_ff2 = [next(it) for _ in range(depth)]
    ln_fin_s = next(it)
    ln_fin_b = next(it)

    tokens = tokens_ref[:]                                     # (F, N, D), row 0 zero

    N = tokens.shape[1]

    def dot2d(a, w):
        return jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def ln(x32, s, b):
        if "ln" in debug_skip:
            return x32
        return _layer_norm(x32, s, b)

    def gelu(x):
        if "gelu" in debug_skip:
            return x
        return jax.nn.gelu(x, approximate=True)

    def per_offset(off, _):
        base = base_ref[pl_ds(off, 1), :, :][0]                # (N, D)
        # 2D (F*N, D) layout for all Dense matmuls — Mosaic executes rank-3
        # dots one leading-index at a time (65-row matmuls); flat 2D keeps
        # the MXU streaming
        x = (tokens + base[None]).astype(compute_dtype).reshape(F * N, D)

        for d in range(depth):
            h32 = ln(x.astype(jnp.float32), ln_a_s[d][:], ln_a_b[d][:])
            h = h32.astype(compute_dtype)
            qkv = dot2d(h, w_qkv[d][:]).astype(compute_dtype)      # (F*N, 3*inner)
            if _pack_group(attn_mode):
                attn_flat = _attention_packed(
                    qkv, F, _pack_group(attn_mode), n_row, n_tok, n_heads,
                    d_head, scale, compute_dtype)                  # (F*N, inner)
            else:
                attn = _attention(qkv.reshape(F, N, 3 * n_heads * d_head),
                                  n_heads, d_head, scale, compute_dtype,
                                  attn_mode)                       # (F, N, inner)
                attn_flat = attn.reshape(F * N, n_heads * d_head)
            proj = dot2d(attn_flat, w_out[d][:]).astype(compute_dtype)
            x = x + (proj + b_out[d][:])
            f32 = ln(x.astype(jnp.float32), ln_f_s[d][:], ln_f_b[d][:])
            hf = f32.astype(compute_dtype)
            mid = dot2d(hf, w_ff1[d][:]).astype(compute_dtype) + b_ff1[d][:]
            mid = gelu(mid)
            out2 = dot2d(mid, w_ff2[d][:]).astype(compute_dtype)
            x = x + (out2 + b_ff2[d][:])

        fin = ln(x.astype(jnp.float32), ln_fin_s[:], ln_fin_b[:])
        if _pack_group(attn_mode):
            fin3 = fin.reshape(F, N, D)                            # N = g*n_row
            for f in range(_pack_group(attn_mode)):
                out_ref[pl_ds(off, 1), :, f * D:(f + 1) * D] = \
                    fin3[:, f * n_row, :].astype(out_ref.dtype)[None]
        else:
            cls = fin.reshape(F, N, D)[:, 0, :].astype(out_ref.dtype)  # (F, D)
            out_ref[pl_ds(off, 1), :, :] = cls[None]
        return _

    jax.lax.fori_loop(0, n_offsets, per_offset, None)


# pl.ds alias resolved lazily so this module imports without pallas on CPU-only
def pl_ds(start, size):
    from jax.experimental import pallas as pl
    return pl.ds(start, size)


def spatial_table(tokens: jnp.ndarray, weights: SpatialWeights,
                  n_offsets: int, depth: int = 2, n_heads: int = 4,
                  d_head: int = 64, block_f: int = 16,
                  compute_dtype=jnp.bfloat16, attn_mode: str = "batched",
                  debug_skip: tuple = (), scale: float = None,
                  interpret: bool = False) -> jnp.ndarray:
    """(T, N, D) zero-cls-padded patch tokens -> (n_offsets, T, D) cls table.

    ``tokens[:, 0]`` must be zeros (the cls slot — its content comes from
    ``weights.base``); rows 1..N are the patch embeddings. Grid over frame
    blocks; all offsets and the full transformer fused per step. T must be a
    multiple of block_f (the sweep pads shots to power-of-two buckets).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, n_tok, D = tokens.shape
    assert T % block_f == 0, (T, block_f)
    out_dtype = compute_dtype

    # the model adds a PREFIX slice of its positional embedding when the
    # input has fewer patches than image_size allows (models/vivit.py:219,
    # e.g. a sweep crop smaller than the training image size) — mirror that
    # here so the kernel serves any crop the scan path serves
    base = weights.base
    if base.shape[1] != n_tok:
        assert base.shape[1] > n_tok, (base.shape, n_tok)
        base = base[:, :n_tok, :]
    weights = weights._replace(base=base)

    w_list = (list(weights.ln_a_s) + list(weights.ln_a_b) + list(weights.w_qkv)
              + list(weights.ln_f_s) + list(weights.ln_f_b)
              + list(weights.w_out) + list(weights.b_out)
              + list(weights.w_ff1) + list(weights.b_ff1)
              + list(weights.w_ff2) + list(weights.b_ff2)
              + [weights.ln_fin_s, weights.ln_fin_b])
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    g = _pack_group(attn_mode)
    if g:
        # Pack g frames per slab, each padded to n_row rows (multiple of 8
        # sublanes) so every in-kernel slice/reshape stays tile-aligned:
        # frame f < T/g groups with frames f + i*T/g, which makes the unpack
        # a contiguous reshape+transpose. Pad rows are zero; attention masks
        # them out and their garbage cls rows are never read back.
        n_row = -(-n_tok // 8) * 8
        Tg = T // g
        block_p = max(block_f // g, 1)
        if block_p < 8:
            # out blocks need >= 8 sublanes (Mosaic tiling) unless full-dim
            block_p = 8 if Tg % 8 == 0 else Tg
        assert T % g == 0 and Tg % block_p == 0, (T, g, block_p)
        tp = jnp.pad(tokens, ((0, 0), (0, n_row - n_tok), (0, 0)))
        packed = jnp.concatenate([tp[i * Tg:(i + 1) * Tg] for i in range(g)],
                                 axis=1)                    # (T/g, g*n_row, D)
        base_p = jnp.pad(weights.base, ((0, 0), (0, n_row - n_tok), (0, 0)))
        base_packed = jnp.concatenate([base_p] * g, axis=1)

        kern = functools.partial(
            _kernel, depth=depth, n_offsets=n_offsets, n_heads=n_heads,
            d_head=d_head, compute_dtype=compute_dtype, attn_mode=attn_mode,
            debug_skip=debug_skip, n_tok=n_tok, n_row=n_row, scale=scale)

        def wrapped(tokens_ref, base_ref, *rest):
            *w_refs, out_ref = rest
            kern(tokens_ref, base_ref, *w_refs, out_ref=out_ref)

        out = pl.pallas_call(
            wrapped,
            out_shape=jax.ShapeDtypeStruct((n_offsets, Tg, g * D), out_dtype),
            grid=(Tg // block_p,),
            in_specs=[
                pl.BlockSpec((block_p, g * n_row, D), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                full(),
            ] + [full() for _ in w_list],
            out_specs=pl.BlockSpec((n_offsets, block_p, g * D),
                                   lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(packed, base_packed, *w_list)
        # (off, T/g, g, D) -> (off, g, T/g, D) -> (off, T, D): frame
        # f + i*T/g lives in lane-slot i
        return (out.reshape(n_offsets, Tg, g, D)
                .transpose(0, 2, 1, 3).reshape(n_offsets, T, D))

    kern = functools.partial(
        _kernel, depth=depth, n_offsets=n_offsets, n_heads=n_heads,
        d_head=d_head, compute_dtype=compute_dtype, attn_mode=attn_mode,
        debug_skip=debug_skip, scale=scale)

    def wrapped(tokens_ref, base_ref, *rest):
        *w_refs, out_ref = rest
        kern(tokens_ref, base_ref, *w_refs, out_ref=out_ref)

    grid = (T // block_f,)
    return pl.pallas_call(
        wrapped,
        out_shape=jax.ShapeDtypeStruct((n_offsets, T, D), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_f, n_tok, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full(),
        ] + [full() for _ in w_list],
        out_specs=pl.BlockSpec((n_offsets, block_f, D), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tokens, weights.base, *w_list)


def spatial_table_xla(model, variables, tokens: jnp.ndarray,
                      n_offsets: int) -> jnp.ndarray:
    """Reference XLA path (the round-1 scan) for A/B and fallback."""
    def per_offset(_, off):
        cls = model.apply(variables, tokens, off, method="spatial_cls")
        return None, cls

    _, table = jax.lax.scan(per_offset, None, jnp.arange(n_offsets))
    return table
