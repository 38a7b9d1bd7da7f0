"""On-chip A/B of the fused spatial-table Pallas kernel vs the XLA scan path.

Checks exactness (vs models/vivit.py spatial_cls) and times both at the
bench shape (T=4096 frames, 21 offsets). Timing uses an in-graph scalar
reduction fetched to host — the axon relay's block_until_ready can return
early, so a host fetch is the only true barrier.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from kstar_tpu.config import ViViTConfig
from kstar_tpu.models import build_video_model
from kstar_tpu.ops.spatial_table import (extract_spatial_weights, spatial_table,
                                         spatial_table_xla)

SEQ_LEN = 21
CROP = 128


def timed(fn, *args, n=5):
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    v = float(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), v


def main():
    block_f = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    cfg = ViViTConfig()
    model = build_video_model("ViViT", cfg, dtype=jnp.bfloat16)
    key = jax.random.key(0)
    x0 = jnp.zeros((1, SEQ_LEN, CROP, CROP, 3), jnp.bfloat16)
    variables = model.init({"params": key, "noise": key, "dropout": key}, x0, train=False)
    params = variables["params"]
    vars_ = {"params": params, "batch_stats": variables.get("batch_stats", {})}

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.standard_normal((T, 64, 128)), jnp.bfloat16)
    tokens65 = jnp.pad(tokens, ((0, 0), (1, 0), (0, 0)))   # zero cls slot
    weights = extract_spatial_weights(params, SEQ_LEN)

    t_xla, v1 = timed(lambda t: spatial_table_xla(model, vars_, t, SEQ_LEN), tokens)
    print(f"XLA scan path   : {t_xla*1e3:8.1f} ms  (sum {v1:.1f})")

    flops = SEQ_LEN * T * 65 * (2 * (128 * 768 + 256 * 128 + 128 * 1024 * 2)
                                + 2 * 2 * 65 * 64 * 4) * 2
    weights_pad = extract_spatial_weights(params, SEQ_LEN, pad_d_head=128,
                                          n_heads=4, d_head=64)
    ref_small = np.asarray(jax.jit(
        lambda t: spatial_table_xla(model, vars_, t, SEQ_LEN))(tokens[:64]),
        np.float32)

    modes = sys.argv[3].split(",") if len(sys.argv) > 3 else ["batched"]
    for mode in modes:
        mode, _, skips = mode.partition("/")
        skip = tuple(skips.split("+")) if skips else ()
        if mode == "padheads":
            run = lambda t, bf: spatial_table(
                t, weights_pad, SEQ_LEN, d_head=128, scale=64 ** -0.5,
                block_f=bf, attn_mode="batched", debug_skip=skip)
        else:
            run = lambda t, bf: spatial_table(
                t, weights, SEQ_LEN, block_f=bf, attn_mode=mode,
                debug_skip=skip)

        # exactness of the EXACT configuration being timed (same mode/
        # weights; block_f capped to the 64-frame slice) — a gate that only
        # checked block_f=16/batched/unpadded would let a mode- or
        # padding-specific kernel bug record a wrong-output speedup
        if not skip:
            got32 = np.asarray(jax.jit(
                lambda t: run(t, min(block_f, 64)))(tokens65[:64]), np.float32)
            err = np.max(np.abs(ref_small - got32))
            rel = err / (np.max(np.abs(ref_small)) + 1e-9)
            print(f"exactness[{mode}] block_f={min(block_f, 64)}: "
                  f"max abs diff {err:.5f}  (rel {rel:.2e})  "
                  f"ref range [{ref_small.min():.3f},{ref_small.max():.3f}]")

        t_pal, v2 = timed(lambda t: run(t, block_f), tokens65)
        print(f"pallas[{mode:13s}{'/'+skips if skips else '':9s}] : {t_pal*1e3:8.1f} ms  (sum {v2:.1f})  "
              f"block_f={block_f}  {t_xla/t_pal:.2f}x  "
              f"{flops/t_pal/1e12:.1f} TF/s ({flops/t_pal/197e12*100:.0f}% peak)")


if __name__ == "__main__":
    main()
