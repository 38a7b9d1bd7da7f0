"""On-chip A/B: Pallas DMA window-gather (ops/preprocess.py) vs XLA's
gather->normalize, inside the raw-pixel sweep (R2Plus1D — the path that,
unlike ViViT's spatial-table fast path, gathers full pixel windows per
chunk). Decides verdict item #8: wire the kernel in behind a flag if it
wins, else record the losing number (PERFORMANCE.md).

Usage: python analysis/ab_window_gather.py [T] [batch]
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

from kstar_tpu.config import PIXEL_MEAN_BGR, R2Plus1DConfig
from kstar_tpu.models import build_video_model
from kstar_tpu.ops.preprocess import gather_normalize_pallas

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
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    cfg = R2Plus1DConfig()
    model = build_video_model("R2Plus1D", cfg, dtype=jnp.bfloat16)
    key = jax.random.key(0)
    x0 = jnp.zeros((1, SEQ_LEN, CROP, CROP, 3), jnp.bfloat16)
    variables = model.init({"params": key, "noise": key, "dropout": key},
                           x0, train=False)
    vars_ = {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})}

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (T, CROP, CROP, 3)), jnp.uint8)
    n_chunks = (T - SEQ_LEN) // B
    starts = jnp.asarray(
        np.arange(n_chunks * B, dtype=np.int32).reshape(n_chunks, B))
    offsets = jnp.arange(1, SEQ_LEN + 1)
    mean_bf16 = jnp.asarray(PIXEL_MEAN_BGR, jnp.bfloat16)

    def forward(x):
        logits = model.apply(vars_, x, train=False)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, 0]

    def chunk_xla(frames_u8, s):
        idx = jnp.clip(s[:, None] + offsets[None, :], 0, frames_u8.shape[0] - 1)
        win = frames_u8[idx]
        return forward(win.astype(jnp.bfloat16) - mean_bf16)

    def chunk_pallas(frames_u8, s):
        x = gather_normalize_pallas(frames_u8, s, SEQ_LEN, jnp.bfloat16)
        return forward(x)

    def sweep(chunk_fn):
        def run(frames_u8, start_chunks):
            def body(_, s):
                return None, chunk_fn(frames_u8, s)
            _, probs = jax.lax.scan(body, None, start_chunks)
            return probs
        return run

    # exactness on one chunk
    p_x = np.asarray(jax.jit(chunk_xla)(frames, starts[0]))
    p_p = np.asarray(jax.jit(chunk_pallas)(frames, starts[0]))
    print(f"exactness: max abs prob diff {np.max(np.abs(p_x - p_p)):.2e}")

    n_win = n_chunks * B
    t_x, v1 = timed(sweep(chunk_xla), frames, starts)
    print(f"XLA gather   : {t_x*1e3:8.1f} ms  ({n_win/t_x:8.0f} clips/s, sum {v1:.2f})")
    t_p, v2 = timed(sweep(chunk_pallas), frames, starts)
    print(f"pallas gather: {t_p*1e3:8.1f} ms  ({n_win/t_p:8.0f} clips/s, sum {v2:.2f})  {t_x/t_p:.2f}x")

    # gather-only (no model) to isolate the preprocess cost
    t_gx, _ = timed(lambda f, s: jax.lax.scan(
        lambda _, ss: (None, f[jnp.clip(ss[:, None] + offsets[None, :], 0, f.shape[0]-1)].astype(jnp.bfloat16) - mean_bf16),
        None, s)[1], frames, starts)
    t_gp, _ = timed(lambda f, s: jax.lax.scan(
        lambda _, ss: (None, gather_normalize_pallas(f, ss, SEQ_LEN, jnp.bfloat16)),
        None, s)[1], frames, starts)
    print(f"gather-only  : XLA {t_gx*1e3:.1f} ms vs pallas {t_gp*1e3:.1f} ms ({t_gx/t_gp:.2f}x)")


if __name__ == "__main__":
    main()
