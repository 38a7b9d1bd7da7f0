"""On-chip breakdown of the per-shot continuous-inference cost.

Times, separately: raw dispatch round-trip, frame patch embedding, the
(offset x frame) spatial-cls table, the temporal window sweep, and the full
one-dispatch per-shot program — to locate where the 0.5 s/shot goes before
optimizing (VERDICT round 1 item 1: raise sweep MXU utilization).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from kstar_tpu.config import ViViTConfig
from kstar_tpu.infer.continuous import VideoSweeper
from kstar_tpu.models import build_video_model

N_FRAMES = 4096
SEQ_LEN = 21
CROP = 128
RESIZE = 256
BATCH = 128


def timeit(fn, n=5, warmup=1):
    # barrier = host fetch of one element: through the axon relay,
    # block_until_ready can return early (see ab_spatial_table.py /
    # profile_spatial_ops.py), so fetching device bytes is the only true
    # completion barrier
    def barrier():
        out = fn()
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))

    for _ in range(warmup):
        barrier()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        barrier()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), float(np.min(ts))


def main():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(N_FRAMES, RESIZE, RESIZE, 3), dtype=np.uint8)

    cfg = ViViTConfig()
    model = build_video_model("ViViT", cfg, dtype=jnp.bfloat16)
    key = jax.random.key(0)
    x0 = jnp.zeros((1, SEQ_LEN, CROP, CROP, 3), jnp.bfloat16)
    variables = model.init({"params": key, "noise": key, "dropout": key}, x0, train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    sweeper = VideoSweeper(model, params, batch_stats, SEQ_LEN, CROP, BATCH, jnp.bfloat16)
    frames_dev = sweeper.upload_shot(frames)
    n_windows = N_FRAMES - SEQ_LEN - 1
    starts = np.arange(n_windows, dtype=np.int64)
    chunks = sweeper._chunkify(starts)

    # 1. bare dispatch round trip
    tiny = jax.jit(lambda x: x + 1)
    t_disp, t_disp_min = timeit(lambda: tiny(jnp.zeros((8, 128), jnp.float32)), n=10)
    print(f"dispatch round-trip      : {t_disp*1e3:8.1f} ms (min {t_disp_min*1e3:.1f})")

    # 2. embed frames only (patch embedding, no spatial transformer)
    from kstar_tpu.config import PIXEL_MEAN_BGR
    mean = jnp.asarray(PIXEL_MEAN_BGR, jnp.bfloat16)
    vars_ = {"params": params, "batch_stats": batch_stats}
    embed_only = jax.jit(lambda f: model.apply(
        vars_, f.astype(jnp.bfloat16) - mean, method="embed_frames"))
    t_emb, _ = timeit(lambda: embed_only(frames_dev))
    print(f"patch embedding          : {t_emb*1e3:8.1f} ms")

    # 3. embedding + spatial-cls table (the full per-shot preprocessing)
    embed_all = jax.jit(sweeper._embed_all_fn)
    t_tab, _ = timeit(lambda: embed_all(frames_dev))
    print(f"embed + spatial table    : {t_tab*1e3:8.1f} ms")

    # 4. temporal sweep only (table resident)
    table = jax.block_until_ready(embed_all(frames_dev))
    t_tmp, _ = timeit(lambda: sweeper._sweep_all(table, chunks))
    print(f"temporal window sweep    : {t_tmp*1e3:8.1f} ms")

    # 5. full per-shot program (one dispatch)
    t_full, t_full_min = timeit(lambda: sweeper._sweep_shot(frames_dev, chunks))
    print(f"full one-dispatch sweep  : {t_full*1e3:8.1f} ms (min {t_full_min*1e3:.1f})")
    print(f"  -> clips/s            : {n_windows / t_full:10.0f}")

    # FLOPs accounting for the spatial table
    tok, dim, mlp, inner = 65, 128, 1024, 256
    per_tok = 2 * (dim * 3 * inner + inner * dim + dim * mlp * 2) + 2 * 2 * tok * 64 * 4
    table_flops = SEQ_LEN * N_FRAMES * tok * per_tok * 2  # depth 2
    spatial_t = t_tab - t_emb
    print(f"spatial table FLOPs      : {table_flops/1e12:8.2f} TFLOP")
    print(f"spatial table time       : {spatial_t*1e3:8.1f} ms "
          f"-> {table_flops/spatial_t/1e12:.1f} TFLOP/s "
          f"({table_flops/spatial_t/197e12*100:.0f}% of v5e bf16 peak)")


if __name__ == "__main__":
    main()
