"""Long-shot soak: one realistic-length shot through the whole stack.

Every prior perf number came from <=4096-frame shots; the bucket ladder and
ViViT token tables grow with T and had never been exercised near HBM limits
(round-3 verdict #7). This harness pushes a ~60 s / 12,600-frame shot
(256x256 uint8, ~2.4 GB raw / ~0.6 GB cropped) through:

  1. predict_video_shot — the one-dispatch whole-shot sweep (reference
     generate_prob_curve, utility.py:896-977), recording clips/s and HBM
     headroom around the sweep;
  2. the StreamingPredictor k=16 micro-batched path (steady-state ms/frame
     over the first ~1600 frames);
  3. render_realtime_gif — the reference's FuncAnimation app
     (visualize_application.py:310-351) with its shot-length-adaptive
     subsample rules.

Usage: python analysis/soak_long_shot.py [n_frames]
Writes one human-readable block; paste the row into PERFORMANCE.md.
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

from kstar_tpu.config import FPS, ViViTConfig
from kstar_tpu.models import build_video_model
from kstar_tpu.utils.profiling import device_memory_stats

SEQ_LEN, CROP, RESIZE, BATCH = 21, 128, 256, 128


def hbm(label):
    s = device_memory_stats() or {}
    if "bytes_in_use" in s:
        print(f"  HBM {label}: {s['bytes_in_use'] / 2**30:.2f} GiB in use"
              + (f" / {s['bytes_limit'] / 2**30:.2f} GiB limit"
                 if s.get("bytes_limit") else ""))
    return s.get("bytes_in_use", 0)


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 12600
    print(f"soak: {n_frames} frames (~{n_frames / FPS:.1f} s shot), "
          f"{RESIZE}x{RESIZE} uint8 = {n_frames * RESIZE * RESIZE * 3 / 2**30:.2f} GiB raw")

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (n_frames, RESIZE, RESIZE, 3), dtype=np.uint8)
    # paste a brightening blob into the tail so the prob curve is not flat
    frames[-int(2 * FPS):, 96:160, 96:160, :] |= 200

    cfg = ViViTConfig()
    model = build_video_model("ViViT", cfg, dtype=jnp.bfloat16)
    k = jax.random.key(0)
    variables = model.init({"params": k, "noise": k, "dropout": k},
                           jnp.zeros((1, SEQ_LEN, CROP, CROP, 3), jnp.bfloat16),
                           train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})

    # 1. whole-shot sweep ---------------------------------------------------
    from kstar_tpu.infer.continuous import predict_video_shot

    hbm("before sweep")
    t0 = time.perf_counter()
    time_x, probs = predict_video_shot(
        model, params, stats, frames, frame_srt=0, frame_end=n_frames - int(FPS),
        seq_len=SEQ_LEN, dist=3, crop_size=CROP, batch_size=BATCH,
        compute_dtype=jnp.bfloat16)
    t_cold = time.perf_counter() - t0
    n_windows = n_frames - SEQ_LEN - 3
    assert np.isfinite(probs).all()
    print(f"  sweep cold (compile+run): {t_cold:.1f} s")
    hbm("after sweep")

    # steady state: reuse the compiled program via a sweeper
    from kstar_tpu.infer.continuous import VideoSweeper

    sweeper = VideoSweeper(model, params, stats, SEQ_LEN, CROP, BATCH,
                           jnp.bfloat16)
    dev = sweeper.upload_shot(frames)
    starts = np.arange(n_windows, dtype=np.int64)
    sweeper.sweep_device(dev, starts)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        sweeper.sweep_device(dev, starts)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    print(f"  sweep steady: {dt:.3f} s = {n_windows / dt:,.0f} clips/s "
          f"({n_windows} windows)")
    hbm("frames resident")
    del dev

    # 2. streaming ----------------------------------------------------------
    from kstar_tpu.infer import StreamingPredictor

    K = 16
    sp = StreamingPredictor(model, params, stats, seq_len=SEQ_LEN,
                            crop_size=CROP, block_size=K,
                            compute_dtype=jnp.bfloat16)
    y0 = RESIZE // 2 - CROP // 2
    cropped = frames[:, y0:y0 + CROP, y0:y0 + CROP, :]
    sp.push_block(np.ascontiguousarray(cropped[:K]))       # compile
    n_blocks = min(100, n_frames // K - 1)
    t0 = time.perf_counter()
    for b in range(1, 1 + n_blocks):
        sp.push_block(np.ascontiguousarray(cropped[b * K:(b + 1) * K]))
    stream_dt = (time.perf_counter() - t0) / (n_blocks * K) * 1e3
    ok = "holds" if stream_dt < 1e3 / FPS else "misses"
    print(f"  streaming k={K}: {stream_dt:.2f} ms/frame over {n_blocks * K} "
          f"frames ({ok} the {1e3 / FPS:.2f} ms budget)")

    # 3. GIF app ------------------------------------------------------------
    from kstar_tpu.viz.prob_curve import render_realtime_gif

    out = "/tmp/soak_long_shot.gif"
    t0 = time.perf_counter()
    render_realtime_gif(frames, time_x, probs, shot=99999,
                        t_cq=(n_frames - 1) / FPS, save_path=out)
    print(f"  gif: {time.perf_counter() - t0:.1f} s -> {out} "
          f"({os.path.getsize(out) / 2**20:.1f} MiB)")
    print("soak OK")


if __name__ == "__main__":
    main()
