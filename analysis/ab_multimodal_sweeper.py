"""A/B: shared MultiModalSweeper vs per-shot retrace for library sweeps.

Before the refactor, predict_multimodal_shot wrapped its closures in a fresh
jax.jit per call, so sweeping a shot library recompiled the fused program
for every shot (reference runs one forward per window instead,
generate_prob_curve_from_multi, utility.py:1068-1178). The refactor traces
once per sweeper and buckets frame/row/chunk counts to powers of two.

This harness times a library sweep both ways on-chip:
  A (old behavior) — a FRESH MultiModalSweeper per shot (equivalent to the
      per-call jit: every shot pays trace + compile)
  B (shipping)     — ONE sweeper shared across the library

Run on the real chip:  python analysis/ab_multimodal_sweeper.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SHOTS = 6
SEQ_LEN = 21
TAU = 1
CROP = 128
DT = 1.0 / 210.0


def main():
    import jax
    import jax.numpy as jnp

    from kstar_tpu.infer.continuous import (MultiModalSweeper,
                                            multimodal_ladders)
    from kstar_tpu.models import MultiModalConcat

    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)

    # flagship fusion dims (cli/train_multimodal defaults)
    vivit_kw = dict(image_size=CROP, patch_size=16, n_frames=SEQ_LEN,
                    dim=128, depth=2, n_heads=4, d_head=64, scale_dim=8,
                    dropout=0.0, embedd_dropout=0.0)
    ts_kw = dict(n_features=18, feature_dims=128, max_len=SEQ_LEN,
                 n_layers=4, n_heads=8, dim_feedforward=1024,
                 dropout=0.0, cls_dims=128)
    model = MultiModalConcat(vivit_kwargs=vivit_kw, ts_kwargs=ts_kw,
                             dtype=jnp.bfloat16)
    v = model.init({"params": jax.random.key(0), "noise": jax.random.key(1),
                    "dropout": jax.random.key(2)},
                   jnp.zeros((1, SEQ_LEN, CROP, CROP, 3), jnp.bfloat16),
                   jnp.zeros((1, SEQ_LEN, 18), jnp.bfloat16), train=False)
    params, stats = v["params"], v.get("batch_stats", {})

    # ragged shot library (different buckets exercise the bucketing)
    lengths = [1260, 1500, 1260, 1800, 1400, 1260][:N_SHOTS]
    shots = []
    for n in lengths:
        frames = rng.integers(0, 255, size=(n, 256, 256, 3), dtype=np.uint8)
        data = rng.standard_normal((n, 18)).astype(np.float32)
        times = np.arange(n) * DT
        vk, tk = multimodal_ladders(times, 4, n - 4, float(times[4]),
                                    float(times[-8]), SEQ_LEN, DT, TAU)
        shots.append((frames, data, vk, tk))

    def run_shared():
        sw = MultiModalSweeper(model, params, stats, SEQ_LEN, TAU, CROP,
                               batch_size=32, compute_dtype=jnp.bfloat16)
        for frames, data, vk, tk in shots:
            p = sw.sweep(frames, data, vk, tk)
            assert np.isfinite(p).all()

    def run_fresh():
        for frames, data, vk, tk in shots:
            sw = MultiModalSweeper(model, params, stats, SEQ_LEN, TAU, CROP,
                                   batch_size=32, compute_dtype=jnp.bfloat16)
            p = sw.sweep(frames, data, vk, tk)
            assert np.isfinite(p).all()

    for name, fn in [("B shared sweeper", run_shared),
                     ("A fresh sweeper/shot (old)", run_fresh)]:
        t0 = time.perf_counter()
        fn()
        print(f"{name}: {time.perf_counter() - t0:.1f} s "
              f"for {N_SHOTS} shots (incl. compiles)")


if __name__ == "__main__":
    main()
