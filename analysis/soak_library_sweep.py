"""Library-sweep soak + padding A/B (round-3 verdict weak #3 / next #3).

Before this round, VideoSweeper.sweep_shots stacked EVERY shot into HBM in
one device_put: a reference-scale offline evaluation (hundreds of shots x
~4096 frames ~ 0.2 GB cropped per shot) exceeded v5e's 16 GB many times
over by construction, and the pow2 frame bucket made boundary shots pay up
to 2x spatial-table compute. This harness demonstrates the fix on one chip:

  1. a 50-shot x up-to-4096-frame synthetic library (~9 GB cropped host
     side) swept without OOM via HBM-budgeted fixed-size groups;
  2. an A/B of the sub-octave bucket ladder (1.0/1.25/1.5 x 2^k) vs the old
     pow2 ladder: arithmetic padding overhead and measured steady-state
     wall-clock;
  3. per-shot cost vs the per-shot sweep_device path (dispatch
     amortization).

Usage: python analysis/soak_library_sweep.py [n_shots]
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

import kstar_tpu.infer.continuous as C
from kstar_tpu.config import ViViTConfig
from kstar_tpu.models import build_video_model
from kstar_tpu.utils.profiling import device_memory_stats

SEQ_LEN, CROP, BATCH = 21, 128, 128


def main():
    n_shots = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    rng = np.random.default_rng(0)
    # lengths spread across the top octave so both ladders bucket non-trivially
    lens = rng.integers(2300, 4097, size=n_shots)
    total_gb = int(lens.sum()) * CROP * CROP * 3 / 2**30
    print(f"library: {n_shots} shots, {lens.min()}-{lens.max()} frames, "
          f"{total_gb:.1f} GiB cropped total")

    frames_list = [rng.integers(0, 255, (int(n), CROP, CROP, 3), np.uint8)
                   for n in lens]
    starts_list = [np.arange(int(n) - SEQ_LEN - 3, dtype=np.int64)
                   for n in lens]
    n_windows = sum(len(s) for s in starts_list)

    cfg = ViViTConfig()
    model = build_video_model("ViViT", cfg, dtype=jnp.bfloat16)
    k = jax.random.key(0)
    variables = model.init({"params": k, "noise": k, "dropout": k},
                           jnp.zeros((1, SEQ_LEN, CROP, CROP, 3), jnp.bfloat16),
                           train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})
    sw = C.VideoSweeper(model, params, stats, SEQ_LEN, CROP, BATCH,
                        jnp.bfloat16)

    budget = sw._hbm_budget_bytes()
    print(f"HBM budget for the stack: {budget / 2**30:.2f} GiB "
          f"(stats: {({kk: f'{v/2**30:.2f}' for kk, v in (device_memory_stats() or {}).items() if 'bytes' in kk})})")

    ladders = {
        "sub-octave": C.bucket_len,
        "pow2": lambda n: 1 if n <= 1 else 1 << (n - 1).bit_length(),
    }
    orig = C.bucket_len
    results = {}
    try:
        for name, fn in ladders.items():
            C.bucket_len = fn
            pad = sum(fn(int(n)) for n in lens) / float(lens.sum())
            t0 = time.perf_counter()
            probs = sw.sweep_shots(frames_list, starts_list)
            t_cold = time.perf_counter() - t0
            assert all(np.isfinite(p).all() for p in probs)
            tm = {}
            t0 = time.perf_counter()
            probs = sw.sweep_shots(frames_list, starts_list, timings=tm)
            t_warm = time.perf_counter() - t0
            results[name] = (pad, t_warm, tm)
            gbps = tm["h2d_bytes"] / max(tm["h2d_s"], 1e-9) / 2**30
            print(f"  {name:10s}: frame padding x{pad:.3f} | cold "
                  f"{t_cold:.1f} s | steady {t_warm:.1f} s = "
                  f"{n_windows / t_warm:,.0f} clips/s "
                  f"({t_warm / n_shots * 1e3:.0f} ms/shot)\n"
                  f"    breakdown: host prep {tm['host_prep_s']:.1f} s | "
                  f"h2d {tm['h2d_s']:.1f} s "
                  f"({tm['h2d_bytes'] / 2**30:.2f} GiB at {gbps:.3f} GiB/s) | "
                  f"device dispatch {tm['dispatch_s']:.1f} s = "
                  f"{n_windows / tm['dispatch_s']:,.0f} clips/s on-device")
    finally:
        C.bucket_len = orig

    # per-shot path for comparison (subset, steady state). Timed BOTH ways:
    # with upload (the honest end-to-end per-new-shot cost, what the library
    # sweep's h2d phase also pays) and device-resident (pure dispatch).
    sub = list(range(0, n_shots, max(n_shots // 8, 1)))[:8]
    devs = [sw.upload_shot(frames_list[i]) for i in sub]
    for d, i in zip(devs, sub):
        sw.sweep_device(d, starts_list[i])            # compile each bucket
    t0 = time.perf_counter()
    for i in sub:
        d = sw.upload_shot(frames_list[i])
        sw.sweep_device(d, starts_list[i])
    per_shot_e2e = (time.perf_counter() - t0) / len(sub)
    t0 = time.perf_counter()
    for d, i in zip(devs, sub):
        sw.sweep_device(d, starts_list[i])
    per_shot = (time.perf_counter() - t0) / len(sub)
    tm = results["sub-octave"][2]
    print(f"  per-shot path: {per_shot * 1e3:.0f} ms/shot device-resident, "
          f"{per_shot_e2e * 1e3:.0f} ms/shot incl. upload "
          f"(library sweep: {results['sub-octave'][1] / n_shots * 1e3:.0f} "
          f"end-to-end, {tm['dispatch_s'] / n_shots * 1e3:.0f} dispatch-only)")
    print("soak OK")


if __name__ == "__main__":
    main()
