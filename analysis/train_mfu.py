"""On-chip training-step MFU: step time vs XLA's own FLOP count.

For each flagship model, builds the real jitted train step (fwd + bwd +
AdamW update, Focal loss) at the bench batch shape, reads the compiled
program's FLOP count from XLA cost analysis, times the step steady-state,
and reports model FLOP utilization against the v5e bf16 peak (197 TF/s).
Records WHERE the training path sits relative to speed-of-light, so the
next optimization target is chosen by data (PERFORMANCE.md).

Usage: python analysis/train_mfu.py [model ...]   (default: all)
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

from kstar_tpu.config import (LossConfig, OptimConfig, R2Plus1DConfig,
                              Schema, SlowFastConfig, TransformerConfig,
                              ViViTConfig)
from kstar_tpu.train.loop import make_scan_steps, make_train_step
from kstar_tpu.train.state import create_train_state

B, T, H = 64, 21, 128
K = 8           # steps per dispatch: timing one scan dispatch and dividing
                # by K removes the relay's large, variable per-dispatch
                # latency from the measurement (pure on-chip step time)
N_DISPATCH = 4
PEAK_TF = 197e12  # v5e bf16


def build(name):
    if name == "Transformer0D":
        from kstar_tpu.models import build_0d_model
        model = build_0d_model("Transformer", TransformerConfig(), dtype=jnp.bfloat16)
        x = jnp.zeros((B, T, len(Schema.INPUT_FEATURES)), jnp.bfloat16)
    else:
        from kstar_tpu.models import build_video_model
        cfg = {"ViViT": ViViTConfig, "R2Plus1D": R2Plus1DConfig,
               "SlowFast": SlowFastConfig}[name]()
        model = build_video_model(name, cfg, dtype=jnp.bfloat16)
        t = getattr(cfg, "n_frames", T)   # SlowFast: 20 (alpha-divisible)
        x = jnp.zeros((B, t, H, H, 3), jnp.bfloat16)
    return model, x


def main():
    names = sys.argv[1:] or ["ViViT", "R2Plus1D", "SlowFast", "Transformer0D"]
    rng = np.random.default_rng(0)
    labels = jnp.asarray(rng.integers(0, 2, B))
    w = jnp.ones(2); m = jnp.ones(2); gb = jnp.zeros(3)

    for name in names:
        model, x0 = build(name)
        batch = jnp.asarray(rng.normal(0, 1, x0.shape), jnp.bfloat16)
        state = create_train_state(model, x0[:1], jax.random.key(0), OptimConfig())
        step = make_train_step(model, LossConfig(loss_type="Focal"))

        try:
            flops = float(step.lower(state, batch, labels, w, m, gb)
                          .compile().cost_analysis()["flops"])
        except Exception:
            flops = float("nan")

        scan = make_scan_steps(model, LossConfig(loss_type="Focal"))
        bs = jnp.broadcast_to(batch, (K,) + batch.shape)
        ys = jnp.broadcast_to(labels, (K,) + labels.shape)
        state, losses, _ = scan(state, bs, ys, w, m, gb)
        float(losses[0])  # warm/compile
        times = []
        for _ in range(N_DISPATCH):
            t0 = time.perf_counter()
            state, losses, _ = scan(state, bs, ys, w, m, gb)
            float(jnp.sum(losses))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times)) / K
        mfu = flops / dt / PEAK_TF * 100
        print(f"{name:14s}: {dt*1e3:7.1f} ms/step  {B/dt:7.0f} clips/s  "
              f"{flops/1e12:6.2f} TFLOP/step  {flops/dt/1e12:6.1f} TF/s  "
              f"MFU {mfu:4.1f}%")


if __name__ == "__main__":
    main()
