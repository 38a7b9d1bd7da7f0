"""Roofline position of the jitted train steps (reproduces PERFORMANCE.md).

For each model: FLOPs and bytes-accessed from XLA cost analysis of the
REAL train step (fwd + bwd + AdamW), arithmetic intensity, the HBM-bound
time floor at v5e bandwidth, and — when run on hardware — the measured
scan-timed step for the %-of-roofline figure. Establishes whether a step
is memory- or compute-bound before any kernel work is considered
(TODO.md records the resulting decision for ViViT).

Usage: python analysis/roofline.py [model ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from kstar_tpu.config import (LossConfig, OptimConfig, R2Plus1DConfig,
                              Schema, SlowFastConfig, TransformerConfig,
                              ViViTConfig)
from kstar_tpu.train.loop import make_train_step
from kstar_tpu.train.state import create_train_state

B, T, H = 64, 21, 128
HBM_GBPS = 819e9   # v5e
PEAK_TF = 197e12   # v5e bf16
RIDGE = PEAK_TF / HBM_GBPS


def build(name):
    if name == "Transformer0D":
        from kstar_tpu.models import build_0d_model
        model = build_0d_model("Transformer", TransformerConfig(), dtype=jnp.bfloat16)
        return model, jnp.zeros((B, T, len(Schema.INPUT_FEATURES)), jnp.bfloat16)
    from kstar_tpu.models import build_video_model
    cfg = {"ViViT": ViViTConfig, "R2Plus1D": R2Plus1DConfig,
           "SlowFast": SlowFastConfig}[name]()
    model = build_video_model(name, cfg, dtype=jnp.bfloat16)
    t = getattr(cfg, "n_frames", T)
    return model, jnp.zeros((B, t, H, H, 3), jnp.bfloat16)


def main():
    names = sys.argv[1:] or ["ViViT", "R2Plus1D", "SlowFast", "Transformer0D"]
    for name in names:
        model, x = build(name)
        state = create_train_state(model, x[:1], jax.random.key(0), OptimConfig())
        step = make_train_step(model, LossConfig(loss_type="Focal"))
        ca = step.lower(state, x, jnp.zeros(B, jnp.int32), jnp.ones(2),
                        jnp.ones(2), jnp.zeros(3)).compile().cost_analysis()
        flops = float(ca.get("flops", float("nan")))
        byt = float(ca.get("bytes accessed", float("nan")))
        floor_ms = byt / HBM_GBPS * 1e3
        intensity = flops / byt
        print(f"{name:14s}: {flops/1e12:5.2f} TFLOP  {byt/1e9:6.1f} GB  "
              f"intensity {intensity:5.0f} FLOP/B (ridge {RIDGE:.0f})  "
              f"HBM floor {floor_ms:6.1f} ms  "
              f"{'MEMORY' if intensity < RIDGE else 'COMPUTE'}-bound  "
              f"intensity-capped MFU {min(intensity / RIDGE, 1.0) * 100:4.1f}%")


if __name__ == "__main__":
    main()
