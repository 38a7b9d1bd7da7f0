"""A/B: does f32 LN/softmax cause the ViViT train step's roofline gap?

PERFORMANCE.md's roofline table has the ViViT train step at 40.9 ms vs a
21.2 ms HBM floor (52% of roofline) and attributes the residual to VPU
serialization of the f32 LayerNorm/softmax chain interleaved with bf16
matmuls. That was analysis, not measurement (VERDICT r2 item 9). This
script measures it: the same jitted train step (fwd + bwd + AdamW, Focal
loss, B=64) with

  * norm_dtype=f32  — the parity default (LN + attention softmax in f32);
  * norm_dtype=bf16 — the whole transformer in bf16.

Timing is scan-timed (K steps per dispatch / K) like analysis/train_mfu.py,
so the relay's per-dispatch latency cancels. A large gap confirms the
VPU-serialization diagnosis and quantifies the opt-in win
(`ViViTConfig(norm_dtype="bfloat16")` / `train_vision --norm_dtype
bfloat16`); a null result refutes it and the roofline
gap needs another explanation. Record the outcome in PERFORMANCE.md either
way.

Usage: python analysis/ab_vivit_norm_dtype.py
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

from kstar_tpu.config import LossConfig, OptimConfig
from kstar_tpu.models.vivit import ViViT
from kstar_tpu.train.loop import make_scan_steps
from kstar_tpu.train.state import create_train_state

B, T, H = 64, 21, 128
K = 8
N_DISPATCH = 6


def measure(norm_dtype) -> float:
    model = ViViT(image_size=H, n_frames=T, dtype=jnp.bfloat16,
                  norm_dtype=norm_dtype)
    x = jnp.zeros((B, T, H, H, 3), jnp.bfloat16)
    state = create_train_state(model, x[:1], jax.random.key(0), OptimConfig())
    step = make_scan_steps(model, LossConfig(loss_type="Focal"))

    xs = jnp.zeros((K, B, T, H, H, 3), jnp.bfloat16)
    ys = jnp.zeros((K, B), jnp.int32)
    w = jnp.ones(2)
    m = jnp.ones(2)
    gb = jnp.zeros(3)

    state, _, _ = step(state, xs, ys, w, m, gb)        # compile
    jax.block_until_ready(state.params)
    times = []
    for _ in range(N_DISPATCH):
        t0 = time.perf_counter()
        state, losses, _ = step(state, xs, ys, w, m, gb)
        jax.block_until_ready(losses)
        times.append((time.perf_counter() - t0) / K)
    return float(np.median(times)) * 1e3


def main():
    for name, dt in [("f32 norms (baseline)", jnp.float32),
                     ("bf16 norms", jnp.bfloat16)]:
        ms = measure(dt)
        print(f"ViViT train step, {name:22s}: {ms:6.2f} ms/step "
              f"({B / ms * 1e3:7.0f} clips/s)")


if __name__ == "__main__":
    main()
