"""A/B: is Transformer0D's roofline gap per-op overhead (fix = batch)?

Roofline (analysis/roofline.py): the Transformer0D train step moves 0.6 GB
(HBM floor 0.8 ms) but measures 5.8 ms — 14% of roofline. The tensors are
tiny (B=64, T=21, 18 features), so the hypothesis is per-kernel overhead,
not bandwidth: dozens of microscopic ops whose fixed costs dwarf their
memory traffic. If that's right, the step time should grow far slower than
batch size — and the fix is GRANULARITY (bigger B, vmapped ensembles/rungs,
scan dispatch), all of which this framework already ships, not a kernel.

This measures scan-timed ms/step and clips/s at B in {64, 256, 1024}.
Usage: python analysis/ab_0d_batch_scaling.py
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

from kstar_tpu.config import LossConfig, OptimConfig, Schema, TransformerConfig
from kstar_tpu.models import build_0d_model
from kstar_tpu.train.loop import make_scan_steps
from kstar_tpu.train.state import create_train_state

T = 21
K = 8
N_DISPATCH = 6


def measure(B: int) -> float:
    model = build_0d_model("Transformer", TransformerConfig(), dtype=jnp.bfloat16)
    x = jnp.zeros((B, T, len(Schema.INPUT_FEATURES)), jnp.bfloat16)
    state = create_train_state(model, x[:1], jax.random.key(0), OptimConfig())
    step = make_scan_steps(model, LossConfig(loss_type="Focal"))
    xs = jnp.zeros((K,) + x.shape, jnp.bfloat16)
    ys = jnp.zeros((K, B), jnp.int32)
    w, m, gb = jnp.ones(2), jnp.ones(2), jnp.zeros(3)
    state, _, _ = step(state, xs, ys, w, m, gb)
    jax.block_until_ready(state.params)
    times = []
    for _ in range(N_DISPATCH):
        t0 = time.perf_counter()
        state, losses, _ = step(state, xs, ys, w, m, gb)
        jax.block_until_ready(losses)
        times.append((time.perf_counter() - t0) / K)
    return float(np.median(times)) * 1e3


def main():
    base = None
    for B in (64, 256, 1024):
        ms = measure(B)
        base = base or ms
        print(f"Transformer0D train step B={B:5d}: {ms:6.2f} ms/step  "
              f"{B / ms * 1e3:9.0f} clips/s  "
              f"(time x{ms / base:4.2f} for batch x{B // 64})")


if __name__ == "__main__":
    main()
