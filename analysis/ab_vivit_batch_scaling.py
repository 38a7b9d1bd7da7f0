"""A/B: is ViViT's remaining train-step roofline gap granularity (fix = batch)?

Roofline (analysis/roofline.py, PERFORMANCE.md): the ViViT train step at
B=64 moves 33.5 GB logical traffic (HBM floor 21.2 ms) but measures
40.9 ms — 52% of roofline. The dtype hypothesis was measured null
(ab_vivit_norm_dtype.py, +4.6%) and remat LOSES (51.4 vs 40.5 ms), so the
standing diagnosis is op-count/granularity: many small VPU ops (LN, gelu,
softmax over 65/21-token sequences) whose fixed costs don't amortize at
B=64. If that's right, step time grows sublinearly in B — the same
signature the Transformer0D A/B showed (16x batch = 3.9x time) — and the
fix the framework already ships (bigger B, vmapped ensembles/rungs, scan
dispatch) closes the gap without a hand-written fused backward.

Measures scan-timed ms/step, clips/s, and % of the per-B HBM floor (from
XLA bytes-accessed of the SAME compiled step) at B in {32, 64, 128, 256}.
Usage: python analysis/ab_vivit_batch_scaling.py
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

from kstar_tpu.config import LossConfig, OptimConfig, ViViTConfig
from kstar_tpu.models import build_video_model
from kstar_tpu.train.loop import make_scan_steps, make_train_step
from kstar_tpu.train.state import create_train_state

T, H = 21, 128
K = 4            # steps/dispatch; bounded so the K-stack of B=256 video
                 # batches (K*B*T*H*H*3 bf16 = 2.1 GB) leaves HBM headroom
N_DISPATCH = 4
HBM_GBPS = 819e9  # v5e


def measure(B: int, rng: np.random.Generator):
    model = build_video_model("ViViT", ViViTConfig(), dtype=jnp.bfloat16)
    x0 = jnp.zeros((B, T, H, H, 3), jnp.bfloat16)
    state = create_train_state(model, x0[:1], jax.random.key(0), OptimConfig())
    labels = jnp.asarray(rng.integers(0, 2, B))
    w, m, gb = jnp.ones(2), jnp.ones(2), jnp.zeros(3)

    step = make_train_step(model, LossConfig(loss_type="Focal"))
    ca = step.lower(state, x0, labels, w, m, gb).compile().cost_analysis()
    byt = float(ca.get("bytes accessed", float("nan")))
    floor_ms = byt / HBM_GBPS * 1e3

    scan = make_scan_steps(model, LossConfig(loss_type="Focal"))
    batch = jnp.asarray(rng.normal(0, 1, x0.shape), jnp.bfloat16)
    bs = jnp.broadcast_to(batch, (K,) + batch.shape)
    ys = jnp.broadcast_to(labels, (K,) + labels.shape)
    state, losses, _ = scan(state, bs, ys, w, m, gb)
    float(losses[0])  # warm/compile
    times = []
    for _ in range(N_DISPATCH):
        t0 = time.perf_counter()
        state, losses, _ = scan(state, bs, ys, w, m, gb)
        float(jnp.sum(losses))
        times.append((time.perf_counter() - t0) / K)
    return float(np.median(times)) * 1e3, floor_ms


def main():
    rng = np.random.default_rng(0)
    rows = [(B,) + measure(B, rng) for B in (32, 64, 128, 256)]
    base = next(ms for B, ms, _ in rows if B == 64)
    for B, ms, floor in rows:
        print(f"ViViT train step B={B:4d}: {ms:7.2f} ms/step  "
              f"{B / ms * 1e3:7.0f} clips/s  "
              f"HBM floor {floor:6.2f} ms ({floor / ms * 100:4.1f}% attained)  "
              f"(time x{ms / base:4.2f} vs B=64)")


if __name__ == "__main__":
    main()
