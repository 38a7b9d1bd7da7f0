"""On-chip A/B: per-step host sync (round-1 run_train_epoch) vs the
pipelined epoch driver (device-side loss/pred accumulation, single fetch).

Through the axon relay a host round-trip costs ~25 ms; with a ~44 ms fused
ViViT step the per-step float(loss) serialization is a ~1.5x tax.
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

B, T, H = 64, 21, 128
N_STEPS = 30


def main():
    cfg = ViViTConfig()
    model = build_video_model("ViViT", cfg, dtype=jnp.bfloat16)
    state = create_train_state(model, jnp.zeros((1, T, H, H, 3), jnp.bfloat16),
                               jax.random.key(0), OptimConfig())
    step = make_train_step(model, LossConfig(loss_type="Focal"))

    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.normal(0, 1, (B, T, H, H, 3)), jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, 2, B))
    w = jnp.ones(2); m = jnp.ones(2); gb = jnp.zeros(3)

    # warmup/compile
    state, loss, preds = step(state, batch, labels, w, m, gb)
    float(loss)

    # A: per-step host sync (the round-1 behavior)
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        state, loss, preds = step(state, batch, labels, w, m, gb)
        _ = float(loss)
        _ = np.asarray(preds)
    t_sync = (time.perf_counter() - t0) / N_STEPS

    # B: pipelined — keep loss/preds on device, one fetch at the end
    t0 = time.perf_counter()
    dev_losses, dev_preds = [], []
    for _ in range(N_STEPS):
        state, loss, preds = step(state, batch, labels, w, m, gb)
        dev_losses.append(loss)
        dev_preds.append(preds)
    total = float(jnp.sum(jnp.stack(dev_losses)))
    _ = np.concatenate([np.asarray(p) for p in dev_preds])
    t_pipe = (time.perf_counter() - t0) / N_STEPS

    # C: K steps per dispatch (lax.scan over the same step) — immune to the
    # relay's per-dispatch latency; scan_time/K is also the honest on-chip
    # step time (host-side timing of one dispatch has no per-step overhead)
    K = 8
    scan = make_scan_steps(model, LossConfig(loss_type="Focal"))
    bs = jnp.broadcast_to(batch, (K,) + batch.shape)
    ys = jnp.broadcast_to(labels, (K,) + labels.shape)
    state, losses_k, _ = scan(state, bs, ys, w, m, gb)   # compile
    float(losses_k[0])
    n_disp = max(N_STEPS // K, 3)
    t0 = time.perf_counter()
    dev = []
    for _ in range(n_disp):
        state, losses_k, _ = scan(state, bs, ys, w, m, gb)
        dev.append(losses_k)
    _ = float(jnp.sum(jnp.stack(dev)))
    t_scan = (time.perf_counter() - t0) / (n_disp * K)

    print(f"per-step host sync : {t_sync*1e3:7.1f} ms/step  ({B/t_sync:6.0f} clips/s)")
    print(f"pipelined          : {t_pipe*1e3:7.1f} ms/step  ({B/t_pipe:6.0f} clips/s)")
    print(f"scan K={K} per disp : {t_scan*1e3:7.1f} ms/step  ({B/t_scan:6.0f} clips/s)")
    print(f"speedup (pipe/sync): {t_sync/t_pipe:.2f}x   (scan/pipe): {t_pipe/t_scan:.2f}x")


if __name__ == "__main__":
    main()
