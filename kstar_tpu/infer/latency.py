"""Latency / throughput harness (reference measure_computation_time,
src/utils/utility.py:1201-1265 and compute_time.py:263-268).

Measures (a) reference-style single-sample latency mean/std over n timed
forwards and (b) the TPU-relevant number: batched clips/sec at a given batch
size, with a compile warmup excluded and device sync via block_until_ready.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def measure_forward(apply_fn, args: tuple, n_samples: int = 16,
                    warmup: int = 2) -> Dict[str, float]:
    """Timed jitted forwards. Returns {mean_s, std_s, p50_s, p99_s}
    latencies; measure_model adds clips_per_s. ``apply_fn`` must be
    jit-compiled; args are device arrays."""
    fn = apply_fn
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)

    times = []
    for _ in range(n_samples):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    t = np.asarray(times)
    return {
        "mean_s": float(t.mean()),
        "std_s": float(t.std()),
        "p50_s": float(np.percentile(t, 50)),
        "p99_s": float(np.percentile(t, 99)),
    }


def measure_model(model, params, batch_stats, sample_args: tuple,
                  n_samples: int = 16, warmup: int = 2) -> Dict[str, float]:
    """Reference-style harness over a flax model."""
    variables = {"params": params, "batch_stats": batch_stats}

    @jax.jit
    def fwd(*args):
        return model.apply(variables, *args, train=False)

    stats = measure_forward(fwd, sample_args, n_samples, warmup)
    batch = sample_args[0].shape[0]
    stats["clips_per_s"] = batch / stats["mean_s"]
    return stats
