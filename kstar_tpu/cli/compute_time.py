"""Latency/throughput CLI (rebuild of reference compute_time.py +
analysis/compute_time_multimodal.py): reference-style mean/std of n timed
forwards at the reference shapes — 0D models (1,21,18), ViViT
(1,21,128,128,3), multimodal both — plus the TPU-relevant batched
clips/sec numbers.

Usage:
    python -m kstar_tpu.cli.compute_time --models ViViT Transformer --n_samples 16
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description="model latency harness")
    p.add_argument("--models", nargs="+",
                   default=["ViViT", "R2Plus1D", "SlowFast", "Transformer",
                            "CnnLSTM", "MLSTM_FCN", "multimodal"])
    p.add_argument("--n_samples", type=int, default=16)
    p.add_argument("--batch_sizes", type=int, nargs="+", default=[1, 64])
    p.add_argument("--seq_len", type=int, default=21)
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--n_features", type=int, default=18)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config import (CnnLSTMConfig, MLSTMFCNConfig, R2Plus1DConfig,
                          SlowFastConfig, TransformerConfig, ViViTConfig)
    from ..infer.latency import measure_model
    from ..models import (MultiModalConcat, build_0d_model, build_video_model)

    L, H, F = args.seq_len, args.image_size, args.n_features
    rngs = {"params": jax.random.key(0), "noise": jax.random.key(1),
            "dropout": jax.random.key(2)}
    results = {}

    def bench_one(name, model, make_args):
        for B in args.batch_sizes:
            sample = make_args(B)
            variables = model.init(rngs, *sample, train=False)
            stats = measure_model(model, variables["params"],
                                  variables.get("batch_stats", {}),
                                  sample, n_samples=args.n_samples)
            results[f"{name}_b{B}"] = stats
            print(f"{name:12s} B={B:<4d} mean {stats['mean_s']*1e3:8.2f} ms  "
                  f"p50 {stats['p50_s']*1e3:8.2f} ms  {stats['clips_per_s']:10.1f} clips/s")

    video_shape = lambda B: (jnp.zeros((B, L, H, H, 3), jnp.bfloat16),)
    ts_shape = lambda B: (jnp.zeros((B, L, F), jnp.float32),)

    for name in args.models:
        if name == "ViViT":
            bench_one(name, build_video_model(name, ViViTConfig(image_size=H, n_frames=L),
                                              dtype=jnp.bfloat16), video_shape)
        elif name == "R2Plus1D":
            bench_one(name, build_video_model(name, R2Plus1DConfig(image_size=H, n_frames=L),
                                              dtype=jnp.bfloat16), video_shape)
        elif name == "SlowFast":
            Ls = L - L % 4
            bench_one(name, build_video_model(name, SlowFastConfig(image_size=H, n_frames=Ls),
                                              dtype=jnp.bfloat16),
                      lambda B: (jnp.zeros((B, Ls, H, H, 3), jnp.bfloat16),))
        elif name == "Transformer":
            bench_one(name, build_0d_model(name, TransformerConfig(n_features=F, max_len=L),
                                           dtype=jnp.bfloat16), ts_shape)
        elif name == "CnnLSTM":
            bench_one(name, build_0d_model(name, CnnLSTMConfig(seq_len=L, n_features=F),
                                           dtype=jnp.bfloat16), ts_shape)
        elif name == "MLSTM_FCN":
            bench_one(name, build_0d_model(name, MLSTMFCNConfig(seq_len=L, n_features=F),
                                           dtype=jnp.bfloat16), ts_shape)
        elif name == "multimodal":
            vk = dict(image_size=H, patch_size=16, n_frames=L, dim=128, depth=2,
                      n_heads=4, d_head=64, scale_dim=4)
            tk = dict(n_features=F, feature_dims=128, max_len=L, n_layers=4,
                      n_heads=8, dim_feedforward=512)
            model = MultiModalConcat(vivit_kwargs=vk, ts_kwargs=tk, dtype=jnp.bfloat16)
            bench_one(name, model,
                      lambda B: (jnp.zeros((B, L, H, H, 3), jnp.bfloat16),
                                 jnp.zeros((B, L, F), jnp.float32)))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
