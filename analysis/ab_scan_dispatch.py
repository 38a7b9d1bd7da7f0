"""On-chip before/after for the round-3 scan-dispatch modes (TODO.md).

Two epoch drivers gained a ``steps_per_dispatch`` (K) mode this round:

  * gb_estimate's per-stream probe epochs (train/gb.py
    make_stream_scan_steps) — previously one dispatch per step;
  * fit_ensemble (train/ensemble.py make_ensemble_scan_steps) — vmap over
    members x lax.scan over K batches.

Both matter only because of per-dispatch latency (the axon relay measures
25-2557 ms per dispatch under load; a directly-attached host ~0.1 ms), so
the honest number is wall-clock per epoch through the relay at K=1 vs K=8,
identical data and rng streams (trajectory equality is covered by
tests/test_gb_training.py and tests/test_ensemble.py).

Usage: python analysis/ab_scan_dispatch.py [gb|ensemble ...]
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

from kstar_tpu.config import (LossConfig, OptimConfig, Schema, TrainConfig,
                              TransformerConfig)

BATCH = 64
SEQ = 21


def _ts_datasets():
    from kstar_tpu.data import TSDataset, prepare_0d_dataset, synthetic

    cols = Schema.INPUT_FEATURES
    shots, disrupt_df, ts_df = synthetic.make_dataset(
        n_shots=16, n_frames=4096, height=16, width=16, seed=11)
    df_tr, df_va, _, scaler = prepare_0d_dataset(ts_df, cols, test_shot=None)
    mk = lambda df: TSDataset(df, disrupt_df, cols, seq_len=SEQ, dist=3,
                              scaler=scaler)
    return cols, mk(df_tr), mk(df_va)


def bench_ensemble():
    """fit_ensemble, 4-seed Transformer0D, one epoch, K=1 vs K=8."""
    from kstar_tpu.models import build_0d_model
    from kstar_tpu.train import create_ensemble_state, fit_ensemble

    cols, train_ds, valid_ds = _ts_datasets()
    model = build_0d_model("Transformer", TransformerConfig(
        n_features=len(cols), max_len=SEQ), dtype=jnp.bfloat16)
    x0, _ = train_ds.batch(np.arange(BATCH))
    seeds = [40, 41, 42, 43]

    for k in (1, 8):
        mk_cfg = lambda n: TrainConfig(batch_size=BATCH, num_epoch=n,
                                       weight_dir="/tmp/ab_w",
                                       early_stopping=False, verbose=0,
                                       steps_per_dispatch=k)

        def run(n_epochs):
            states = create_ensemble_state(model, jnp.asarray(x0), seeds,
                                           OptimConfig(lr=1e-3))
            t0 = time.perf_counter()
            fit_ensemble(model, states, seeds, train_ds, valid_ds, mk_cfg(n_epochs),
                         LossConfig("Focal"), tag=f"ab_k{k}")
            return time.perf_counter() - t0

        # each fit_ensemble call rebuilds its jitted closures (full retrace;
        # executables come from the persistent cache), so a single timed
        # call would include trace+reload cost — the marginal epoch
        # t(2 epochs) - t(1 epoch), both warm, cancels it exactly
        run(1)                      # populate the persistent compile cache
        dt = run(2) - run(1)
        n_steps = len(train_ds) // BATCH
        print(f"fit_ensemble 4 seeds, K={k}: {dt:6.2f} s/epoch "
              f"(marginal epoch, {n_steps} steps + eval)")


def bench_gb():
    """gb_estimate probe epochs (3 streams x 2 epochs), tiny fusion model,
    K=1 vs K=8 through the relay."""
    from kstar_tpu.data import MultiModalDataset, Scaler, synthetic
    from kstar_tpu.data.augment import make_pre_fns
    from kstar_tpu.config import AugmentConfig
    from kstar_tpu.models import MultiModalGB
    from kstar_tpu.train import create_train_state
    from kstar_tpu.train.gb import gb_estimate

    cols = Schema.INPUT_FEATURES
    dt_ts = 4.0 / 210.0
    shots, disrupt_df, ts_df = synthetic.make_dataset(
        n_shots=8, n_frames=512, height=64, width=64, seed=7, dt=dt_ts)
    from kstar_tpu.data import VideoStore
    store = VideoStore.from_arrays({s.shot: s.frames for s in shots})
    scaler = Scaler("Robust").fit(ts_df[cols].values)
    ds = MultiModalDataset(store, ts_df, disrupt_df, cols,
                           [s.shot for s in shots], seq_len=21, dist=3,
                           dt=dt_ts, tau=1, scaler=scaler)
    crop = 64
    vivit_kw = dict(image_size=crop, patch_size=16, n_frames=21, dim=64,
                    depth=1, n_heads=2, d_head=32, scale_dim=2)
    ts_kw = dict(n_features=len(cols), feature_dims=64, max_len=21,
                 n_layers=1, n_heads=4, dim_feedforward=128, cls_dims=64)
    model = MultiModalGB(vivit_kwargs=vivit_kw, ts_kwargs=ts_kw,
                         dtype=jnp.bfloat16)
    pre_train, pre_eval = make_pre_fns(crop, AugmentConfig(),
                                       out_dtype=jnp.bfloat16)
    from kstar_tpu.data.device_pipe import DevicePreprocessor
    put_eval = DevicePreprocessor(crop, AugmentConfig(), train=False,
                                  out_dtype=jnp.bfloat16)
    b0, _ = put_eval(ds.batch(np.arange(32)))
    state = create_train_state(model, None, jax.random.key(0), OptimConfig(),
                               apply_args=(b0["video"], b0["0D"]))

    for k in (1, 8):
        # shared step cache (as fit_gb passes): without it every call
        # rebuilds the 3x(train+scan+eval) jitted programs and the timed
        # 'steady' run is mostly retrace
        cache = {}
        for label in ("compile", "steady"):
            t0 = time.perf_counter()
            w = gb_estimate(model, state, ds, ds, LossConfig("CE"),
                            batch_size=32, n_epochs=2, seed=3,
                            pre_fn=pre_train, pre_fn_eval=pre_eval,
                            steps_per_dispatch=k, step_cache=cache)
            dt = time.perf_counter() - t0
        print(f"gb_estimate 3 streams x 2 epochs, K={k}: {dt:6.2f} s  "
              f"(weights {['%.2f' % w[s] for s in ('video', '0D', 'multi')]})")


def main():
    which = sys.argv[1:] or ["ensemble", "gb"]
    if "ensemble" in which:
        bench_ensemble()
    if "gb" in which:
        bench_gb()


if __name__ == "__main__":
    main()
