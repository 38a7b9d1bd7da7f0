"""Flagship science campaign: F1 + warning time vs prediction horizon
(round-4 verdict next #4).

The reference's published experiment shape is a dist x seed grid run as
separate processes — `exp/exp_r2plus1d.sh` / `exp/exp_vivit.sh` sweep
`dist` over {1..20} frame horizons with seeds 40-43, each point training a
fresh model and reporting test F1 (the warning time IS dist at the
reference's fixed alarm rule). TPU-native re-expression: for each horizon,
the four seeds train SIMULTANEOUSLY as one vmapped ensemble
(train/ensemble.py), then every member sweeps the full alarm population in
one-dispatch library sweeps and is scored with the operational alarm
metrics — detection / false-alarm rate / warning-time percentiles
(eval/alarms.py), not just window F1.

Grid: dist in frames at 210 fps spanning 0.1-2.0 s (the reference's frame
horizons rescaled to this fixture's camera rate) x seeds 40-43, on the
hard fixture with reference-regime multi-second precursor leads.

One command, one artifact set:
  results/campaign_dist_sweep.json   full per-(dist, seed) records + wall
  results/campaign_dist_sweep.csv    tidy rows for the trend
  results/campaign_dist_sweep.png    F1 + warning p50 vs horizon (seeds)

Usage: python analysis/campaign_dist_sweep.py [--smoke]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(ROOT, "results")

SEEDS = (40, 41, 42, 43)
DIST_GRID = (21, 105, 210, 315, 420)      # 0.1 .. 2.0 s at 210 fps
THRESHOLD, DWELL_S = 0.5, 0.15

# fixture: hard difficulty, 8 s shots, multi-second leads; 17 disruptive +
# 16 normal shots in the alarm population (test + eval_only)
N_SHOTS, N_NORMAL, N_EVAL_D, N_EVAL_N = 12, 4, 14, 13
N_FRAMES, LEAD_S = 1680, (1.0, 3.5)
SEQ_LEN, CROP, BATCH = 21, 64, 32
EPOCHS, SAMPLES_PER_EPOCH, STEPS_PER_DISPATCH = 10, 6144, 8


def build_fixture():
    from kstar_tpu.data import VideoStore, synthetic

    shots, disrupt_df, ts_df = synthetic.make_dataset(
        n_shots=N_SHOTS, n_frames=N_FRAMES, height=CROP, width=CROP,
        seed=42, difficulty=1.0, n_normal=N_NORMAL, n_eval_disrupt=N_EVAL_D,
        n_eval_normal=N_EVAL_N, precursor_lead_s=LEAD_S)
    store = VideoStore.from_arrays({s.shot: s.frames for s in shots})
    return store, disrupt_df


def run_point(dist, store, disrupt_df, smoke=False):
    """Train the 4-seed vmapped ensemble at one horizon; per-seed test F1 +
    alarm metrics over the library-swept population."""
    from kstar_tpu.cli.common import partition_shots
    from kstar_tpu.config import (AugmentConfig, LossConfig, OptimConfig,
                                  TrainConfig, ViViTConfig)
    from kstar_tpu.data import ImbalancedSampler, VideoDataset, split_shots
    from kstar_tpu.data.augment import make_pre_fns
    from kstar_tpu.data.device_pipe import DevicePreprocessor
    from kstar_tpu.eval import score_alarms, sweep_prob_curves
    from kstar_tpu.eval.evaluate import evaluate_probs
    from kstar_tpu.models import build_video_model
    from kstar_tpu.train import (create_ensemble_state, fit_ensemble,
                                 load_checkpoint, unstack_ensemble)
    from kstar_tpu.train.loop import make_eval_step, run_eval_epoch

    d_shots, n_shots_, ev_d, ev_n = partition_shots(
        disrupt_df, sorted(store.arrays.keys()))
    train_s, valid_s, test_s = split_shots(d_shots, None)
    sweep_list = list(test_s) + ev_d + list(n_shots_) + ev_n

    mk = lambda ss: VideoDataset(store, disrupt_df, ss, seq_len=SEQ_LEN,
                                 dist=dist)
    train_ds, valid_ds, test_ds = mk(train_s), mk(valid_s), mk(test_s)

    cfg = ViViTConfig(image_size=CROP, patch_size=16, n_frames=SEQ_LEN,
                      dim=64, depth=2, n_heads=4, d_head=32, scale_dim=4)
    model = build_video_model("ViViT", cfg, dtype=jnp.bfloat16)

    pre_train, pre_eval = make_pre_fns(CROP, AugmentConfig(),
                                       out_dtype=jnp.bfloat16)
    put = lambda bl: (jax.tree.map(jnp.asarray, bl[0]), jnp.asarray(bl[1]))

    epochs = 2 if smoke else EPOCHS
    train_cfg = TrainConfig(batch_size=BATCH, num_epoch=epochs,
                            use_sampling=True, verbose=0,
                            weight_dir="/tmp/campaign_w",
                            save_dir="/tmp/campaign_r",
                            steps_per_dispatch=STEPS_PER_DISPATCH,
                            early_stopping=False)
    loss_cfg = LossConfig(loss_type="Focal", use_weighting=True)
    optim_cfg = OptimConfig(lr=2e-4)

    put_eval = DevicePreprocessor(CROP, AugmentConfig(), train=False,
                                  out_dtype=jnp.bfloat16)
    x0, _ = put_eval(train_ds.batch(np.arange(min(BATCH, len(train_ds)))))

    steps = max(SAMPLES_PER_EPOCH // BATCH, 1)
    states = create_ensemble_state(model, x0, SEEDS, optim_cfg,
                                   steps_per_epoch=steps)
    sampler = ImbalancedSampler(train_ds.labels,
                                num_samples=SAMPLES_PER_EPOCH)
    tag = f"campaign_d{dist}"
    t0 = time.perf_counter()
    states, hists = fit_ensemble(model, states, SEEDS, train_ds, valid_ds,
                                 train_cfg, loss_cfg, tag=tag,
                                 sampler=sampler, put=put, pre_fn=pre_train,
                                 pre_fn_eval=pre_eval)
    t_train = time.perf_counter() - t0

    eval_step = make_eval_step(model, loss_cfg)
    from kstar_tpu.losses import ldam_margins
    counts = test_ds.class_counts()
    w = jnp.ones(2)
    m = jnp.asarray(ldam_margins(counts, loss_cfg.ldam_max_m))

    rows = []
    t0 = time.perf_counter()
    for i, seed in enumerate(SEEDS):
        st = unstack_ensemble(states, i)
        best = os.path.join(train_cfg.weight_dir, f"{tag}_seed_{seed}_best.ckpt")
        if os.path.exists(best):
            st = load_checkpoint(st, best)
        _, _, _, (probs, labels) = run_eval_epoch(
            eval_step, st, test_ds, BATCH, w, m, jnp.zeros(3), put=put_eval,
            collect_probs=True)
        res = evaluate_probs(probs, labels, THRESHOLD)
        curves = sweep_prob_curves(model, st.params, st.batch_stats, store,
                                   disrupt_df, sweep_list, seq_len=SEQ_LEN,
                                   dist=dist, crop_size=CROP,
                                   batch_size=128)
        s = score_alarms(curves, THRESHOLD, min_dwell_s=DWELL_S)["summary"]
        rows.append({
            "dist": dist, "horizon_s": dist / 210.0, "seed": seed,
            "test_macro_f1": round(float(res["macro_f1"]), 4),
            "test_roc_auc": round(float(res["roc_auc"]), 4),
            "best_valid_f1": round(float(hists[i].best_f1), 4),
            "detection_rate": s["detection_rate"],
            "false_alarm_rate": s["false_alarm_rate"],
            "warning_p50_s": s["warning_p50_s"],
            "warning_p90_s": s["warning_p90_s"],
            "n_disrupt": s["n_disrupt"], "n_normal": s["n_normal"],
        })
        print(json.dumps(rows[-1]), flush=True)
    t_eval = time.perf_counter() - t0
    return rows, t_train, t_eval


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="2 epochs, 2 grid points (CI wiring check)")
    args = ap.parse_args()

    grid = DIST_GRID[:2] if args.smoke else DIST_GRID
    store, disrupt_df = build_fixture()
    n_pop = len(disrupt_df)
    print(f"fixture: {n_pop} shots ({N_SHOTS} train-split disruptive + "
          f"{N_NORMAL} normal + {N_EVAL_D}+{N_EVAL_N} eval-only), "
          f"{N_FRAMES} frames (8 s), leads {LEAD_S} s", flush=True)

    all_rows, walls = [], []
    t_total = time.perf_counter()
    for dist in grid:
        print(f"=== horizon dist={dist} ({dist / 210.0:.2f} s) x "
              f"{len(SEEDS)} vmapped seeds ===", flush=True)
        rows, t_train, t_eval = run_point(dist, store, disrupt_df,
                                          smoke=args.smoke)
        all_rows += rows
        walls.append({"dist": dist, "train_s": round(t_train, 1),
                      "eval_s": round(t_eval, 1)})
    wall_total = time.perf_counter() - t_total

    import pandas as pd
    df = pd.DataFrame(all_rows)
    os.makedirs(RESULTS, exist_ok=True)
    df.to_csv(os.path.join(RESULTS, "campaign_dist_sweep.csv"), index=False)

    trend = df.groupby("dist").agg(
        f1_mean=("test_macro_f1", "mean"), f1_std=("test_macro_f1", "std"),
        det_mean=("detection_rate", "mean"),
        fpr_mean=("false_alarm_rate", "mean"),
        warn_p50_mean=("warning_p50_s", "mean")).reset_index()
    summary = {
        "grid": {"dist": list(grid), "seeds": list(SEEDS)},
        "fixture": {"n_shots": N_SHOTS, "n_normal": N_NORMAL,
                    "n_eval_disrupt": N_EVAL_D, "n_eval_normal": N_EVAL_N,
                    "n_frames": N_FRAMES, "lead_s": list(LEAD_S),
                    "difficulty": 1.0},
        "protocol": {"epochs": EPOCHS, "batch": BATCH,
                     "samples_per_epoch": SAMPLES_PER_EPOCH,
                     "threshold": THRESHOLD, "min_dwell_s": DWELL_S,
                     "ensemble": "4 seeds vmapped (train/ensemble.py)"},
        "wall_clock": {"total_s": round(wall_total, 1), "per_point": walls},
        "trend": trend.to_dict("records"),
        "rows": all_rows,
    }
    out = os.path.join(RESULTS, "campaign_dist_sweep.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(13, 3.6))
        h = df.horizon_s
        for ax, col, label in [
                (axes[0], "test_macro_f1", "test macro-F1"),
                (axes[1], "warning_p50_s", "warning p50 (s)"),
                (axes[2], "detection_rate", "detection rate")]:
            ax.scatter(h, df[col], s=18, alpha=0.6, label="seeds 40-43")
            g = df.groupby("horizon_s")[col].mean()
            ax.plot(g.index, g.values, "-o", ms=4, label="mean")
            ax.set_xlabel("prediction horizon (s)")
            ax.set_ylabel(label)
            ax.grid(alpha=0.3)
        axes[2].scatter(h, df.false_alarm_rate, s=18, alpha=0.6, marker="x",
                        color="tab:red", label="false-alarm rate")
        axes[2].legend(fontsize=8)
        axes[0].legend(fontsize=8)
        fig.suptitle("ViViT campaign: metric vs horizon "
                     f"(4-seed vmapped ensembles, wall {wall_total / 60:.1f} min)")
        fig.tight_layout()
        fig.savefig(os.path.join(RESULTS, "campaign_dist_sweep.png"), dpi=120)
    except Exception as e:  # noqa: BLE001 — plot is best-effort
        print(f"plot skipped: {e}")

    print(json.dumps({k: v for k, v in summary.items() if k != "rows"},
                     indent=2))
    print(f"wrote {out} (total wall {wall_total / 60:.1f} min)")


if __name__ == "__main__":
    main()
