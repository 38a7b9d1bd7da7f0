"""Exploratory data analysis (script equivalent of the reference's
analysis/*.ipynb EDA notebooks): shot-log statistics, window/label balance
across prediction distances, and 0D signal distributions.

Usage:
    python analysis/eda.py --synthetic
    python analysis/eda.py --data_root ./dataset
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", type=str, default="./dataset")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--save_dir", type=str, default="./results/eda")
    p.add_argument("--seq_len", type=int, default=21)
    args = p.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from kstar_tpu.config import DT_0D, Schema
    from kstar_tpu.data import TSDataset, prepare_0d_dataset
    from kstar_tpu.cli.common import load_data

    ns = argparse.Namespace(synthetic=args.synthetic, data_root=args.data_root,
                            random_seed=42)
    disrupt_df, ts_df, _ = load_data(ns, need_video=False, dt=DT_0D)
    cols = Schema.INPUT_FEATURES
    os.makedirs(args.save_dir, exist_ok=True)

    # shot-log stats
    durations = disrupt_df.tipminf - disrupt_df.tftsrt
    print(f"shots: {len(disrupt_df)} | plasma duration mean {durations.mean():.2f}s "
          f"min {durations.min():.2f}s max {durations.max():.2f}s")

    # class balance vs prediction distance
    dists = [1, 2, 3, 4, 5, 8, 12, 20]
    ratios = []
    for dist in dists:
        ds = TSDataset(ts_df, disrupt_df, cols, seq_len=args.seq_len, dist=dist, dt=DT_0D)
        c = ds.class_counts()
        ratios.append(c[0] / max(c.sum(), 1))
        print(f"dist {dist:3d}: {len(ds):6d} windows | disruptive {c[0]} ({ratios[-1]:.3%})")

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 4))
    ax1.plot(dists, ratios, "o-")
    ax1.set_xlabel("prediction distance (samples)")
    ax1.set_ylabel("disruptive fraction")
    ax1.set_title("class imbalance vs distance")

    # signal distributions
    sig = cols[:6]
    for c in sig:
        vals = ts_df[c].dropna().values
        ax2.hist(vals, bins=50, alpha=0.4, label=c.lstrip("\\"), density=True)
    ax2.legend(fontsize=7)
    ax2.set_title("signal distributions")
    fig.tight_layout()
    fig.savefig(os.path.join(args.save_dir, "eda.png"))
    print(f"wrote {args.save_dir}/eda.png")


if __name__ == "__main__":
    main()
