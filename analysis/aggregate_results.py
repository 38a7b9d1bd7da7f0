"""Aggregate sweep results (script equivalent of the reference's
performance-comparison notebooks): collect metrics.jsonl files and
*_report.txt artifacts under a results directory into one summary table.

Usage:
    python analysis/aggregate_results.py --results_dir ./results
"""

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_report(path: str) -> dict:
    out = {}
    with open(path) as f:
        for line in f:
            m = re.match(r"(macro F1|accuracy|ROC-AUC|threshold)\s*:\s*([0-9.nan]+)", line)
            if m:
                out[m.group(1)] = float(m.group(2))
    return out


def parse_tag(tag: str) -> dict:
    # <model>_clip_<L>_dist_<d>_<loss>_<boost>_seed_<s>
    m = re.match(r"(.+)_clip_(\d+)_dist_(\d+)_(CE|Focal|LDAM)_(\w+)_seed_(\d+)", tag)
    if not m:
        return {"tag": tag}
    return {"tag": tag, "model": m.group(1), "seq_len": int(m.group(2)),
            "dist": int(m.group(3)), "loss": m.group(4), "boost": m.group(5),
            "seed": int(m.group(6))}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--results_dir", type=str, default="./results")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)

    import pandas as pd

    rows = []
    for path in sorted(glob.glob(os.path.join(args.results_dir, "*_report.txt"))):
        tag = os.path.basename(path).replace("_eval_report.txt", "").replace("_report.txt", "")
        row = parse_tag(tag)
        row.update(parse_report(path))
        # final train/valid metrics from the jsonl log if present
        jl = os.path.join(args.results_dir, "tensorboard", tag, "metrics.jsonl")
        if os.path.exists(jl):
            last = {}
            with open(jl) as f:
                for line in f:
                    d = json.loads(line)
                    last[d["tag"]] = d["value"]
            row["valid_f1_final"] = last.get("F1/valid")
        rows.append(row)

    if not rows:
        print(f"no *_report.txt found under {args.results_dir}")
        return None
    df = pd.DataFrame(rows)
    with pd.option_context("display.width", 160, "display.max_columns", 20):
        print(df.to_string(index=False))
    out = args.out or os.path.join(args.results_dir, "summary.csv")
    df.to_csv(out, index=False)
    print(f"wrote {out}")
    return df


if __name__ == "__main__":
    main()
