"""Analyze MaskDINO per-experiment results (bbox + segm tasks).

Mirrors reference scripts/evaluation/analyze_maskdino_results.py: reads
per-experiment ``results.json`` with {bbox:{AP,AP50,AP75}, segm:{...}}
(:51-118), bbox-vs-segm scatter (:233-262), dual heatmaps (:265-301),
CSV export (:403-405).
"""

import argparse
import json
import re
import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent))

from analyze_results import parse_exp_name, plot_genai_amount, print_stats


def load_per_experiment(results_dir: Path) -> pd.DataFrame:
    rows = []
    for exp_dir in sorted(results_dir.iterdir()):
        f = exp_dir / "results.json"
        if not f.is_file():
            continue
        with open(f) as fh:
            r = json.load(fh)
        if r.get("status", "completed") != "completed":
            continue
        row = parse_exp_name(r.get("experiment", exp_dir.name))
        for task in ("bbox", "segm"):
            for k, v in r.get(task, {}).items():
                row[f"{task}_{k}"] = v
        rows.append(row)
    if not rows:
        sys.exit(f"no per-experiment results.json under {results_dir}")
    return pd.DataFrame(rows)


def plot_bbox_vs_segm(df: pd.DataFrame, out_dir: Path):
    if "bbox_AP" not in df or "segm_AP" not in df:
        return
    fig, ax = plt.subplots(figsize=(6, 6))
    for method, sub in df.groupby("method"):
        ax.scatter(sub.bbox_AP, sub.segm_AP, label=method, s=50)
    lim = [0, max(df.bbox_AP.max(), df.segm_AP.max()) * 1.1 + 1]
    ax.plot(lim, lim, "k--", alpha=0.3)
    ax.set_xlabel("bbox AP")
    ax.set_ylabel("segm AP")
    ax.set_title("bbox vs segm AP per experiment")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_dir / "bbox_vs_segm.png", dpi=150)
    plt.close(fig)


def plot_dual_heatmaps(df: pd.DataFrame, out_dir: Path):
    fig, axes = plt.subplots(1, 2, figsize=(14, 0.45 * len(df) + 2))
    for ax, task in zip(axes, ("bbox", "segm")):
        cols = [c for c in df.columns if c.startswith(task + "_")]
        if not cols:
            continue
        data = df.set_index("experiment")[cols]
        im = ax.imshow(data.values, aspect="auto", cmap="magma")
        ax.set_xticks(range(len(cols)),
                      [c.split("_", 1)[1] for c in cols], rotation=30)
        ax.set_yticks(range(len(data)), data.index, fontsize=7)
        ax.set_title(task)
        fig.colorbar(im, ax=ax)
    fig.tight_layout()
    fig.savefig(out_dir / "dual_heatmaps.png", dpi=150)
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--results-dir", default="./output/experiments")
    args = ap.parse_args()

    results_dir = Path(args.results_dir)
    df = load_per_experiment(results_dir)
    out_dir = results_dir / "analysis"
    out_dir.mkdir(parents=True, exist_ok=True)
    plot_genai_amount(df, out_dir)
    plot_bbox_vs_segm(df, out_dir)
    plot_dual_heatmaps(df, out_dir)
    print_stats(df)
    df.to_csv(out_dir / "maskdino_results.csv", index=False)
    print(f"\nplots + CSV -> {out_dir}")


if __name__ == "__main__":
    main()
