"""Analyze experiment results: plots + stats over the 13-experiment grid.

Mirrors reference scripts/evaluation/analyze_results.py: all_results.json ->
DataFrame with the experiment-name parser (:54-85), genai-amount line plots
(:106-147), augmentation-method grouped bars (:150-201), metric heatmap
(:204-228), precision-recall scatter (:231-256), stats + %-over-baseline
(:263-302). CLI: ``--model`` selects the results subdirectory (:309-316).
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


def parse_exp_name(name: str) -> dict:
    """exp_{1,2}_original26_<method><amount>[_traditional] -> fields
    (reference :54-85)."""
    out = {"experiment": name, "group": None, "method": "baseline",
           "genai": 0, "traditional": 0}
    m = re.match(r"exp_(\d)_original26_(.*)", name)
    if not m:
        return out
    out["group"] = int(m.group(1))
    rest = m.group(2)
    if rest == "only":
        out["method"] = "baseline"
    elif m2 := re.fullmatch(r"genai(\d+)_traditional", rest):
        out["method"] = "genai+traditional"
        out["genai"] = int(m2.group(1))
        out["traditional"] = int(m2.group(1))
    elif m2 := re.fullmatch(r"genai(\d+)", rest):
        out["method"] = "genai"
        out["genai"] = int(m2.group(1))
    elif m2 := re.fullmatch(r"traditional(\d+)", rest):
        out["method"] = "traditional"
        out["traditional"] = int(m2.group(1))
    return out


def load_results(results_dir: Path) -> pd.DataFrame:
    all_file = results_dir / "all_results.json"
    if not all_file.exists():
        sys.exit(f"no all_results.json in {results_dir}")
    with open(all_file) as f:
        results = json.load(f)
    rows = []
    for r in results:
        if r.get("status") != "completed":
            continue
        row = parse_exp_name(r["experiment"])
        metrics = r.get("metrics", r)
        for task in ("bbox", "segm"):
            for k, v in metrics.get(task, {}).items():
                row[f"{task}_{k}"] = v
        rows.append(row)
    if not rows:
        sys.exit("no completed experiments found")
    return pd.DataFrame(rows)


def plot_genai_amount(df: pd.DataFrame, out_dir: Path):
    sub = df[df.method.isin(["baseline", "genai"])].sort_values("genai")
    if len(sub) < 2:
        return
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for metric, style in (("segm_AP", "-o"), ("bbox_AP", "--s")):
        if metric in sub:
            ax.plot(sub.genai, sub[metric], style, label=metric)
    ax.set_xlabel("# gen-AI augmented images")
    ax.set_ylabel("AP")
    ax.set_title("Effect of gen-AI augmentation amount")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_dir / "genai_amount.png", dpi=150)
    plt.close(fig)


def plot_method_comparison(df: pd.DataFrame, out_dir: Path):
    agg = df.groupby("method")[
        [c for c in ("segm_AP", "bbox_AP") if c in df]].mean()
    if agg.empty:
        return
    fig, ax = plt.subplots(figsize=(7, 4.5))
    agg.plot.bar(ax=ax, rot=15)
    ax.set_ylabel("mean AP")
    ax.set_title("Augmentation method comparison")
    ax.grid(axis="y", alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_dir / "method_comparison.png", dpi=150)
    plt.close(fig)


def plot_heatmap(df: pd.DataFrame, out_dir: Path):
    metrics = [c for c in df.columns if re.match(r"(bbox|segm)_AP", c)]
    if not metrics:
        return
    data = df.set_index("experiment")[metrics]
    fig, ax = plt.subplots(figsize=(9, 0.45 * len(data) + 2))
    im = ax.imshow(data.values, aspect="auto", cmap="viridis")
    ax.set_xticks(range(len(metrics)), metrics, rotation=30, ha="right")
    ax.set_yticks(range(len(data)), data.index, fontsize=8)
    for i in range(data.shape[0]):
        for j in range(data.shape[1]):
            v = data.values[i, j]
            if np.isfinite(v):
                ax.text(j, i, f"{v:.1f}", ha="center", va="center",
                        fontsize=7, color="w")
    fig.colorbar(im, ax=ax, label="AP")
    ax.set_title("Metric heatmap")
    fig.tight_layout()
    fig.savefig(out_dir / "heatmap.png", dpi=150)
    plt.close(fig)


def print_stats(df: pd.DataFrame):
    base = df[df.method == "baseline"]
    print("\n=== statistics ===")
    cols = [c for c in ("segm_AP", "bbox_AP") if c in df]
    print(df[["experiment"] + cols].to_string(index=False))
    if len(base) and "segm_AP" in df:
        b = float(base["segm_AP"].iloc[0])
        print(f"\nbaseline segm AP: {b:.2f}")
        for _, row in df.iterrows():
            if row.method == "baseline" or not np.isfinite(row.segm_AP):
                continue
            delta = (row.segm_AP - b) / max(abs(b), 1e-9) * 100
            print(f"  {row.experiment:45s} {row.segm_AP:6.2f} "
                  f"({delta:+.1f}% vs baseline)")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="maskdino",
                    help="results subdirectory (results/<model>/)")
    ap.add_argument("--results-dir", default="./results")
    args = ap.parse_args()

    results_dir = Path(args.results_dir) / args.model
    df = load_results(results_dir)
    out_dir = results_dir / "analysis"
    out_dir.mkdir(parents=True, exist_ok=True)
    plot_genai_amount(df, out_dir)
    plot_method_comparison(df, out_dir)
    plot_heatmap(df, out_dir)
    print_stats(df)
    df.to_csv(out_dir / "results.csv", index=False)
    print(f"\nplots + CSV -> {out_dir}")


if __name__ == "__main__":
    main()
