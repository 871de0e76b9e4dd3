"""Plot evaluation-CSV metrics (reference visualize.py CLI).

Covers the same analysis set the reference produces — per-metric
histograms, point-count error rate, input-vs-output scatter, pairwise
metric grid, and per-file bitrate/PSNR/chamfer charts — so a reference
user finds every figure they expect. Differences (deliberate):
  * every figure is actually written to --outdir (the reference leaves
    most savefig calls commented out, visualize.py:31,43,57,82, and drops
    the rest into the CWD);
  * styling is this framework's own: one categorical hue order (blue,
    orange), a recessive hairline grid, neutral ink for text, no per-point
    markers on long series.
"""

from __future__ import annotations

import argparse
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd

# house style: categorical slots in fixed order; grid/ink stay recessive
SERIES_1 = "#2a78d6"   # primary (blue)
SERIES_2 = "#eb6834"   # secondary (orange)
INK_MUTED = "#898781"
GRID = "#e1e0d9"
SURFACE = "#fcfcfb"

plt.rcParams.update({
    "axes.edgecolor": INK_MUTED,
    "axes.labelcolor": "#0b0b0b",
    "axes.grid": True,
    "grid.color": GRID,
    "grid.linewidth": 0.8,
    "xtick.color": INK_MUTED,
    "ytick.color": INK_MUTED,
    "figure.facecolor": SURFACE,
    "axes.facecolor": SURFACE,
})


def _new_fig(w=7.0, h=4.2):
    fig, ax = plt.subplots(figsize=(w, h))
    ax.set_axisbelow(True)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    return fig, ax


def plot_histograms(df, metrics, outdir):
    for metric in metrics:
        fig, ax = _new_fig()
        ax.hist(df[metric].dropna(), bins=30, color=SERIES_1,
                edgecolor=SURFACE, linewidth=0.6)
        ax.set_title(f"Histogram of {metric}")
        ax.set_xlabel(metric)
        ax.set_ylabel("Count")
        fig.tight_layout()
        safe = metric.replace(" ", "_")
        fig.savefig(os.path.join(outdir, f"{safe}_hist.png"), dpi=120)
        plt.close(fig)


def plot_point_counts(df, outdir):
    if not {"n_points_input", "n_points_output"} <= set(df.columns):
        return
    err = (df["n_points_input"] - df["n_points_output"]) / df["n_points_input"]
    fig, ax = _new_fig()
    ax.hist(err.dropna(), bins=30, color=SERIES_1,
            edgecolor=SURFACE, linewidth=0.6)
    ax.set_title("Histogram of Error Rate (Input - Output) / Input")
    ax.set_xlabel("Error Rate")
    ax.set_ylabel("Count")
    fig.tight_layout()
    fig.savefig(os.path.join(outdir, "error_rate_hist.png"), dpi=120)
    plt.close(fig)

    fig, ax = _new_fig(5.5, 5.5)
    ax.scatter(df["n_points_input"], df["n_points_output"],
               s=14, alpha=0.6, color=SERIES_1, linewidths=0)
    lo, hi = df["n_points_input"].min(), df["n_points_input"].max()
    ax.plot([lo, hi], [lo, hi], linestyle="--", linewidth=1.2,
            color=INK_MUTED, label="Input = Output")
    ax.set_xlabel("Number of Input Points")
    ax.set_ylabel("Number of Output Points")
    ax.set_title("Input vs Output Points")
    ax.legend(frameon=False)
    fig.tight_layout()
    fig.savefig(os.path.join(outdir, "input_vs_output_points.png"), dpi=120)
    plt.close(fig)


def plot_pairgrid(df, metrics, outdir):
    n = len(metrics)
    fig, axes = plt.subplots(n, n, figsize=(2.6 * n, 2.6 * n))
    for i, mx in enumerate(metrics):
        for j, my in enumerate(metrics):
            ax = axes[i, j]
            ax.set_axisbelow(True)
            if i == j:
                ax.hist(df[mx].dropna(), bins=30, color=SERIES_1,
                        edgecolor=SURFACE, linewidth=0.4)
            else:
                ax.scatter(df[my], df[mx], alpha=0.4, s=6,
                           color=SERIES_1, linewidths=0)
            if i == n - 1:
                ax.set_xlabel(my, fontsize=8)
            if j == 0:
                ax.set_ylabel(mx, fontsize=8)
            ax.tick_params(labelsize=7)
    fig.suptitle("Pairwise Plots of Evaluation Metrics", y=1.0)
    fig.tight_layout(rect=(0, 0, 1, 0.98))
    fig.savefig(os.path.join(outdir, "metrics_pairplot.png"), dpi=120)
    plt.close(fig)


def plot_per_file(df, outdir):
    idx = range(1, len(df) + 1)
    fig, ax = _new_fig(9, 4.2)
    ax.bar(idx, df["bpp"], color=SERIES_1, width=0.85)
    ax.set_xlabel("File Index")
    ax.set_ylabel("Bitrate (bpp)")
    ax.set_title("Bitrate per File")
    fig.tight_layout()
    fig.savefig(os.path.join(outdir, "bitrate_per_file.png"), dpi=120)
    plt.close(fig)

    fig, ax = _new_fig(9, 4.2)
    ax.plot(idx, df["p2pointPSNR"], label="p2point PSNR",
            color=SERIES_1, linewidth=1.6)
    ax.plot(idx, df["p2planePSNR"], label="p2plane PSNR",
            color=SERIES_2, linewidth=1.6)
    ax.set_xlabel("File Index")
    ax.set_ylabel("PSNR (dB)")
    ax.set_title("PSNR per File")
    ax.legend(frameon=False)
    fig.tight_layout()
    fig.savefig(os.path.join(outdir, "psnr_per_file.png"), dpi=120)
    plt.close(fig)

    fig, ax = _new_fig(9, 4.2)
    ax.bar(idx, df["chamfer_distance"], color=SERIES_1, width=0.85)
    ax.set_xlabel("File Index")
    ax.set_ylabel("Chamfer Distance")
    ax.set_title("Chamfer Distance per File")
    fig.tight_layout()
    fig.savefig(os.path.join(outdir, "chamfer_distance_per_file.png"), dpi=120)
    plt.close(fig)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Visualize evaluation metrics from eval.py output CSV.")
    parser.add_argument("--csv", default="./eval/ModelNet40_K256.csv",
                        help="Path to the evaluation CSV file (output of eval.py)")
    parser.add_argument("--outdir", default="./figure",
                        help="Directory to save plots")
    args = parser.parse_args(argv)

    os.makedirs(args.outdir, exist_ok=True)
    df = pd.read_csv(args.csv)
    metrics = [c for c in df.columns
               if c not in ("filename",) and not c.startswith("Unnamed")]

    plot_histograms(df, metrics, args.outdir)
    plot_point_counts(df, args.outdir)
    plot_pairgrid(df, metrics, args.outdir)
    plot_per_file(df, args.outdir)
    print(f"Plots saved to {args.outdir}/")


if __name__ == "__main__":
    main()
