"""Plot evaluation-CSV metrics (reference visualize.py CLI).

Same plot set: per-metric histograms, point-count error rate, input-vs-
output scatter, pairwise metric grid, and per-file bitrate/PSNR/chamfer
charts. Difference (deliberate): every figure is actually written to
--outdir — the reference computes most figures and leaves the savefig
calls commented out (visualize.py:31,43,57,82), dropping the per-file
charts into the CWD instead.
"""

from __future__ import annotations

import argparse
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd


def plot_histograms(df, metrics, outdir):
    for metric in metrics:
        plt.figure(figsize=(8, 5))
        plt.hist(df[metric].dropna(), bins=30, color="skyblue",
                 edgecolor="black", alpha=0.7)
        plt.title(f"Histogram of {metric}")
        plt.xlabel(metric)
        plt.ylabel("Count")
        plt.tight_layout()
        safe = metric.replace(" ", "_")
        plt.savefig(os.path.join(outdir, f"{safe}_hist.png"))
        plt.close()


def plot_point_counts(df, outdir):
    if not {"n_points_input", "n_points_output"} <= set(df.columns):
        return
    err = (df["n_points_input"] - df["n_points_output"]) / df["n_points_input"]
    plt.figure(figsize=(8, 5))
    plt.hist(err.dropna(), bins=30, color="salmon", edgecolor="black", alpha=0.7)
    plt.title("Histogram of Error Rate (Input - Output) / Input")
    plt.xlabel("Error Rate")
    plt.ylabel("Count")
    plt.tight_layout()
    plt.savefig(os.path.join(outdir, "error_rate_hist.png"))
    plt.close()

    plt.figure(figsize=(7, 7))
    plt.scatter(df["n_points_input"], df["n_points_output"],
                alpha=0.6, color="purple", edgecolor="k")
    lo, hi = df["n_points_input"].min(), df["n_points_input"].max()
    plt.plot([lo, hi], [lo, hi], "r--", label="Input = Output")
    plt.xlabel("Number of Input Points")
    plt.ylabel("Number of Output Points")
    plt.title("Input vs Output Points")
    plt.legend()
    plt.tight_layout()
    plt.savefig(os.path.join(outdir, "input_vs_output_points.png"))
    plt.close()


def plot_pairgrid(df, metrics, outdir):
    n = len(metrics)
    fig, axes = plt.subplots(n, n, figsize=(3 * n, 3 * n))
    for i, mx in enumerate(metrics):
        for j, my in enumerate(metrics):
            ax = axes[i, j]
            if i == j:
                ax.hist(df[mx].dropna(), bins=30, color="skyblue",
                        edgecolor="black", alpha=0.7)
            else:
                ax.scatter(df[my], df[mx], alpha=0.5, s=10)
            if i == n - 1:
                ax.set_xlabel(my)
            if j == 0:
                ax.set_ylabel(mx)
    fig.suptitle("Pairwise Plots of Evaluation Metrics", y=1.0)
    fig.tight_layout(rect=(0, 0, 1, 0.98))
    fig.savefig(os.path.join(outdir, "metrics_pairplot.png"))
    plt.close(fig)


def plot_per_file(df, outdir):
    idx = range(1, len(df) + 1)
    plt.figure(figsize=(10, 5))
    plt.bar(idx, df["bpp"], color="steelblue")
    plt.xlabel("File Index")
    plt.ylabel("Bitrate (bpp)")
    plt.title("Bitrate per File")
    plt.grid(True)
    plt.tight_layout()
    plt.savefig(os.path.join(outdir, "bitrate_per_file.png"))
    plt.close()

    plt.figure(figsize=(10, 5))
    plt.plot(idx, df["p2pointPSNR"], label="p2point PSNR", marker="o")
    plt.plot(idx, df["p2planePSNR"], label="p2plane PSNR", marker="x")
    plt.xlabel("File Index")
    plt.ylabel("PSNR (dB)")
    plt.title("PSNR per File")
    plt.legend()
    plt.grid(True)
    plt.tight_layout()
    plt.savefig(os.path.join(outdir, "psnr_per_file.png"))
    plt.close()

    plt.figure(figsize=(10, 5))
    plt.bar(idx, df["chamfer_distance"], color="darkorange")
    plt.xlabel("File Index")
    plt.ylabel("Chamfer Distance")
    plt.title("Chamfer Distance per File")
    plt.grid(True)
    plt.tight_layout()
    plt.savefig(os.path.join(outdir, "chamfer_distance_per_file.png"))
    plt.close()


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
