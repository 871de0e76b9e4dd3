"""Quality-tier classification + cloud comparison viewer
(reference compare.py CLI).

Same threshold tables and High/Medium/Low classification of the global
averages (compare.py:19-57,64-86), plus the pairwise metric grid. The
interactive dual-cloud viewer replaces the reference's open3d key-callback
window (compare.py:115-175) with a matplotlib 3D pager (A/D keys), since
open3d is not part of this stack; a non-interactive --snapshot mode writes
side-by-side renders to disk for headless use.
"""

from __future__ import annotations

import argparse
import os
from glob import glob

import matplotlib
import numpy as np
import pandas as pd

THRESHOLDS = {
    "p2pointPSNR": {"high": 38, "medium": 30},
    "p2planePSNR": {"high": 40, "medium": 32},
    "bpp": {"low": 0.4, "high": 1.2},
    "point_preservation": {"high": 0.95, "medium": 0.85},
    "chamfer_distance": {"low": 0.0008, "medium": 0.002},
}


def classify_metric(value: float, metric: str) -> str:
    t = THRESHOLDS.get(metric)
    if t is None:
        return "Unknown"
    if metric in ("p2pointPSNR", "p2planePSNR", "point_preservation"):
        if value >= t["high"]:
            return "High"
        if value >= t["medium"]:
            return "Medium"
        return "Low"
    if metric == "bpp":
        if value < t["low"]:
            return "High"
        if value < t["high"]:
            return "Medium"
        return "Low"
    if metric == "chamfer_distance":
        if value <= t["low"]:
            return "High"
        if value <= t["medium"]:
            return "Medium"
        return "Low"
    return "Unknown"


def overall_metrics(df: pd.DataFrame, outdir: str | None = None):
    df = df.copy()
    df["point_preservation"] = df["n_points_output"] / df["n_points_input"]
    global_avg = {
        m: float(df[m].mean())
        for m in ("p2pointPSNR", "p2planePSNR", "chamfer_distance", "bpp",
                  "point_preservation")
    }
    print("Global Averages:")
    for metric, value in global_avg.items():
        print(f"{metric}: {value:.2f} ({classify_metric(value, metric)})")

    import matplotlib.pyplot as plt

    metrics = [c for c in df.columns
               if c not in ("filename", "id") and not c.startswith("Unnamed")]
    n = len(metrics)
    fig, axs = plt.subplots(n, n, figsize=(15, 15))
    for i, mx in enumerate(metrics):
        for j, my in enumerate(metrics):
            ax = axs[i, j]
            if i == j:
                ax.text(0.5, 0.5, mx, fontsize=10, ha="center", va="center")
                ax.set_xticks([])
                ax.set_yticks([])
            else:
                color = "orange" if mx == "bpp" else None
                ax.scatter(df[my], df[mx], alpha=0.5, s=10, color=color)
            if i == n - 1:
                ax.set_xlabel(my)
            if j == 0:
                ax.set_ylabel(mx)
    fig.suptitle("Pairwise Plots of Evaluation Metrics", y=1.0)
    fig.tight_layout(rect=(0, 0, 1, 0.98))
    if outdir:
        os.makedirs(outdir, exist_ok=True)
        fig.savefig(os.path.join(outdir, "metrics_pairplot.png"))
        plt.close(fig)
    else:
        plt.show()
    return global_avg


class PointCloudPager:
    """A/D-keyed dual-cloud pager (compare.py:115-175 semantics):
    original in blue, reconstruction in red shifted +0.3 on x."""

    def __init__(self, df, input_dir, recon_dir):
        self.df = df
        self.input_dir = input_dir
        self.recon_dir = recon_dir
        self.index = 0

    def load_pair(self):
        from pcc_tpu.io import read_point_cloud

        row = self.df.iloc[self.index]
        orig = glob(os.path.join(self.input_dir, "**", "test", row["filename"]),
                    recursive=True)
        recon_candidates = [
            os.path.join(self.recon_dir, row["filename"]),
            os.path.join(self.recon_dir, row["filename"] + ".bin.ply"),
        ]
        recon = [p for p in recon_candidates if os.path.exists(p)]
        if not orig or not recon:
            print(f"Missing file for: {row['filename']}")
            return None, None
        return read_point_cloud(orig[0]), read_point_cloud(recon[0])

    def print_row(self):
        row = self.df.iloc[self.index]
        print(f"\n[{self.index + 1}/{len(self.df)}] {row['filename']}")
        print(f"p2pointPSNR = {row['p2pointPSNR']:.2f}, "
              f"p2planePSNR = {row['p2planePSNR']:.2f}")
        print(f"Chamfer Distance = {row['chamfer_distance']:.6f}, "
              f"Bitrate = {row['bpp']:.4f}")
        head = self.df.iloc[: self.index + 1]
        print("Avg -> PSNR(p2point): {:.2f}, bpp: {:.4f}, Chamfer: {:.6f}".format(
            head["p2pointPSNR"].mean(), head["bpp"].mean(),
            head["chamfer_distance"].mean()))

    def draw(self, ax):
        pair = self.load_pair()
        ax.clear()
        if pair[0] is not None:
            a, b = pair
            ax.scatter(a[:, 0], a[:, 1], a[:, 2], s=0.5, c="#3333ff", label="original")
            ax.scatter(b[:, 0] + 0.3, b[:, 1], b[:, 2], s=0.5, c="#ff0000",
                       label="reconstruction (+0.3x)")
            ax.legend(loc="upper right")
            self.print_row()
        ax.set_title(self.df.iloc[self.index]["filename"])

    def run(self):
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(10, 6))
        ax = fig.add_subplot(111, projection="3d")

        def on_key(event):
            if event.key in ("d", "right"):
                self.index = (self.index + 1) % len(self.df)
            elif event.key in ("a", "left"):
                self.index = (self.index - 1) % len(self.df)
            else:
                return
            self.draw(ax)
            fig.canvas.draw_idle()

        fig.canvas.mpl_connect("key_press_event", on_key)
        self.draw(ax)
        print("Press [A] for previous, [D] for next, close the window to quit.")
        plt.show()

    def snapshot(self, outdir: str, limit: int = 8):
        import matplotlib.pyplot as plt

        os.makedirs(outdir, exist_ok=True)
        for i in range(min(limit, len(self.df))):
            self.index = i
            fig = plt.figure(figsize=(10, 6))
            ax = fig.add_subplot(111, projection="3d")
            self.draw(ax)
            fig.savefig(os.path.join(
                outdir, f"compare_{i:03d}.png"), dpi=100)
            plt.close(fig)
        print(f"Snapshots saved to {outdir}/")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", type=str,
                        default="./data/ModelNet40_pc_01_8192p/",
                        help="Directory containing original PLY files")
    parser.add_argument("--recon_dir", type=str,
                        default="./data/ModelNet40_K256_decompressed_ply",
                        help="Directory containing reconstructed PLY files")
    parser.add_argument("--csv_path", type=str,
                        default="./eval/ModelNet40_K256.csv",
                        help="CSV file containing evaluation metrics")
    parser.add_argument("--snapshot", type=str, default=None,
                        help="Write side-by-side renders here instead of "
                             "opening the interactive viewer (headless mode).")
    args = parser.parse_args(argv)

    if args.snapshot:
        matplotlib.use("Agg")

    df = pd.read_csv(args.csv_path)
    overall_metrics(df, outdir=args.snapshot)
    pager = PointCloudPager(df, args.input_dir, args.recon_dir)
    if args.snapshot:
        pager.snapshot(args.snapshot)
    else:
        pager.run()


if __name__ == "__main__":
    main()
