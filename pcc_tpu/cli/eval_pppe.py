"""Evaluate PPPE compression (reference eval_pppe.py CLI).

Same CSV schema (eval_pppe:92-100) — the patch pipeline's columns minus the
uniformity coefficient; bpp comes from the single `.bin` file (eval_pppe:80);
compressed/decompressed files are located by recursive filename match
(eval_pppe:63-68).
"""

from __future__ import annotations

import argparse
import os
from glob import glob

import numpy as np
import pandas as pd

from pcc_tpu.io import read_point_cloud
from pcc_tpu.metrics import compute_bitrate, eval_batch


def build_parser():
    p = argparse.ArgumentParser(
        description="Evaluate new compressed/decompressed point cloud data")
    p.add_argument("--input_glob", default="./data/ModelNet40_pc_01_8192p/**/test/*.ply",
                   help="Original point clouds glob pattern.")
    p.add_argument("--compressed_path", default="./data/ModelNet40_K256_compressed_p1/",
                   help="Compressed .bin files folder.")
    p.add_argument("--decompressed_path", default="./data/ModelNet40_K256_decompressed_p1/",
                   help="Decompressed .ply files folder.")
    p.add_argument("--output_file", default="./eval/ModelNet40_pppe.csv",
                   help="Evaluation Detail saved as csv.")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from pcc_tpu.cli._common import setup_jax
    setup_jax()   # compile cache + honor JAX_PLATFORMS (the other CLIs do)
    files = sorted(glob(args.input_glob, recursive=True))
    filenames = [os.path.split(x)[1] for x in files]

    rows = {k: [] for k in (
        "filename", "p2pointPSNR", "p2planePSNR", "chamfer_distance",
        "n_points_input", "n_points_output", "bpp")}

    print("Evaluating...")
    pending = []
    for f, name in zip(files, filenames):
        comp_candidates = glob(
            os.path.join(args.compressed_path, "**", name.replace(".ply", ".bin")),
            recursive=True)
        decomp_candidates = glob(
            os.path.join(args.decompressed_path, "**", name.replace(".ply", ".bin.ply")),
            recursive=True)
        if not comp_candidates or not decomp_candidates:
            continue
        pending.append({
            "name": name,
            "in": read_point_cloud(f),
            "out": read_point_cloud(decomp_candidates[0]),
            "bytes": os.path.getsize(comp_candidates[0]),
        })

    # batched geometry metrics per (N, M) shape group (see cli/eval.py)
    by_shape: dict[tuple, list[int]] = {}
    for i, item in enumerate(pending):
        by_shape.setdefault(
            (item["in"].shape[0], item["out"].shape[0]), []).append(i)
    for idxs in by_shape.values():
        origs = np.stack([pending[i]["in"] for i in idxs])
        recons = np.stack([pending[i]["out"] for i in idxs])
        for i, m in zip(idxs, eval_batch(origs, recons)):
            pending[i]["metrics"] = m

    for item in pending:
        m = item["metrics"]
        rows["filename"].append(item["name"])
        rows["p2pointPSNR"].append(round(m["p2point_psnr"], 3))
        rows["p2planePSNR"].append(round(m["p2plane_psnr"], 3))
        rows["chamfer_distance"].append(m["chamfer"])
        rows["n_points_input"].append(item["in"].shape[0])
        rows["n_points_output"].append(item["out"].shape[0])
        rows["bpp"].append(compute_bitrate(item["bytes"], item["in"].shape[0]))

    if rows["filename"]:
        print(
            f"Done! The average p2pointPSNR: {round(float(np.mean(rows['p2pointPSNR'])), 3)} | "
            f"p2plane PSNR: {round(float(np.mean(rows['p2planePSNR'])), 3)} | "
            f"chamfer distance: {round(float(np.mean(rows['chamfer_distance'])), 8)} | "
            f"bpp: {round(float(np.mean(rows['bpp'])), 3)}"
        )
    else:
        print("Done! No input/decompressed file pairs matched — nothing to average.")
    os.makedirs(os.path.dirname(args.output_file) or ".", exist_ok=True)
    pd.DataFrame(rows).to_csv(args.output_file)
    print(f"Evaluation results saved to {args.output_file}")


if __name__ == "__main__":
    main()
