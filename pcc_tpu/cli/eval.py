"""Evaluate original vs decompressed clouds (reference eval.py CLI).

Same CSV schema (eval.py:212-221): columns
[filename, p2pointPSNR, p2planePSNR, chamfer_distance, n_points_input,
 n_points_output, bpp, uniformity coefficient], plus the same printed
averages line. Metrics run on device (pcc_tpu/metrics.py) instead of the
reference's per-point host loops.
"""

from __future__ import annotations

import argparse
import os
from glob import glob

import numpy as np
import pandas as pd

from pcc_tpu.io import read_point_cloud
from pcc_tpu.io.ply import read_point_cloud_attr, read_point_cloud_normals
from pcc_tpu.metrics import (
    calc_uc,
    compute_bitrate,
    compute_color_psnr,
    compute_p2point_p2plane_psnr,
    eval_batch,
    normalized_chamfer,
)


def build_parser():
    p = argparse.ArgumentParser(
        prog="eval.py",
        description="Evaluate point cloud patches",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("--input_glob", default="./data/ModelNet40_pc_01_8192p/**/test/*.ply",
                   help="Point clouds glob pattern for compression.")
    p.add_argument("--compressed_path", default="./data/ModelNet40_K256_compressed/",
                   help="Compressed .bin files folder.")
    p.add_argument("--decompressed_path", default="./data/ModelNet40_K256_decompressed/",
                   help="Decompressed .ply files folder.")
    p.add_argument("--output_file", default="./eval/ModelNet40_K256.csv",
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
        "n_points_input", "n_points_output", "bpp", "uniformity coefficient")}
    # extension columns, added only when {name}.a.bin attribute streams
    # exist so geometry-only CSVs keep the reference schema byte-for-byte
    attr_rows = {"color_psnr": [], "attr_bpp": []}

    print("Evaluating...")
    # First pass: load pairs. Geometry metrics are computed in batched
    # device dispatches per (N, M) shape group (metrics.eval_batch) — at
    # reference scale (2,467 clouds) per-file dispatches pay a tunnel round
    # trip apiece. Files carrying their own normals take the per-file path
    # (reference eval.py:59-60 honors file normals).
    pending: list[dict] = []
    for f, name in zip(files, filenames):
        comp_s = os.path.join(args.compressed_path, name + ".s.bin")
        comp_p = os.path.join(args.compressed_path, name + ".p.bin")
        comp_c = os.path.join(args.compressed_path, name + ".c.bin")
        comp_a = os.path.join(args.compressed_path, name + ".a.bin")
        decomp = os.path.join(args.decompressed_path, name + ".bin.ply")
        if not os.path.exists(decomp):
            continue
        input_pc, input_normals = read_point_cloud_normals(f)
        decomp_pc = read_point_cloud(decomp)
        pending.append({
            "f": f, "name": name, "in": input_pc, "out": decomp_pc,
            "normals": input_normals,
            "bytes": sum(os.path.getsize(p) for p in (comp_s, comp_p, comp_c)),
            "a": comp_a if os.path.exists(comp_a) else None,
        })

    # batched geometry metrics per shape group (no file normals)
    by_shape: dict[tuple, list[int]] = {}
    for i, item in enumerate(pending):
        if item["normals"] is None:
            by_shape.setdefault(
                (item["in"].shape[0], item["out"].shape[0]), []).append(i)
    for idxs in by_shape.values():
        origs = np.stack([pending[i]["in"] for i in idxs])
        recons = np.stack([pending[i]["out"] for i in idxs])
        for i, m in zip(idxs, eval_batch(origs, recons)):
            pending[i]["metrics"] = m

    for item in pending:
        input_pc, decomp_pc = item["in"], item["out"]
        n_in, n_out = input_pc.shape[0], decomp_pc.shape[0]
        if "metrics" in item:
            m = item["metrics"]
            d1, d2, uc, ch = (m["p2point_psnr"], m["p2plane_psnr"],
                              m["uc"], m["chamfer"])
        else:  # file-borne normals: per-file path
            psnr = compute_p2point_p2plane_psnr(input_pc, decomp_pc,
                                                normals=item["normals"])
            d1, d2 = psnr["p2point_psnr"], psnr["p2plane_psnr"]
            uc = calc_uc(input_pc, decomp_pc)
            ch = normalized_chamfer(input_pc, decomp_pc)

        rows["filename"].append(item["name"])
        rows["p2pointPSNR"].append(round(d1, 3))
        rows["p2planePSNR"].append(round(d2, 3))
        rows["chamfer_distance"].append(ch)
        rows["n_points_input"].append(n_in)
        rows["n_points_output"].append(n_out)
        rows["bpp"].append(compute_bitrate(item["bytes"], n_in))
        rows["uniformity coefficient"].append(round(uc, 3))

        if item["a"] is not None:
            in_pc_a, in_rgb = read_point_cloud_attr(item["f"])
            out_pc_a, out_rgb = read_point_cloud_attr(
                os.path.join(args.decompressed_path, item["name"] + ".bin.ply"))
            if in_rgb is not None and out_rgb is not None:
                attr_rows["color_psnr"].append(round(compute_color_psnr(
                    in_pc_a, in_rgb, out_pc_a, out_rgb), 3))
            else:
                attr_rows["color_psnr"].append(float("nan"))
            attr_rows["attr_bpp"].append(
                compute_bitrate(os.path.getsize(item["a"]), n_in))
        else:
            attr_rows["color_psnr"].append(float("nan"))
            attr_rows["attr_bpp"].append(float("nan"))

    if not np.all(np.isnan(attr_rows["attr_bpp"])):
        rows.update(attr_rows)

    if rows["filename"]:
        extra = ""
        if "color_psnr" in rows:
            extra = (
                f" | color PSNR: {round(float(np.nanmean(rows['color_psnr'])), 3)}"
                f" | attr bpp: {round(float(np.nanmean(rows['attr_bpp'])), 3)}"
            )
        print(
            f"Done! The average p2pointPSNR: {round(float(np.mean(rows['p2pointPSNR'])), 3)} | "
            f"p2plane PSNR: {round(float(np.mean(rows['p2planePSNR'])), 3)} | "
            f"chamfer distance: {round(float(np.mean(rows['chamfer_distance'])), 8)} | "
            f"bpp: {round(float(np.mean(rows['bpp'])), 3)} | "
            f"uc: {round(float(np.mean(rows['uniformity coefficient'])), 3)}"
            + extra
        )
    else:
        print("Done! No input/decompressed file pairs matched — nothing to average.")

    os.makedirs(os.path.dirname(args.output_file) or ".", exist_ok=True)
    pd.DataFrame(rows).to_csv(args.output_file)
    print(f"Evaluation results saved to {args.output_file}")


if __name__ == "__main__":
    main()
