"""Preload .ply clouds into one .npy for fast training startup
(reference preload_pointclouds.py CLI)."""

from __future__ import annotations

import argparse
from glob import glob

import numpy as np

from pcc_tpu.io import read_point_clouds


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Bundle a directory of .ply clouds into a single .npy "
                    "array so training skips per-file parsing")
    parser.add_argument("--train_glob",
                        help="Recursive glob matching the input .ply files",
                        default="./data/ModelNet40_pc_01_8192p/**/train/*.ply")
    parser.add_argument("--output_npy",
                        help="Destination .npy file for the stacked clouds",
                        default="./data/ModelNet40_pc_01_8192p/train.npy")
    args = parser.parse_args(argv)

    files = sorted(glob(args.train_glob, recursive=True))
    print(f"{len(files)} .ply files match {args.train_glob}")
    points = read_point_clouds(files)
    print(f"stacked array: {points.shape} ({points.nbytes / 1e6:.1f} MB)")
    np.save(args.output_npy, points)
    print(f"wrote {args.output_npy}")


if __name__ == "__main__":
    main()
