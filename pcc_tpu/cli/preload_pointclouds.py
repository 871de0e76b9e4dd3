"""Preload .ply clouds into one .npy for fast training startup
(reference preload_pointclouds.py CLI)."""

from __future__ import annotations

import argparse
from glob import glob

import numpy as np

from pcc_tpu.io import read_point_clouds


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Preload point cloud data and save as .npy for fast access")
    parser.add_argument("--train_glob", help="Glob pattern for point cloud files",
                        default="./data/ModelNet40_pc_01_8192p/**/train/*.ply")
    parser.add_argument("--output_npy", help="Path to save the .npy file",
                        default="./data/ModelNet40_pc_01_8192p/train.npy")
    args = parser.parse_args(argv)

    files = sorted(glob(args.train_glob, recursive=True))
    print(f"Found {len(files)} files")
    points = read_point_clouds(files)
    print(f"Loaded points shape: {points.shape}")
    np.save(args.output_npy, points)
    print(f"Saved to {args.output_npy}")


if __name__ == "__main__":
    main()
