"""Convert S3DIS room .txt scans to .ply (reference sample_stanford3d.py CLI)."""

from __future__ import annotations

import argparse
import os
from glob import glob

import numpy as np

from pcc_tpu.io import save_point_cloud


def main(argv=None):
    parser = argparse.ArgumentParser("Stanford3d Sampler")
    parser.add_argument("--source", help="source glob of room .txt files",
                        default="./Stanford3dDataset_v1.2_Aligned_Version/Area_1/*/*.txt")
    parser.add_argument("--dest", help="destination directory",
                        default="./data/S3DIS-Area1_pc/Area_1")
    args = parser.parse_args(argv)

    os.makedirs(args.dest, exist_ok=True)
    files = sorted(glob(args.source))
    print(f"found {len(files)} rooms")
    for f in files:
        name = os.path.splitext(os.path.split(f)[1])[0]
        pc = np.loadtxt(f)[:, :3]  # xyz columns only (sample_stanford3d.py:29)
        save_point_cloud(pc, name + ".ply", path=args.dest)
        print(name, pc.shape)


if __name__ == "__main__":
    main()
