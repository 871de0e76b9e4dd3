"""Sample the ShapeNet part benchmark into .ply clouds
(reference sample_shapenet.py CLI).

Reads the shapenetcore_partanno_segmentation_benchmark_v0_normal layout
(synsetoffset2category.txt + train_test_split jsons + per-class point txts,
sample_shapenet.py:28-75), picks n_point random points per cloud, shifts by
+0.5, and writes {i}.ply to dest/test. The reference imports a `pc_io`
module that does not exist in its repo (sample_shapenet.py:19) — our PLY
writer fills that hole (SURVEY.md §7).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from pcc_tpu.io import save_point_cloud


def load_split_ids(root: str, split: str) -> set[str]:
    names = {
        "train": ["shuffled_train_file_list.json"],
        "val": ["shuffled_val_file_list.json"],
        "test": ["shuffled_test_file_list.json"],
        "trainval": ["shuffled_train_file_list.json", "shuffled_val_file_list.json"],
    }[split]
    ids: set[str] = set()
    for n in names:
        with open(os.path.join(root, "train_test_split", n)) as f:
            ids |= {str(d.split("/")[2]) for d in json.load(f)}
    return ids


def iter_split_files(root: str, split: str):
    """Yield point-txt paths of the split across all categories, in the
    category order of synsetoffset2category.txt (sample_shapenet.py:36-66)."""
    with open(os.path.join(root, "synsetoffset2category.txt")) as f:
        cat = dict(line.strip().split() for line in f if line.strip())
    ids = load_split_ids(root, split)
    for item in cat:
        dir_point = os.path.join(root, cat[item])
        for fn in sorted(os.listdir(dir_point)):
            token = os.path.splitext(fn)[0]
            if token in ids:
                yield os.path.join(dir_point, fn)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Sample ShapeNet part clouds into .ply files",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument(
        "--source",
        default="./data/shapenetcore_partanno_segmentation_benchmark_v0_normal")
    parser.add_argument("--dest", default="./data/ShapeNet_pc_2048p")
    parser.add_argument("--n_point", type=int, default=2048)
    parser.add_argument("--split", default="test",
                        choices=["train", "val", "test", "trainval"])
    parser.add_argument("--seed", type=int, default=11)
    args = parser.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    out_dir = os.path.join(args.dest, args.split)
    os.makedirs(out_dir, exist_ok=True)

    count = 0
    for i, path in enumerate(iter_split_files(args.source, args.split)):
        data = np.loadtxt(path).astype(np.float32)
        pts = data[:, :3]
        choice = rng.choice(len(pts), args.n_point, replace=True)
        pc = pts[choice] + 0.5  # unit-cube shift (sample_shapenet.py:162)
        save_point_cloud(pc, f"{i}.ply", path=out_dir)
        count += 1
    print(f"Saved {count} clouds to {out_dir}")


if __name__ == "__main__":
    main()
