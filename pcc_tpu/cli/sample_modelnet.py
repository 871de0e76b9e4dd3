"""Sample ModelNet .off meshes to point-cloud .ply files
(reference sample_modelnet.py CLI).

Pipeline per mesh (sample_modelnet.py:30-60): area-weighted random surface
sampling of n_point points, min-max normalize to [0, 1], drop duplicate
points, write .ply preserving the class/split directory layout. The OFF
parser and mesh sampler are numpy-only (the reference used PyntCloud's
mesh_random sampler).
"""

from __future__ import annotations

import argparse
import logging
import os
from glob import glob

import numpy as np

from pcc_tpu.io import save_point_cloud

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(levelname)s %(message)s")
logger = logging.getLogger(__name__)


def read_off(path: str):
    """OFF mesh -> (vertices [V, 3] float64, faces [F, 3] int). Handles the
    'OFF' header glued to the counts line (a common ModelNet quirk)."""
    with open(path) as f:
        tokens: list[str] = []
        for line in f:
            line = line.split("#")[0].strip()
            if line:
                tokens.extend(line.split())
    if tokens[0].startswith("OFF"):
        rest = tokens[0][3:]
        tokens = ([rest] if rest else []) + tokens[1:]
    nv, nf = int(tokens[0]), int(tokens[1])
    ptr = 3
    verts = np.array(tokens[ptr : ptr + 3 * nv], dtype=np.float64).reshape(nv, 3)
    ptr += 3 * nv
    faces = []
    for _ in range(nf):
        k = int(tokens[ptr])
        poly = [int(t) for t in tokens[ptr + 1 : ptr + 1 + k]]
        ptr += 1 + k
        for i in range(1, k - 1):  # fan-triangulate
            faces.append((poly[0], poly[i], poly[i + 1]))
    return verts, np.array(faces, dtype=np.int64)


def sample_mesh(verts: np.ndarray, faces: np.ndarray, n_point: int,
                rng: np.random.Generator) -> np.ndarray:
    """Area-weighted uniform surface sampling -> [n_point, 3]."""
    a = verts[faces[:, 0]]
    b = verts[faces[:, 1]]
    c = verts[faces[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    total = areas.sum()
    if total <= 0:
        raise ValueError("degenerate mesh: zero surface area")
    face_idx = rng.choice(len(faces), size=n_point, p=areas / total)
    u = rng.random((n_point, 1))
    v = rng.random((n_point, 1))
    flip = (u + v) > 1.0
    u = np.where(flip, 1.0 - u, u)
    v = np.where(flip, 1.0 - v, v)
    return a[face_idx] + u * (b[face_idx] - a[face_idx]) + v * (c[face_idx] - a[face_idx])


def process_mesh(src: str, dst_dir: str, n_point: int, rng) -> bool:
    verts, faces = read_off(src)
    pts = sample_mesh(verts, faces, n_point, rng)
    # min-max normalize to the unit cube (sample_modelnet.py:46-50)
    lo, hi = pts.min(), pts.max()
    pts = (pts - lo) / (hi - lo)
    pts = np.unique(pts.astype(np.float32), axis=0)
    name = os.path.splitext(os.path.basename(src))[0] + ".ply"
    save_point_cloud(pts, name, path=dst_dir)
    return True


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Sample ModelNet meshes into point cloud .ply files",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("source", help="ModelNet40 root (class/{train,test}/*.off).")
    parser.add_argument("dest", help="Output root for sampled .ply files.")
    parser.add_argument("--n_point", type=int, default=8192,
                        help="Points sampled per mesh.")
    parser.add_argument("--seed", type=int, default=11)
    args = parser.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    files = sorted(glob(os.path.join(args.source, "**", "*.off"), recursive=True))
    logger.info("found %d meshes", len(files))
    ok = bad = 0
    for src in files:
        rel_dir = os.path.dirname(os.path.relpath(src, args.source))
        try:
            process_mesh(src, os.path.join(args.dest, rel_dir), args.n_point, rng)
            ok += 1
        except Exception as e:  # per-file resilience (sample_modelnet.py:59-60)
            logger.warning("skipping %s: %s", src, e)
            bad += 1
    logger.info("done: %d sampled, %d skipped", ok, bad)


if __name__ == "__main__":
    main()
