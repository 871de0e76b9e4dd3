"""PPPE fast compression (reference pppe_pcd_compress.py CLI).

Same on-disk contract: per cloud, a `.bin` holding a uint32 row count
followed by raw float32 latents — the reference applies NO quantization or
entropy coding at write time (pppe_pcd_compress.py:36-41,55-66), and the
output directory mirrors the input tree (pppe_pcd_compress.py:90-93).
"""

from __future__ import annotations

import argparse
import os
import struct
from glob import glob

import numpy as np

from pcc_tpu.cli._common import setup_jax
from pcc_tpu.config import DEFAULT_SEED, PPPEConfig
from pcc_tpu.io import read_point_cloud
from pcc_tpu.ops.normalize import normalize


def build_parser():
    p = argparse.ArgumentParser(
        description="Batch Point Cloud Compression",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("input_glob", help="Point clouds glob pattern for compression.")
    p.add_argument("compressed_path", help="Compressed .bin files folder.")
    p.add_argument("model_load_folder", help="Directory where to load trained models.")
    p.add_argument("--N", type=int, default=8192, help="Number of points for the model.")
    p.add_argument("--K", type=int, default=256, help="Latent space dimension.")
    p.add_argument("--L", type=int, default=7, help="Quantization level.")
    p.add_argument("--best", action="store_true")
    p.add_argument("--seed", type=int, default=DEFAULT_SEED)
    return p


def save_binary(latent: np.ndarray, out_path: str) -> None:
    """uint32 count header + float32 payload (pppe_pcd_compress.py:36-41)."""
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    arr = np.asarray(latent, dtype=np.float32)
    with open(out_path, "wb") as f:
        f.write(struct.pack("I", arr.shape[0]))
        arr.tofile(f)


def rel_output_path(ply_path: str, input_glob: str, out_root: str, ext: str) -> str:
    """Mirror the input directory tree under the output root
    (pppe_pcd_compress.py:90-93)."""
    base = input_glob.split("**")[0].split("*")[0]
    base = os.path.dirname(base) if not os.path.isdir(base) else base
    rel = os.path.relpath(ply_path, start=base or ".")
    return os.path.join(out_root, rel).replace(".ply", ext)


def load_pppe_model(args, cfg: PPPEConfig):
    import jax
    import jax.numpy as jnp

    from pcc_tpu.train.checkpoint import load_pppe_checkpoint
    from pcc_tpu.train.steps_pppe import (
        create_pppe_state, make_pppe_model, make_pppe_optimizer)

    tx = make_pppe_optimizer(1e-4)
    state = create_pppe_state(jax.random.key(args.seed), cfg, tx)
    state, _ = load_pppe_checkpoint(args.model_load_folder, state,
                                    best=args.best)
    model = make_pppe_model(cfg)
    variables = {"params": state.params["ae"],
                 "batch_stats": state.batch_stats["ae"]}
    return model, variables


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_jax()
    import jax
    import jax.numpy as jnp

    cfg = PPPEConfig(N=args.N, latent_dim=args.K, L=args.L)
    model, variables = load_pppe_model(args, cfg)

    encode = jax.jit(lambda v, x: model.apply(
        v, x, method=lambda m, pc, train=False: m.encoder(pc, train)))

    files = sorted(glob(args.input_glob, recursive=True))
    print(f"Found {len(files)} point clouds.")
    for f in files:
        pc = read_point_cloud(f)
        pc01, _, _ = normalize(jnp.asarray(pc), margin=cfg.margin)
        latent, _ = encode(variables, pc01[None])
        out = rel_output_path(f, args.input_glob, args.compressed_path, ".bin")
        save_binary(np.asarray(latent)[0], out)


if __name__ == "__main__":
    main()
