"""PPPE fast decompression (reference pppe_pcd_decompress.py CLI).

Replicated quirk (SURVEY.md §7): the reference computes the sigmoid-spread
quantized latent but feeds the UNQUANTIZED latent to the decoder
(pppe_pcd_decompress.py:42-48). That defines observable behavior, so it is
the default here; --use_quantized applies the quantized latent instead.
"""

from __future__ import annotations

import argparse
import os
import struct
from glob import glob

import numpy as np

from pcc_tpu.cli._common import setup_jax
from pcc_tpu.cli.pppe_pcd_compress import load_pppe_model, rel_output_path
from pcc_tpu.config import DEFAULT_SEED, PPPEConfig
from pcc_tpu.io import save_point_cloud


def build_parser():
    p = argparse.ArgumentParser(
        description="Batch Point Cloud Decompression",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("input_glob", help="Compressed .bin files glob pattern.")
    p.add_argument("decompressed_path", help="Output folder for decompressed .ply files.")
    p.add_argument("model_load_folder", help="Directory where to load trained models.")
    p.add_argument("--N", type=int, default=8192, help="Number of points for the model.")
    p.add_argument("--K", type=int, default=256, help="Latent space dimension.")
    p.add_argument("--L", type=int, default=7, help="Quantization level.")
    p.add_argument("--best", action="store_true")
    p.add_argument("--use_quantized", action="store_true",
                   help="Feed the quantized latent to the decoder (fixes the "
                        "reference's unquantized-decode quirk).")
    p.add_argument("--seed", type=int, default=DEFAULT_SEED)
    return p


def load_binary(in_path: str) -> np.ndarray:
    with open(in_path, "rb") as f:
        n = struct.unpack("I", f.read(4))[0]
        arr = np.fromfile(f, dtype=np.float32)
    return arr.reshape(1, n)


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_jax()
    import jax
    import jax.numpy as jnp

    cfg = PPPEConfig(N=args.N, latent_dim=args.K, L=args.L)
    model, variables = load_pppe_model(args, cfg)

    decode = jax.jit(lambda v, z: model.apply(
        v, z, method=lambda m, latent: m.decoder(latent)))

    files = sorted(glob(args.input_glob, recursive=True))
    print(f"Found {len(files)} compressed files.")
    for f in files:
        latent = jnp.asarray(load_binary(f))
        spread = args.L - 0.2
        latent_q = jnp.round(jax.nn.sigmoid(latent) * spread - spread / 2)
        z = latent_q if args.use_quantized else latent
        _, fine = decode(variables, z)
        out = rel_output_path(f, args.input_glob, args.decompressed_path, "")
        out_dir, name = os.path.split(out)
        base = name[:-len(".bin")] if name.endswith(".bin") else name
        save_point_cloud(np.asarray(fine)[0], base + ".bin.ply",
                         path=out_dir or ".")


if __name__ == "__main__":
    main()
