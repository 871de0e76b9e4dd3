"""Compress point clouds with a trained model (reference compress.py CLI).

Same positional arguments, flags, and on-disk outputs
({name}.p.bin/.s.bin/.c.bin, compress.py:139-152). The per-cloud pipeline
runs as one jitted program over all S patches — the reference feeds patches
through the encoder one at a time in Python (compress.py:112-122).
"""

from __future__ import annotations

import argparse
import os
import time
from glob import glob

import jax
import numpy as np

from pcc_tpu.codec import Codec, init_params
from pcc_tpu.config import CodecConfig, DEFAULT_SEED
from pcc_tpu.io import read_point_cloud
from pcc_tpu.train.checkpoint import load_inference_params


def build_parser():
    p = argparse.ArgumentParser(
        prog="compress.py",
        description="Compress Point Clouds Using Trained Model.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("input_glob", help="Point clouds glob pattern for compression.")
    p.add_argument("compressed_path", help="Compressed .bin files folder.")
    p.add_argument("model_load_folder", help="Directory where to load trained models.")
    p.add_argument("--N0", type=int, default=1024, help="Scale Transformation constant.")
    p.add_argument("--ALPHA", type=int, default=2, help="The factor of patch coverage ratio.")
    p.add_argument("--K", type=int, default=256, help="Number of points in each patch.")
    p.add_argument("--d", type=int, default=16, help="Bottleneck size.")
    p.add_argument("--L", type=int, default=7, help="Quantization Level.")
    p.add_argument("--seed", type=int, default=DEFAULT_SEED)
    return p


def load_codec(model_load_folder: str, cfg: CodecConfig, seed: int) -> Codec:
    ae_params, prob_params = load_inference_params(model_load_folder)
    if ae_params is None:
        print(f"WARNING: no ae.pkl/prob.pkl in {model_load_folder}; "
              "using randomly initialized weights.")
        ae_params, prob_params = init_params(jax.random.key(seed), cfg)
    return Codec(cfg, ae_params, prob_params)


def main(argv=None):
    args = build_parser().parse_args(argv)
    print(f"Processing on device: {jax.devices()[0]}")

    cfg = CodecConfig(N0=args.N0, ALPHA=args.ALPHA, K=args.K, d=args.d, L=args.L)
    os.makedirs(args.compressed_path, exist_ok=True)

    files = sorted(glob(args.input_glob, recursive=True))
    if not files:
        raise SystemExit(f"no input files match {args.input_glob}")
    codec = load_codec(args.model_load_folder, cfg, args.seed)

    times = []
    for i, f in enumerate(files):
        pc = read_point_cloud(f)
        start = time.time()
        p_bytes, s_bytes, c_bytes = codec.compress(pc)
        times.append(time.time() - start)
        name = os.path.split(f)[1]
        with open(os.path.join(args.compressed_path, name + ".p.bin"), "wb") as fo:
            fo.write(p_bytes)
        with open(os.path.join(args.compressed_path, name + ".s.bin"), "wb") as fo:
            fo.write(s_bytes)
        with open(os.path.join(args.compressed_path, name + ".c.bin"), "wb") as fo:
            fo.write(c_bytes)

    # First call includes XLA compilation; report the steady-state mean like
    # the reference's per-cloud wall time (compress.py:154-158).
    steady = times[1:] if len(times) > 1 else times
    print(f"Done! Execution time: {round(float(np.mean(steady)), 5)}s per point cloud.")


if __name__ == "__main__":
    main()
