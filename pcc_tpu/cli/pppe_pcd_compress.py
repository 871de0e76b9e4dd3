"""PPPE fast compression (reference pppe_pcd_compress.py CLI).

Same on-disk contract by default: per cloud, a `.bin` holding a uint32 row
count followed by raw float32 latents — the reference applies NO
quantization or entropy coding at write time (pppe_pcd_compress.py:36-41,
55-66), and the output directory mirrors the input tree
(pppe_pcd_compress.py:90-93).

`--entropy_coding` (extension, no reference counterpart) instead writes a
self-contained coded stream: the latent is quantized with the model's own
`quantize_st` forward (round(clamp(latent, 0, L-1)) — exactly what the
training decoder consumed, models/pppe.py:209-217), its histogram is
transmitted in the header, and the symbols are range-coded under that
histogram PMF. Same distortion as `pppe_pcd_decompress --use_quantized` at
~10x less rate than the raw-float contract (see eval/GOLDEN.md). The
reference's *conditional* PMF cannot be used here: it conditions on
encoder-side features that are never transmitted (pppe_pcd_ae.py:882-917),
so its estimated rate was never decodable — the histogram PMF is.
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
    p.add_argument("--entropy_coding", action="store_true",
                   help="Write quantized+range-coded latents (histogram PMF "
                        "in the header) instead of the reference's raw "
                        "float32 contract. Self-contained; ~10x less rate at "
                        "identical --use_quantized distortion.")
    p.add_argument("--seed", type=int, default=DEFAULT_SEED)
    p.add_argument("--batch_size", type=int, default=32,
                   help="Clouds per device dispatch (extension; the "
                        "reference encodes one at a time, "
                        "pppe_pcd_compress.py:55-66). Outputs are "
                        "identical per file.")
    return p


# magic for the entropy-coded stream variant; cannot collide with the raw
# contract, whose first 4 bytes are the latent count (a small uint32)
ENTROPY_MAGIC = 0x45505045  # "EPPE"


def save_binary(latent: np.ndarray, out_path: str) -> None:
    """uint32 count header + float32 payload (pppe_pcd_compress.py:36-41)."""
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    arr = np.asarray(latent, dtype="<f4")
    with open(out_path, "wb") as f:
        f.write(struct.pack("<I", arr.shape[0]))
        arr.tofile(f)


def save_binary_entropy(latent: np.ndarray, L: int, out_path: str) -> None:
    """Quantize with the model's own quantize_st forward and range-code.

    Layout: uint32 magic | uint16 d | uint8 L | uint8 pad | uint32 counts[L]
    | uint32 nbytes | payload. The decoder rebuilds the identical histogram
    PMF from the integer counts, so the stream is self-contained.
    """
    from pcc_tpu.coding.rangecoder import encode_float_cdf

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    lat = np.asarray(latent, dtype=np.float32).reshape(-1)
    # the header carries the latent length as uint16 and L as uint8 —
    # validate up front so out-of-range configs fail with a clear message
    # instead of a struct.error at write time
    if lat.shape[0] >= 1 << 16:
        raise ValueError(
            f"entropy stream header caps latent length at 65535 "
            f"(got {lat.shape[0]}); use the raw float format for larger d")
    if L >= 256:
        raise ValueError(f"entropy stream header caps L at 255 (got {L})")
    sym = np.clip(np.round(lat), 0, L - 1).astype(np.int16)
    counts = np.bincount(sym, minlength=L).astype("<u4")
    pmf = counts / counts.sum()
    cdf = np.concatenate([[0.0], np.cumsum(pmf)])          # [L+1]
    payload = encode_float_cdf(np.tile(cdf, (sym.shape[0], 1)), sym)
    # explicit little-endian so the on-disk contract is byte-order portable
    with open(out_path, "wb") as f:
        f.write(struct.pack("<IHBB", ENTROPY_MAGIC, lat.shape[0], L, 0))
        counts.tofile(f)
        f.write(struct.pack("<I", len(payload)))
        f.write(payload)


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
    # fused Pallas SA stages for the deep encoder stages (inference path;
    # models/pppe.py::PointNetSetAbstractionKNN.fused — falls back to XLA
    # off-TPU, streams byte-equal either way)
    model = make_pppe_model(cfg, fused=True)
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

    import functools

    # normalize rides INSIDE the jitted program (vmapped per cloud — the
    # same per-cloud arithmetic as before) and clouds batch --batch_size
    # per dispatch: the axon tunnel charges ~30 ms per dispatch/fetch
    # round trip, so the old cloud-at-a-time loop was latency-bound, not
    # compute-bound. Latents are written per file exactly as before.
    @jax.jit
    def encode(v, x):
        pc01 = jax.vmap(functools.partial(normalize, margin=cfg.margin))(
            x)[0]
        return model.apply(
            v, pc01, method=lambda m, pc, train=False: m.encoder(pc, train)
        )[0]

    files = sorted(glob(args.input_glob, recursive=True))
    print(f"Found {len(files)} point clouds.")
    B = max(1, args.batch_size)

    def flush(chunk, lat_dev):
        lat = np.asarray(lat_dev)                  # one fetch per batch
        for i, f in enumerate(chunk):
            out = rel_output_path(f, args.input_glob,
                                  args.compressed_path, ".bin")
            if args.entropy_coding:
                save_binary_entropy(lat[i], args.L, out)
            else:
                save_binary(lat[i], out)

    pending = []                                   # 2-deep pipeline: the
    for lo in range(0, len(files), B):             # next batch's upload +
        chunk = files[lo:lo + B]                   # dispatch overlaps the
        pcs = [read_point_cloud(f) for f in chunk]   # previous fetch
        if len(pcs) < B:                           # pad the tail batch so
            pcs += [pcs[-1]] * (B - len(pcs))      # one program serves all
        lat_dev = encode(variables, jnp.asarray(np.stack(pcs)))
        pending.append((chunk, lat_dev))
        if len(pending) > 2:
            flush(*pending.pop(0))
    for item in pending:
        flush(*item)


if __name__ == "__main__":
    main()
