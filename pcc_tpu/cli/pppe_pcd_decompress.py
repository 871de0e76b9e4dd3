"""PPPE fast decompression (reference pppe_pcd_decompress.py CLI).

Replicated quirk (SURVEY.md §7): the reference maps the loaded latent
through the IPDAE-style sigmoid spread, computes its rounding, then feeds
the UNROUNDED sigmoid-spread value to the decoder
(pppe_pcd_decompress.py:42-48). That transform belongs to the IPDAE
quantizer, not to PointCloudAE — whose training decoder only ever sees its
own `quantize_st` output, integer bins in [0, latent_bins-1]
(pppe_pcd_ae.py:719-735,869-876) — so the reference decode is out of
distribution for every checkpoint its own trainer produces. (The reference
CLI cannot demonstrate this: it crashes at startup — pppe_pcd_compress.py:77
passes an `L=` kwarg PointCloudAE.__init__ does not accept, and
pppe_pcd_decompress.py:59 builds latent_dim=64 against train's 256.)

Default replicates the reference source's sigmoid-spread behavior for
parity; --use_quantized instead applies the model's own quantizer
(round(clamp(latent, q_min, q_max)), exactly the training-time path) and is
what the committed PPPE golden artifact uses — see eval/GOLDEN.md.

Entropy-coded streams (written by `pppe_pcd_compress --entropy_coding`) are
auto-detected by magic; their decoded symbols are already the quantize_st
forward values and always take the training-consistent path.
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
                   help="Feed the model's own quantized latent "
                        "(round(clamp(latent, q_min, q_max)), the training-"
                        "time path) to the decoder instead of the "
                        "reference's vestigial sigmoid-spread transform.")
    p.add_argument("--seed", type=int, default=DEFAULT_SEED)
    p.add_argument("--batch_size", type=int, default=32,
                   help="Latents per device dispatch (extension; the "
                        "reference decodes one at a time, "
                        "pppe_pcd_decompress.py:55-66). Outputs are "
                        "identical per file.")
    return p


def load_binary(in_path: str) -> np.ndarray:
    with open(in_path, "rb") as f:
        n = struct.unpack("<I", f.read(4))[0]
        arr = np.fromfile(f, dtype="<f4")
    return arr.astype(np.float32).reshape(1, n)


def load_binary_any(in_path: str):
    """Returns (latent [1, d], is_quantized). Dispatches on the entropy-
    coded magic (cli/pppe_pcd_compress.py::save_binary_entropy layout);
    otherwise reads the reference's raw float32 contract."""
    from pcc_tpu.cli.pppe_pcd_compress import ENTROPY_MAGIC
    from pcc_tpu.coding.rangecoder import decode_float_cdf

    with open(in_path, "rb") as f:
        magic = struct.unpack("<I", f.read(4))[0]
        if magic != ENTROPY_MAGIC:
            return load_binary(in_path), False
        d, L, _ = struct.unpack("<HBB", f.read(4))
        counts = np.fromfile(f, dtype="<u4", count=L).astype(np.uint64)
        nbytes = struct.unpack("<I", f.read(4))[0]
        payload = f.read(nbytes)
    pmf = counts / counts.sum()
    cdf = np.concatenate([[0.0], np.cumsum(pmf)])
    sym = decode_float_cdf(np.tile(cdf, (d, 1)), payload)
    return sym.astype(np.float32)[None, :], True


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_jax()
    import jax
    import jax.numpy as jnp

    cfg = PPPEConfig(N=args.N, latent_dim=args.K, L=args.L)
    model, variables = load_pppe_model(args, cfg)

    import functools

    # The latent->z transform rides inside the jitted program (the same
    # elementwise arithmetic as the old per-file dispatch), and latents
    # batch --batch_size per dispatch — the axon tunnel charges ~30 ms
    # per round trip, so the old file-at-a-time loop was latency-bound.
    @functools.partial(jax.jit, static_argnums=(2,))
    def decode_batch(v, latents, mode):
        if mode == "quantized":
            # entropy-coded stream: symbols ARE the quantize_st forward
            # values; feed them straight to the decoder (training path)
            z = latents
        elif mode == "round":
            # the training-time path: PointCloudAE.quantize_st's forward
            # (clamp to [q_min, q_max] = [0, latent_bins-1], round), with
            # latent_bins = L as in make_pppe_model
            z = jnp.round(jnp.clip(latents, 0.0, args.L - 1.0))
        else:
            # reference source behavior: sigmoid spread computed, rounding
            # discarded, unrounded value decoded
            # (pppe_pcd_decompress.py:42-48)
            spread = args.L - 0.2
            z = jax.nn.sigmoid(latents) * spread - spread / 2
        return model.apply(
            v, z, method=lambda m, latent: m.decoder(latent))[1]

    files = sorted(glob(args.input_glob, recursive=True))
    print(f"Found {len(files)} compressed files.")
    B = max(1, args.batch_size)

    def write_one(f, fine_row):
        out = rel_output_path(f, args.input_glob, args.decompressed_path, "")
        out_dir, name = os.path.split(out)
        base = name[:-len(".bin")] if name.endswith(".bin") else name
        save_point_cloud(fine_row, base + ".bin.ply", path=out_dir or ".")

    def flush(chunk, fine_dev):
        fine = np.asarray(fine_dev)               # one fetch per batch
        for i, f in enumerate(chunk):
            write_one(f, fine[i])

    # streams are bucketed by (transform mode, latent width) so one
    # compiled program serves each homogeneous run; mixed inputs simply
    # fill several buckets
    buckets, pending = {}, []
    def dispatch(key, items):
        mode, _ = key
        chunk = [f for f, _ in items]
        lats = [r[0] for _, r in items]
        if len(lats) < B:                          # pad the tail batch so
            lats += [lats[-1]] * (B - len(lats))   # one program serves all
        fine_dev = decode_batch(variables, jnp.asarray(np.stack(lats)), mode)
        pending.append((chunk, fine_dev))
        if len(pending) > 2:                       # 2-deep fetch pipeline
            flush(*pending.pop(0))

    for f in files:
        raw, is_quantized = load_binary_any(f)
        mode = ("quantized" if is_quantized
                else "round" if args.use_quantized else "sigmoid")
        key = (mode, raw.shape[-1])
        buckets.setdefault(key, []).append((f, raw))
        if len(buckets[key]) == B:
            dispatch(key, buckets.pop(key))
    for key, items in buckets.items():
        dispatch(key, items)
    for item in pending:
        flush(*item)


if __name__ == "__main__":
    main()
