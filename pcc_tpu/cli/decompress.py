"""Decompress .p/.s/.c.bin streams to .ply (reference decompress.py CLI).

Output files are named {name}.bin.ply — the name eval.py expects
(eval.py:172); the reference writes {name} and leaves the compatible writer
commented out (decompress.py:121-122), which this fixes deliberately.
"""

from __future__ import annotations

import argparse
import os
import time
from glob import glob


from pcc_tpu.cli._common import setup_jax
from pcc_tpu.cli.compress import load_codec
from pcc_tpu.config import CodecConfig, DEFAULT_SEED
from pcc_tpu.io import save_point_cloud


def build_parser():
    p = argparse.ArgumentParser(
        prog="decompress.py",
        description="Decompress Point Clouds Using Trained Model.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("compressed_path", help="Compressed .bin files folder.")
    p.add_argument("decompressed_path", help="Decompressed .ply files folder.")
    p.add_argument("model_load_folder", help="Directory where to load trained models.")
    p.add_argument("--N0", type=int, default=1024, help="Scale Transformation constant.")
    p.add_argument("--ALPHA", type=int, default=2, help="The factor of patch coverage ratio.")
    p.add_argument("--K", type=int, default=256, help="Number of points in each patch.")
    p.add_argument("--d", type=int, default=16, help="Bottleneck size.")
    p.add_argument("--L", type=int, default=7, help="Quantization Level.")
    p.add_argument("--model", default="AE",
                   help="Type of the model (AE or PPPF-AE); must match the "
                        "compress-side setting.")
    p.add_argument("--seed", type=int, default=DEFAULT_SEED)
    p.add_argument("--batch_size", type=int, default=None,
                   help="Clouds per device dispatch. Default 64 (IPDAE); 16 "
                        "for PPPF-AE (see compress --help).")
    p.add_argument("--profile_dir", default=None,
                   help="Write a jax.profiler trace of the decompress run here.")
    p.add_argument("--d_a", type=int, default=16,
                   help="Attribute bottleneck size (with --attributes).")
    p.add_argument("--attributes", action="store_true",
                   help="Decode {name}.a.bin RGB streams into colored .ply "
                        "outputs (extension; the reference codes geometry only).")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 mixed-precision network compute (must match the "
                        "compress-side setting so the CDF program is identical).")
    from pcc_tpu.cli._common import add_devices_flag
    add_devices_flag(p)
    p.add_argument("--format", default="native", choices=["native", "torchac"],
                   help="Latent-stream format of the .p.bin inputs. "
                        "'native': this framework's range-coded format "
                        "(integer-deterministic CDFs). 'torchac': decode "
                        "reference-produced archives (torchac arithmetic "
                        "streams, reference compress.py:136) — use with "
                        "weights imported via import_torch_checkpoint so "
                        "the probability model matches the encoder's.")
    return p


def _decompress_torchac(args, cfg, files):
    """Decode reference-written streams: torchac .p.bin + reference-layout
    .s.bin/.c.bin (reference decompress.py:72-122), through this
    framework's device pipeline. Interop path — per-cloud loop, float CDFs
    (the reference's pmf_to_cdf contract, pn_kit.py:452-461)."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pcc_tpu.cli.compress import load_codec
    from pcc_tpu.codec import decode_cloud, make_models
    from pcc_tpu.coding import torchac_compat
    from pcc_tpu.coding.octree_host import (codes_to_points,
                                            parse_octree_bits, unpack_bits)
    from pcc_tpu.coding.pmf import pmf_to_cdf

    codec = load_codec(args.model_load_folder, cfg, args.seed)
    _, prob = make_models(codec.cfg)

    @jax.jit
    def float_cdf(rec):
        return pmf_to_cdf(prob.apply(codec.prob_params, rec[None])[0])

    start = time.time()
    dec_cache = {}
    for f in files:
        name = os.path.split(f)[1][: -len(".s.bin")]
        with open(os.path.join(args.compressed_path, name + ".s.bin"), "rb") as fi:
            codes, depth = parse_octree_bits(unpack_bits(fi.read()))
        rec = codes_to_points(codes, depth)
        S = rec.shape[0]
        cdf = np.asarray(float_cdf(jnp.asarray(rec)))        # [S, d, L+1]
        with open(os.path.join(args.compressed_path, name + ".p.bin"), "rb") as fi:
            sym = torchac_compat.decode_float_cdf(cdf, fi.read())
        with open(os.path.join(args.compressed_path, name + ".c.bin"), "rb") as fi:
            header = np.frombuffer(fi.read(), dtype=np.float32)
        if S not in dec_cache:
            dec_cache[S] = jax.jit(functools.partial(
                decode_cloud, cfg=codec.cfg.with_n(S * codec.cfg.k)))
        dec = dec_cache[S]
        pc = np.asarray(dec(codec.ae_params, jnp.asarray(sym.astype(np.int16)),
                            jnp.asarray(rec), jnp.asarray(header[:3]),
                            jnp.asarray(header[3])))
        save_point_cloud(pc, name + ".bin.ply", path=args.decompressed_path)
    print(f"Done! Execution time: "
          f"{round((time.time()-start) / len(files), 5)}s per point cloud.")


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_jax()
    import jax
    print(f"Processing on device: {jax.devices()[0]}")

    cfg = CodecConfig(N0=args.N0, ALPHA=args.ALPHA, K=args.K, d=args.d, L=args.L,
                      compute_dtype="bfloat16" if args.bf16 else "float32",
                      model=args.model)
    os.makedirs(args.decompressed_path, exist_ok=True)
    if args.batch_size is None:
        args.batch_size = 16 if args.model == "PPPF-AE" else 64

    files = sorted(glob(os.path.join(args.compressed_path, "*.s.bin")))
    if not files:
        raise SystemExit(f"no .s.bin files in {args.compressed_path}")

    if args.attributes:
        return _decompress_with_attributes(args, cfg, files)
    if args.format == "torchac":
        return _decompress_torchac(args, cfg, files)

    from pcc_tpu.cli._common import maybe_mesh
    mesh = maybe_mesh(args.devices)
    if mesh is not None:
        print(f"data-parallel decompression over {args.devices} devices")
        if args.batch_size % args.devices:
            args.batch_size = args.devices * max(
                1, args.batch_size // args.devices)
    codec = load_codec(args.model_load_folder, cfg, args.seed,
                       batch_size=args.batch_size, mesh=mesh)

    names, streams = [], []
    for f in files:
        name = os.path.split(f)[1][: -len(".s.bin")]
        names.append(name)
        blobs = []
        for ext in (".p.bin", ".s.bin", ".c.bin"):
            with open(os.path.join(args.compressed_path, name + ext), "rb") as fi:
                blobs.append(fi.read())
        streams.append(tuple(blobs))

    codec.decompress(*streams[0])  # warmup/compile
    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    start = time.time()
    clouds = codec.decompress_many(streams)
    elapsed = time.time() - start
    if args.profile_dir:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {args.profile_dir}")

    for name, pc in zip(names, clouds):
        save_point_cloud(pc, name + ".bin.ply", path=args.decompressed_path)

    print(f"Done! Execution time: {round(elapsed / len(files), 5)}s per point cloud.")


def _decompress_with_attributes(args, cfg: CodecConfig, files):
    from pcc_tpu.cli.compress import load_attr_codec

    codec = load_attr_codec(args.model_load_folder, cfg, args.seed,
                            d_a=args.d_a)
    start = time.time()
    streams, names = [], []
    for f in files:
        name = os.path.split(f)[1][: -len(".s.bin")]
        blobs = []
        for ext in (".p.bin", ".s.bin", ".c.bin", ".a.bin"):
            path = os.path.join(args.compressed_path, name + ext)
            if not os.path.exists(path):
                blobs = None
                break
            with open(path, "rb") as fi:
                blobs.append(fi.read())
        if blobs is None:
            print(f"skipping {name}: missing attribute stream")
            continue
        streams.append(tuple(blobs))
        names.append(name)
    # whole-corpus batched decode (AttrCodec.decompress_many)
    for name, (pc, rgb) in zip(names, codec.decompress_many(streams)):
        save_point_cloud(pc, name + ".bin.ply", path=args.decompressed_path,
                         rgb=rgb)
    if names:
        print(f"Done! Execution time: "
              f"{round((time.time()-start)/len(names), 5)}s per point cloud.")


if __name__ == "__main__":
    main()
