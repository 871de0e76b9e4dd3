"""Train the patch autoencoder (reference train.py CLI).

Flags, defaults and derived parameters mirror reference train.py:29-53,254.
Differences (deliberate, documented):
  * --batch_size may exceed 1 — the reference hard-requires 1 (train.py:41)
    because its octree runs on the host per cloud; our batch is one sharded
    device axis.
  * --rate_mode {reference,fixed} selects the rate-term normalization (see
    pcc_tpu/train/steps.py docstring).
  * checkpoints additionally export ae.pkl/prob.pkl so compress runs without
    the manual rename the reference needs (compress.py:58 vs train.py:105).
"""

from __future__ import annotations

import argparse
import os
import time
from glob import glob

import jax
import numpy as np

from pcc_tpu.config import CodecConfig, DEFAULT_SEED
from pcc_tpu.io import read_point_clouds
from pcc_tpu.train import (
    build_train_step,
    create_train_state,
    load_latest_checkpoint,
    save_checkpoint,
)
from pcc_tpu.train.state import make_optimizer


def build_parser():
    p = argparse.ArgumentParser(
        prog="train.py",
        description="Train autoencoder using point cloud patches",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("--train_glob", default="./data/ModelNet40_pc_01_8192p/**/train/*.ply",
                   help="Point clouds glob pattern for training.")
    p.add_argument("--model_save_folder", default="./model/K256/",
                   help="Directory where to save trained models.")
    p.add_argument("--model", default="AE", help="Type of the model (AE or PPPF-AE).")
    p.add_argument("--N", type=int, default=8192, help="Point cloud resolution.")
    p.add_argument("--N0", type=int, default=1024, help="Scale Transformation constant.")
    p.add_argument("--ALPHA", type=int, default=2, help="The factor of patch coverage ratio.")
    p.add_argument("--K", type=int, default=256, help="Number of points in each patch.")
    p.add_argument("--d", type=int, default=16, help="Bottleneck size.")
    p.add_argument("--L", type=int, default=7, help="Quantization Level.")
    p.add_argument("--lr", type=float, default=0.0005, help="Learning rate.")
    p.add_argument("--batch_size", type=int, default=1, help="Batch size.")
    p.add_argument("--step_window", type=int, default=100,
                   help="Number of steps per window to iterate in epoch.")
    p.add_argument("--lamda", type=float, default=1e-06,
                   help="Lambda for rate-distortion tradeoff.")
    p.add_argument("--rate_loss_enable_step", type=int, default=40000,
                   help="Apply rate-distortion tradeoff at x steps.")
    p.add_argument("--lr_decay", type=float, default=0.1,
                   help="Decays the learning rate to x times the original.")
    p.add_argument("--lr_decay_steps", type=int, default=60000,
                   help="Decays the learning rate every x steps.")
    p.add_argument("--max_steps", type=int, default=80000,
                   help="Train up to this number of steps.")
    p.add_argument("--reset", action="store_true",
                   help="Reset training and start from scratch (ignore saved model).")
    p.add_argument("--rate_mode", default="reference", choices=["reference", "fixed"],
                   help="Rate-term normalization (see train/steps.py).")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 mixed-precision network compute (TPU counterpart "
                        "of the reference's AMP autocast, train.py:168,275); "
                        "params/optimizer stay float32.")
    p.add_argument("--fused_encoder", choices=["auto", "on", "off"],
                   default="auto",
                   help="Fused Pallas encoder in the train step (forward + "
                        "custom-VJP backward kernels: ops/sa_pallas.py for "
                        "AE, ops/pppf_sa_pallas.py for PPPF-AE). auto = on "
                        "for single-device TPU training, off elsewhere (the "
                        "kernels are not GSPMD-partitionable under plain "
                        "jit). For PPPF-AE the fused step freezes the "
                        "encoder's BatchNorm running stats (eval-affine "
                        "BN), so it engages after --bn_warmup_steps XLA "
                        "steps have populated them.")
    p.add_argument("--bn_warmup_steps", type=int, default=1000,
                   help="PPPF-AE only: steps trained through the XLA "
                        "encoder (BN batch stats updating) before switching "
                        "to the fused Pallas step with frozen stats. 0 = "
                        "fused from the start.")
    p.add_argument("--seed", type=int, default=DEFAULT_SEED)
    from pcc_tpu.cli._common import add_devices_flag
    add_devices_flag(p)
    p.add_argument("--jax_debug_nans", action="store_true",
                   help="Enable jax debug_nans (fail fast on NaN).")
    p.add_argument("--profile_dir", default=None,
                   help="Write a jax.profiler trace of the first logging "
                        "window of training steps here.")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from pcc_tpu.cli._common import setup_jax
    setup_jax()
    if args.jax_debug_nans:
        jax.config.update("jax_debug_nans", True)
    from pcc_tpu.cli._common import maybe_mesh
    mesh = maybe_mesh(args.devices)
    fused = args.fused_encoder == "on" or (
        args.fused_encoder == "auto"
        and args.model in ("AE", "PPPF-AE") and mesh is None
        and jax.default_backend() == "tpu" and jax.device_count() == 1)
    cfg = CodecConfig(N=args.N, N0=args.N0, ALPHA=args.ALPHA, K=args.K,
                      d=args.d, L=args.L,
                      compute_dtype="bfloat16" if args.bf16 else "float32",
                      fused_sa=fused and args.model == "AE")
    print(f"Training {args.model} on {jax.devices()[0].platform}"
          + (" (fused Pallas encoder)" if fused else ""))
    print(f"N={cfg.N}, K={cfg.K}, S={cfg.S}, d={cfg.d}, L={cfg.L}")

    os.makedirs(args.model_save_folder, exist_ok=True)

    files = sorted(glob(args.train_glob, recursive=True))
    if not files:
        raise SystemExit(f"no training files match {args.train_glob}")
    print("loading point clouds...")
    points = read_point_clouds(files)
    print(f"Loaded {points.shape} points, range: [{points.min()}, {points.max()}]")

    tx = make_optimizer(args.lr, args.lr_decay, args.lr_decay_steps, args.max_steps)
    fused_step, fused_after = None, 0    # PPPF-AE post-BN-warmup step
    if args.model == "AE":
        state = create_train_state(jax.random.key(args.seed), cfg, tx)
        if mesh is not None:
            from pcc_tpu.parallel import build_sharded_train_step
            train_step = build_sharded_train_step(cfg, tx, mesh,
                                                  rate_mode=args.rate_mode)
        else:
            train_step = build_train_step(cfg, tx, rate_mode=args.rate_mode)
    elif args.model == "PPPF-AE":
        from pcc_tpu.train.steps_pppf import build_pppf_train_step, create_pppf_state
        state = create_pppf_state(jax.random.key(args.seed), cfg, tx)
        if mesh is not None:
            from pcc_tpu.parallel import build_sharded_pppf_train_step
            train_step = build_sharded_pppf_train_step(
                cfg, tx, mesh, rate_mode=args.rate_mode)
        else:
            train_step = build_pppf_train_step(cfg, tx, rate_mode=args.rate_mode)
            if fused:
                # BN-warmup scheme: XLA step (batch stats updating) until
                # --bn_warmup_steps, then the fused Pallas step with the
                # stats frozen at their warmed-up values (jit is lazy, so
                # the unused program never compiles). Selected per step in
                # the loop below off the python counter — never off
                # state.step, which would sync the dispatch pipeline.
                fused_step = build_pppf_train_step(
                    cfg, tx, rate_mode=args.rate_mode, fused=True)
                fused_after = args.bn_warmup_steps
    else:
        raise ValueError(f"Unknown model type: {args.model}")

    start_step = 0
    if not args.reset:
        state, start_step = load_latest_checkpoint(args.model_save_folder, state)
        print(f"Resuming from step {start_step}")
    else:
        print("Resetting training from scratch.")

    if mesh is not None:
        from pcc_tpu.parallel import replicate
        if args.batch_size % args.devices:
            raise SystemExit(
                f"--batch_size {args.batch_size} must be divisible by "
                f"--devices {args.devices}")
        print(f"data-parallel training over {args.devices} devices "
              f"({args.batch_size // args.devices} clouds/device/step)")
        state = replicate(mesh, state)

    rng = np.random.default_rng(args.seed)
    key = jax.random.key(args.seed + 1)
    global_step = start_step
    profiling = False
    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
        profiling = True
    B = args.batch_size
    window = {"loss": [], "fbpp": [], "bpp": []}
    t_window = time.time()

    for epoch in range(10**9):
        order = rng.permutation(len(points))
        for lo in range(0, len(order) - B + 1, B):
            if global_step >= args.max_steps:
                break
            batch = points[order[lo : lo + B]]
            lam = args.lamda if global_step >= args.rate_loss_enable_step else 0.0
            key, sub = jax.random.split(key)
            step_fn = (fused_step if fused_step is not None
                       and global_step >= fused_after else train_step)
            if mesh is not None:
                from pcc_tpu.parallel import shard_batch
                with mesh:
                    state, aux = step_fn(state, shard_batch(mesh, batch),
                                         sub, lam)
            else:
                state, aux = step_fn(state, batch, sub, lam)
            global_step += 1

            # keep aux as device arrays — converting every step would sync
            # the async dispatch pipeline; materialize once per window
            window["loss"].append(aux["loss"])
            window["fbpp"].append(aux["true_fbpp"])
            window["bpp"].append(aux["bpp"])
            if global_step % args.step_window == 0:
                # one stacked transfer per window: pulling each scalar
                # separately costs a full host<->device round trip apiece
                import jax.numpy as jnp
                window = {k: np.asarray(jnp.stack(v)) for k, v in window.items()}
                dt = time.time() - t_window
                print(
                    f"[Epoch {epoch}] Step {global_step} | "
                    f"Feature bpp: {np.mean(window['fbpp']):.5f} | "
                    f"Bpp: {np.mean(window['bpp']):.5f} | "
                    f"Loss: {np.mean(window['loss']):.5f} | "
                    f"{args.step_window / dt:.2f} steps/s"
                )
                window = {"loss": [], "fbpp": [], "bpp": []}
                t_window = time.time()
                save_checkpoint(args.model_save_folder, state, global_step)
                if profiling:
                    jax.profiler.stop_trace()
                    profiling = False
                    print(f"profiler trace written to {args.profile_dir}")
        if global_step >= args.max_steps:
            break

    save_checkpoint(args.model_save_folder, state, "")
    print("Done.")


if __name__ == "__main__":
    main()
