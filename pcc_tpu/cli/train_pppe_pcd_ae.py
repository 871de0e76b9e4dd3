"""Train the PPPE whole-cloud AE (reference train_pppe_pcd_ae.py CLI).

Flags/defaults mirror train_pppe:25-38. Behavior replicated: lambda warmup
over warmup_steps, grad clip 1.0, per-epoch cosine LR (T_max 100), NaN-loss
step skip, best/latest checkpoints by windowed mean loss, train.npy cache,
dataset-norm stats computed and saved to dataset_norm.pkl but NOT applied
(the reference computes them and leaves the normalize call commented out,
train_pppe:189-190,283-287).

Consequence of that replicated quirk: training sees RAW clouds while
pppe_pcd_compress normalizes each cloud to the unit cube at encode time
(pppe_pcd_compress.py:55-66), so training data must already live in ~[0,1]
— which sample_modelnet's min-max normalization guarantees for the
reference's datasets — or the encoder sees a train/infer distribution
mismatch and reconstruction quality collapses (measured: 12 dB vs 32 dB D1
on the same shapes, raw vs [0,1]-normalized training sets).
"""

from __future__ import annotations

import argparse
import os
import pickle
import time
from glob import glob

import numpy as np

from pcc_tpu.cli._common import setup_jax
from pcc_tpu.config import DEFAULT_SEED, PPPEConfig
from pcc_tpu.io import read_point_clouds


def build_parser():
    p = argparse.ArgumentParser(
        prog="train_pppe_pcd_ae.py",
        description="Train autoencoder (PointNet++ + PCN) with conditional prob model",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("--train_glob", default="./data/ModelNet40_pc_01_8192p/**/train/*.ply")
    p.add_argument("--model_save_folder", default="./model/P1/")
    p.add_argument("--N", type=int, default=8192, help="Point cloud resolution.")
    p.add_argument("--K", type=int, default=256, help="Latent space dimension.")
    p.add_argument("--L", type=int, default=7, help="Quantization level.")
    p.add_argument("--lr", type=float, default=0.0005, help="Learning rate.")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--max_steps", type=int, default=80000)
    p.add_argument("--step_window", type=int, default=100)
    p.add_argument("--lr_decay", type=float, default=0.95)
    p.add_argument("--lr_decay_steps", type=int, default=60000)
    p.add_argument("--warmup_steps", type=int, default=5000,
                   help="Number of steps to gradually ramp up lambda in RD loss")
    p.add_argument("--reset", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 mixed-precision network compute (AMP "
                        "counterpart, reference train_pppe:172,215).")
    p.add_argument("--seed", type=int, default=DEFAULT_SEED)
    from pcc_tpu.cli._common import add_devices_flag
    add_devices_flag(p)
    return p


def load_training_points(train_glob: str) -> np.ndarray:
    """train.npy cache next to the data root (train_pppe:260-267)."""
    npy_path = os.path.join(os.path.dirname(train_glob.split("*")[0]), "train.npy")
    if os.path.exists(npy_path):
        print(f"Loading cached point clouds from {npy_path}")
        return np.load(npy_path)
    files = sorted(glob(train_glob, recursive=True))
    if not files:
        raise SystemExit(f"no training files match {train_glob}")
    points = read_point_clouds(files)
    print(f"Loaded {points.shape} points")
    return points


def compute_dataset_norm(points: np.ndarray):
    """Dataset mean + max radius (train_pppe:147-160)."""
    flat = points.reshape(-1, 3)
    center = flat.mean(axis=0)
    longest = np.linalg.norm(flat - center, axis=1).max()
    return center, longest


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_jax()
    import jax

    from pcc_tpu.train.checkpoint import (
        load_pppe_checkpoint, save_pppe_checkpoint)
    from pcc_tpu.train.steps_pppe import (
        build_pppe_train_step, cosine_epoch_lr, create_pppe_state,
        make_pppe_optimizer, set_lr)

    print(f"Training PointNet++ + PCN + ProbModel on {jax.devices()[0].platform}")
    os.makedirs(args.model_save_folder, exist_ok=True)

    cfg = PPPEConfig(N=args.N, latent_dim=args.K, L=args.L,
                     compute_dtype="bfloat16" if args.bf16 else "float32")
    points = load_training_points(args.train_glob)

    from pcc_tpu.cli._common import maybe_mesh
    mesh = maybe_mesh(args.devices)
    tx = make_pppe_optimizer(args.lr)
    state = create_pppe_state(jax.random.key(args.seed), cfg, tx)
    if mesh is not None:
        from pcc_tpu.parallel import build_sharded_pppe_train_step
        if args.batch_size % args.devices:
            raise SystemExit(
                f"--batch_size {args.batch_size} must be divisible by "
                f"--devices {args.devices}")
        print(f"data-parallel training over {args.devices} devices")
        train_step = build_sharded_pppe_train_step(cfg, tx, mesh)
    else:
        train_step = build_pppe_train_step(cfg, tx)

    center, longest = compute_dataset_norm(points)
    with open(os.path.join(args.model_save_folder, "dataset_norm.pkl"), "wb") as f:
        pickle.dump({"center": center, "longest": longest}, f)

    start_step = 0
    if not args.reset:
        state, start_step = load_pppe_checkpoint(args.model_save_folder, state)
        print(f"Resuming from step {start_step}")
    else:
        print("Starting training from scratch.")
    if mesh is not None:
        from pcc_tpu.parallel import replicate
        state = replicate(mesh, state)

    rng = np.random.default_rng(args.seed)
    B = args.batch_size
    global_step = start_step
    best_loss = float("inf")
    window = {"loss": [], "dist": [], "rate": [], "skipped": []}
    t_window = time.time()

    for epoch in range(10**9):
        state = set_lr(state, cosine_epoch_lr(args.lr, epoch))
        order = rng.permutation(len(points))
        for lo in range(0, len(order) - B + 1, B):
            if global_step >= args.max_steps:
                break
            batch = points[order[lo : lo + B]]
            lam_eff = 1.0 * min(1.0, global_step / max(1, args.warmup_steps))
            if mesh is not None:
                from pcc_tpu.parallel import shard_batch
                with mesh:
                    state, aux = train_step(
                        state, shard_batch(mesh, batch), lam_eff)
            else:
                state, aux = train_step(state, batch, lam_eff)
            # The NaN/Inf skip is enforced *inside* the jitted step (the
            # update is zeroed); checking the flag per step here would sync
            # the dispatch pipeline, so anomalies are reported per window.
            global_step += 1
            window["loss"].append(aux["loss"])
            window["dist"].append(aux["dist"])
            window["rate"].append(aux["rate"])
            window["skipped"].append(aux["skipped"])

            if global_step % args.step_window == 0:
                import jax.numpy as jnp
                vals = {k: np.asarray(jnp.stack(v)) for k, v in window.items()}
                n_skip = int(vals.pop("skipped").sum())
                if n_skip:
                    print(f"[Warning] {n_skip} loss anomalies in window")
                avg = {k: float(np.mean(v)) for k, v in vals.items()}
                if avg["loss"] < best_loss:
                    best_loss = avg["loss"]
                    save_pppe_checkpoint(args.model_save_folder, state,
                                         global_step, best=True)
                dt = time.time() - t_window
                print(f"[Epoch {epoch}] Step {global_step} | "
                      f"Loss: {avg['loss']:.5f} | Dist: {avg['dist']:.5f} | "
                      f"Rate: {avg['rate']:.5f} | "
                      f"{args.step_window / dt:.2f} steps/s")
                window = {"loss": [], "dist": [], "rate": [], "skipped": []}
                t_window = time.time()
                save_pppe_checkpoint(args.model_save_folder, state, global_step)
        if global_step >= args.max_steps:
            break

    save_pppe_checkpoint(args.model_save_folder, state, global_step)
    print("Done.")


if __name__ == "__main__":
    main()
