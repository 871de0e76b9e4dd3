"""Train the joint geometry + RGB-attribute codec (extension CLI).

The reference codes geometry only (README.md; pn_kit.py reads xyz); this
trains pcc_tpu's attribute extension (pcc_tpu/attrib.py): the IPDAE patch
pipeline plus a per-patch color autoencoder and a skeleton-conditioned
attribute probability model, optimizing chamfer + color MSE + lambda*rate
jointly. Saves ae/prob/attr/attr_prob.pkl, the set compress --attributes
loads.
"""

from __future__ import annotations

import argparse
import os
import pickle
import time
from glob import glob

import jax
import numpy as np

from pcc_tpu.config import CodecConfig, DEFAULT_SEED


def build_parser():
    p = argparse.ArgumentParser(
        prog="train_attributes.py",
        description="Train the XYZ+RGB attribute codec on colored point clouds",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("--train_glob", default="./data/colored/**/train/*.ply",
                   help="Colored point clouds glob pattern for training.")
    p.add_argument("--model_save_folder", default="./model/K256_attr/",
                   help="Directory where to save trained models.")
    p.add_argument("--N", type=int, default=8192)
    p.add_argument("--N0", type=int, default=1024)
    p.add_argument("--ALPHA", type=int, default=2)
    p.add_argument("--K", type=int, default=256)
    p.add_argument("--d", type=int, default=16, help="Geometry bottleneck size.")
    p.add_argument("--d_a", type=int, default=16, help="Attribute bottleneck size.")
    p.add_argument("--L", type=int, default=7)
    p.add_argument("--lr", type=float, default=0.0005)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--step_window", type=int, default=100)
    p.add_argument("--lamda", type=float, default=1e-4,
                   help="Rate weight (applied from --rate_loss_enable_step).")
    p.add_argument("--rate_loss_enable_step", type=int, default=2000)
    p.add_argument("--color_weight", type=float, default=1.0)
    p.add_argument("--lr_decay", type=float, default=0.1)
    p.add_argument("--lr_decay_steps", type=int, default=8000)
    p.add_argument("--max_steps", type=int, default=10000)
    p.add_argument("--seed", type=int, default=DEFAULT_SEED)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from pcc_tpu.cli._common import setup_jax
    setup_jax()

    from pcc_tpu.attrib import build_attr_train_step, init_attr_params
    from pcc_tpu.codec import init_params
    from pcc_tpu.io.ply import read_point_cloud_attr
    from pcc_tpu.train.state import TrainState, make_optimizer

    cfg = CodecConfig(N=args.N, N0=args.N0, ALPHA=args.ALPHA, K=args.K,
                      d=args.d, L=args.L)
    print(f"Training attribute codec on {jax.devices()[0].platform}; "
          f"N={cfg.N}, K={cfg.K}, S={cfg.S}, d={cfg.d}, d_a={args.d_a}")
    os.makedirs(args.model_save_folder, exist_ok=True)

    files = sorted(glob(args.train_glob, recursive=True))
    if not files:
        raise SystemExit(f"no training files match {args.train_glob}")
    pcs, rgbs = [], []
    for f in files:
        pc, rgb = read_point_cloud_attr(f)
        if rgb is None:
            print(f"skipping {f}: no RGB attributes")
            continue
        pcs.append(pc)
        rgbs.append(rgb.astype(np.float32) / 255.0)
    if not pcs:
        raise SystemExit("no colored clouds found")
    points = np.stack(pcs)
    colors = np.stack(rgbs)
    print(f"Loaded {points.shape} xyz + rgb")

    ae_p, prob_p = init_params(jax.random.key(args.seed), cfg)
    attr_p, attr_prob_p = init_attr_params(
        jax.random.key(args.seed + 1), cfg, args.d_a)
    params = {"ae": ae_p, "prob": prob_p,
              "attr": attr_p, "attr_prob": attr_prob_p}
    tx = make_optimizer(args.lr, args.lr_decay, args.lr_decay_steps,
                        args.max_steps)
    state = TrainState(params=params, opt_state=tx.init(params), step=0)
    step_fn = build_attr_train_step(cfg, tx, d_a=args.d_a)

    rng = np.random.default_rng(args.seed)
    key = jax.random.key(args.seed + 2)
    B = args.batch_size
    global_step = 0
    window = {"loss": [], "color": [], "bpp": []}
    t_window = time.time()

    while global_step < args.max_steps:
        order = rng.permutation(len(points))
        for lo in range(0, len(order) - B + 1, B):
            if global_step >= args.max_steps:
                break
            sel = order[lo: lo + B]
            lam = args.lamda if global_step >= args.rate_loss_enable_step else 0.0
            key, sub = jax.random.split(key)
            state, aux = step_fn(state, points[sel], colors[sel], sub, lam)
            global_step += 1
            window["loss"].append(aux["loss"])
            window["color"].append(aux["color_mse"])
            window["bpp"].append(aux["bpp"])
            if global_step % args.step_window == 0:
                import jax.numpy as jnp
                window = {k: np.asarray(jnp.stack(v)) for k, v in window.items()}
                dt = time.time() - t_window
                print(f"Step {global_step} | Loss: {np.mean(window['loss']):.6f} | "
                      f"Color MSE: {np.mean(window['color']):.6f} | "
                      f"Bpp: {np.mean(window['bpp']):.4f} | "
                      f"{args.step_window / dt:.2f} steps/s")
                window = {"loss": [], "color": [], "bpp": []}
                t_window = time.time()

    for name in ("ae", "prob", "attr", "attr_prob"):
        with open(os.path.join(args.model_save_folder, f"{name}.pkl"), "wb") as f:
            leaves = jax.tree.leaves(state.params[name])
            for leaf in leaves:
                if hasattr(leaf, "copy_to_host_async"):
                    leaf.copy_to_host_async()
            pickle.dump(jax.tree.map(np.asarray, state.params[name]), f)
    print(f"Saved attribute codec checkpoints to {args.model_save_folder}")


if __name__ == "__main__":
    main()
