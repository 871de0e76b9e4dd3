"""End-to-end CLI integration test — the suite equivalent of the
reference's Colab-notebook-as-integration-test (SURVEY.md §4): train a few
steps, compress, decompress, eval, visualize, all through the real CLIs on
tiny clouds (CPU backend)."""

import os
from glob import glob

import numpy as np
import pandas as pd

from pcc_tpu.io import read_point_cloud, save_point_cloud

# small config: N=512, K=64, ALPHA=2 -> S=16 patches, k=32
N, K = 512, 64
FLAGS = ["--ALPHA", "2", "--K", str(K), "--d", "8", "--L", "7", "--N0", "64"]


def _make_data(root, n_train=3, n_test=2, seed=5):
    rng = np.random.default_rng(seed)
    for split, count in (("train", n_train), ("test", n_test)):
        for i in range(count):
            theta = np.arccos(rng.uniform(-1, 1, N))
            phi = rng.uniform(0, 2 * np.pi, N)
            r = 1 + 0.1 * np.sin(3 * theta) * np.cos(2 * phi)
            pc = np.stack([
                r * np.sin(theta) * np.cos(phi),
                r * np.sin(theta) * np.sin(phi),
                r * np.cos(theta),
            ], 1).astype(np.float32)
            save_point_cloud(pc, f"{split}_{i}.ply", path=os.path.join(root, split))


def test_full_pipeline(tmp_path):
    from pcc_tpu.cli import compress, decompress, eval as eval_cli, train, visualize

    root = str(tmp_path)
    _make_data(root)

    # train a couple of steps (writes ae.pkl/prob.pkl inference exports)
    train.main([
        "--train_glob", os.path.join(root, "train", "*.ply"),
        "--model_save_folder", os.path.join(root, "model"),
        "--N", str(N), "--max_steps", "2", "--step_window", "1",
        "--batch_size", "1", *FLAGS,
    ])
    assert os.path.exists(os.path.join(root, "model", "ae.pkl"))

    compress.main([
        os.path.join(root, "test", "*.ply"),
        os.path.join(root, "comp"),
        os.path.join(root, "model"),
        "--batch_size", "2", *FLAGS,
    ])
    for i in range(2):
        for ext in (".p.bin", ".s.bin", ".c.bin"):
            assert os.path.getsize(
                os.path.join(root, "comp", f"test_{i}.ply{ext}")) > 0

    decompress.main([
        os.path.join(root, "comp"),
        os.path.join(root, "decomp"),
        os.path.join(root, "model"),
        "--batch_size", "2", *FLAGS,
    ])
    out = read_point_cloud(os.path.join(root, "decomp", "test_0.ply.bin.ply"))
    assert out.shape == (N, 3)  # S*k == N point preservation

    eval_cli.main([
        "--input_glob", os.path.join(root, "test", "*.ply"),
        "--compressed_path", os.path.join(root, "comp"),
        "--decompressed_path", os.path.join(root, "decomp"),
        "--output_file", os.path.join(root, "eval.csv"),
    ])
    df = pd.read_csv(os.path.join(root, "eval.csv"))
    assert len(df) == 2
    assert list(df["n_points_output"]) == [N, N]
    assert (df["bpp"] > 0.1).all() and (df["bpp"] < 8).all()
    assert np.isfinite(df["p2pointPSNR"]).all()

    visualize.main([
        "--csv", os.path.join(root, "eval.csv"),
        "--outdir", os.path.join(root, "figs"),
    ])
    assert os.path.exists(os.path.join(root, "figs", "psnr_per_file.png"))

    # bitstreams decode identically on a fresh codec instance (no hidden
    # state): re-run decompress into a second dir and compare bytes
    decompress.main([
        os.path.join(root, "comp"),
        os.path.join(root, "decomp2"),
        os.path.join(root, "model"),
        "--batch_size", "2", *FLAGS,
    ])
    a = open(os.path.join(root, "decomp", "test_0.ply.bin.ply"), "rb").read()
    b = open(os.path.join(root, "decomp2", "test_0.ply.bin.ply"), "rb").read()
    assert a == b


def test_pppf_pipeline(tmp_path):
    """PPPF-AE through the CLIs: train --model PPPF-AE, then the binary
    codec with --model PPPF-AE (extension — the reference can train PPPF
    but compress.py only drives IPDAE submodules)."""
    from pcc_tpu.cli import compress, decompress, eval as eval_cli, train

    root = str(tmp_path)
    _make_data(root)
    pppf_flags = [*FLAGS, "--model", "PPPF-AE", "--d", "4"]

    train.main([
        "--train_glob", os.path.join(root, "train", "*.ply"),
        "--model_save_folder", os.path.join(root, "model"),
        "--N", str(N), "--max_steps", "2", "--step_window", "1",
        "--batch_size", "1", *pppf_flags,
    ])
    assert os.path.exists(os.path.join(root, "model", "ae.pkl"))

    compress.main([
        os.path.join(root, "test", "*.ply"),
        os.path.join(root, "comp"),
        os.path.join(root, "model"),
        "--batch_size", "2", *pppf_flags,
    ])
    decompress.main([
        os.path.join(root, "comp"),
        os.path.join(root, "decomp"),
        os.path.join(root, "model"),
        "--batch_size", "2", *pppf_flags,
    ])
    # FoldingNet emits d^2 points per patch -> S * d^2 output points
    out = read_point_cloud(os.path.join(root, "decomp", "test_0.ply.bin.ply"))
    assert out.shape == (N * 2 // K * 4 ** 2, 3)

    eval_cli.main([
        "--input_glob", os.path.join(root, "test", "*.ply"),
        "--compressed_path", os.path.join(root, "comp"),
        "--decompressed_path", os.path.join(root, "decomp"),
        "--output_file", os.path.join(root, "eval.csv"),
    ])
    df = pd.read_csv(os.path.join(root, "eval.csv"))
    assert len(df) == 2
    assert np.isfinite(df["p2pointPSNR"]).all()


def test_attribute_pipeline(tmp_path):
    """Colored clouds through train_attributes -> compress --attributes ->
    decompress --attributes -> eval with color columns (extension e2e)."""
    from pcc_tpu.cli import (
        compress,
        decompress,
        eval as eval_cli,
        train_attributes,
    )
    from pcc_tpu.io.ply import read_point_cloud_attr

    root = str(tmp_path)
    rng = np.random.default_rng(9)
    for split, count in (("train", 3), ("test", 2)):
        for i in range(count):
            pc = (rng.random((N, 3)) * 2 - 1).astype(np.float32)
            rgb = np.clip((pc + 1) / 2 * 255, 0, 255).astype(np.uint8)
            save_point_cloud(pc, f"{split}_{i}.ply",
                             path=os.path.join(root, split), rgb=rgb)

    train_attributes.main([
        "--train_glob", os.path.join(root, "train", "*.ply"),
        "--model_save_folder", os.path.join(root, "model"),
        "--N", str(N), "--max_steps", "2", "--step_window", "1",
        "--batch_size", "1", "--d_a", "8", *FLAGS,
    ])
    for name in ("ae", "prob", "attr", "attr_prob"):
        assert os.path.exists(os.path.join(root, "model", f"{name}.pkl"))

    compress.main([
        os.path.join(root, "test", "*.ply"),
        os.path.join(root, "comp"),
        os.path.join(root, "model"),
        "--attributes", "--d_a", "8", *FLAGS,
    ])
    assert os.path.getsize(os.path.join(root, "comp", "test_0.ply.a.bin")) > 0

    decompress.main([
        os.path.join(root, "comp"),
        os.path.join(root, "decomp"),
        os.path.join(root, "model"),
        "--attributes", "--d_a", "8", *FLAGS,
    ])
    out_pc, out_rgb = read_point_cloud_attr(
        os.path.join(root, "decomp", "test_0.ply.bin.ply"))
    assert out_pc.shape == (N, 3)
    assert out_rgb is not None and out_rgb.shape == (N, 3)

    eval_cli.main([
        "--input_glob", os.path.join(root, "test", "*.ply"),
        "--compressed_path", os.path.join(root, "comp"),
        "--decompressed_path", os.path.join(root, "decomp"),
        "--output_file", os.path.join(root, "eval.csv"),
    ])
    df = pd.read_csv(os.path.join(root, "eval.csv"))
    assert "color_psnr" in df.columns and "attr_bpp" in df.columns
    assert np.isfinite(df["color_psnr"]).all()
    assert (df["attr_bpp"] > 0).all()


def test_pppe_pipeline(tmp_path):
    """PPPE quartet end to end: train_pppe_pcd_ae -> pppe_pcd_compress ->
    pppe_pcd_decompress -> eval_pppe (the reference's fast pipeline)."""
    from pcc_tpu.cli import (
        eval_pppe,
        pppe_pcd_compress,
        pppe_pcd_decompress,
        train_pppe_pcd_ae,
    )

    root = str(tmp_path)
    _make_data(root)
    pppe_flags = ["--N", str(N), "--K", "16", "--L", "7"]

    train_pppe_pcd_ae.main([
        "--train_glob", os.path.join(root, "train", "*.ply"),
        "--model_save_folder", os.path.join(root, "model"),
        "--max_steps", "2", "--step_window", "1", "--batch_size", "1",
        *pppe_flags,
    ])
    assert os.path.exists(os.path.join(root, "model", "ae_latest.pkl"))

    pppe_pcd_compress.main([
        os.path.join(root, "test", "*.ply"),
        os.path.join(root, "comp"),
        os.path.join(root, "model"),
        *pppe_flags,
    ])
    bins = glob(os.path.join(root, "comp", "**", "*.bin"), recursive=True)
    assert len(bins) == 2

    pppe_pcd_decompress.main([
        os.path.join(root, "comp", "**", "*.bin"),
        os.path.join(root, "decomp"),
        os.path.join(root, "model"),
        *pppe_flags,
    ])

    eval_pppe.main([
        "--input_glob", os.path.join(root, "test", "*.ply"),
        "--compressed_path", os.path.join(root, "comp"),
        "--decompressed_path", os.path.join(root, "decomp"),
        "--output_file", os.path.join(root, "eval_pppe.csv"),
    ])
    df = pd.read_csv(os.path.join(root, "eval_pppe.csv"))
    assert len(df) == 2
    assert np.isfinite(df["p2pointPSNR"]).all()
    assert (df["bpp"] > 0).all()
    assert (df["n_points_output"] == N).all()
