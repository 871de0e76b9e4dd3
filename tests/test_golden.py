"""Golden-artifact guards: the committed eval CSVs are this framework's
regression anchors (eval/GOLDEN.md — the counterpart of the reference's
committed eval/ModelNet40_K256.csv). These tests pin the documented means
so the artifacts cannot silently drift or rot."""

import os

import numpy as np
import pandas as pd
import pytest

EVAL_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "eval")


def _load(name):
    path = os.path.join(EVAL_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not committed")
    return pd.read_csv(path)


def test_fixed_mode_golden_stats():
    df = _load("SyntheticSurfaces_K256.csv")
    assert len(df) == 32
    assert df["p2pointPSNR"].mean() == pytest.approx(43.92, abs=0.05)
    assert df["bpp"].mean() == pytest.approx(0.550, abs=0.005)
    # beats the reference's RD anchor (42.98 dB / 0.640 bpp) on both axes
    assert df["p2pointPSNR"].mean() > 42.98
    assert df["bpp"].mean() < 0.640
    assert (df["n_points_input"] == 8192).all()
    assert (df["n_points_output"] == 8192).all()


def test_reference_mode_golden_stats():
    df = _load("SyntheticSurfaces_K256_reference_mode.csv")
    assert len(df) == 32
    # the reference's exact recipe lands in its published operating regime:
    # near-uniform PMF -> ~0.65 total bpp, D1 in the ~43 dB band
    assert df["p2pointPSNR"].mean() == pytest.approx(43.87, abs=0.05)
    assert df["bpp"].mean() == pytest.approx(0.651, abs=0.005)
    assert 0.60 < df["bpp"].mean() < 0.70
    assert 42.0 < df["p2pointPSNR"].mean() < 46.0


def test_attribute_golden_stats():
    df = _load("SyntheticSurfacesRGB_K256_attr.csv")
    assert len(df) == 16
    assert df["color_psnr"].mean() == pytest.approx(25.92, abs=0.05)
    assert df["attr_bpp"].mean() == pytest.approx(0.249, abs=0.005)
    # geometry stays in the compare.py High tier under the joint objective
    assert df["p2pointPSNR"].mean() >= 38.0
    assert df["p2planePSNR"].mean() >= 40.0


def test_goldens_quality_tiers():
    """Every row of the fixed-mode golden clears the reference's own
    High-tier thresholds (compare.py:19-25)."""
    df = _load("SyntheticSurfaces_K256.csv")
    assert (df["p2pointPSNR"] >= 38).all()
    assert (df["p2planePSNR"] >= 40).all()
    assert (df["bpp"] < 1.2).all()
    preservation = df["n_points_output"] / df["n_points_input"]
    assert (preservation >= 0.95).all()
    assert np.isfinite(df["chamfer_distance"]).all()


def test_pppe_golden_stats():
    df = _load("SyntheticSurfaces_PPPE.csv")
    assert len(df) == 32
    assert df["p2pointPSNR"].mean() == pytest.approx(32.88, abs=0.05)
    assert df["chamfer_distance"].mean() == pytest.approx(1.93e-3, rel=0.05)
    # raw-float32-latent stream: 256 floats + uint32 header over 8192 pts
    assert df["bpp"].mean() == pytest.approx((4 + 256 * 4) * 8 / 8192, abs=1e-6)
    assert (df["n_points_output"] == 8192).all()


def test_pppe_entropy_golden_stats():
    """--entropy_coding: identical distortion to the raw-float contract at
    ~20x less rate (the decoded symbols equal the --use_quantized path)."""
    df = _load("SyntheticSurfaces_PPPE_entropy.csv")
    raw = _load("SyntheticSurfaces_PPPE.csv")
    assert len(df) == 32
    assert df["p2pointPSNR"].mean() == pytest.approx(
        raw["p2pointPSNR"].mean(), abs=1e-6)
    assert df["bpp"].mean() == pytest.approx(0.0492, abs=0.001)
    assert df["bpp"].mean() < raw["bpp"].mean() / 15


def test_rooms_golden_stats():
    """S3DIS-scale golden: 8 synthetic rooms (6x65536, 50000, 100000 pts)
    through the full binary pipeline with an 8192-trained model — the
    large-scene path the reference handles via runtime S
    (compress.py:92-93)."""
    df = _load("SyntheticRooms_K256.csv")
    assert len(df) == 8
    assert df["p2pointPSNR"].mean() == pytest.approx(50.51, abs=0.05)
    assert df["bpp"].mean() == pytest.approx(0.647, abs=0.005)
    assert set(df["n_points_input"]) == {65536, 50000, 100000}
    # N not divisible by k reconstructs S*k points (reference decompress
    # semantics, decompress.py:104-107)
    out_by_in = dict(zip(df["n_points_input"], df["n_points_output"]))
    assert out_by_in[50000] == 49920 and out_by_in[100000] == 99968


def test_pppf_golden_stats():
    """PPPF-AE through the full binary pipeline — an extension: the
    reference's compress.py is hardwired to IPDAE submodules and cannot
    binary-compress its own PPPF checkpoints."""
    df = _load("SyntheticSurfaces_PPPF_K256.csv")
    assert len(df) == 32
    assert df["p2pointPSNR"].mean() == pytest.approx(41.09, abs=0.05)
    assert df["bpp"].mean() == pytest.approx(0.576, abs=0.005)
    # compare.py "High" tier — the bar the IPDAE goldens are held to
    # (r2 VERDICT item 5: the 20k-step recipe landed at 35.8 dB; the
    # 30k + λ-relaxed fine-tune recipe in GOLDEN.md clears the tier)
    assert df["p2pointPSNR"].mean() >= 38.0
    assert df["chamfer_distance"].mean() <= 8e-4
    # FoldingNet emits grid^2 = K points per patch (PPPF_AE.py:118-123), so
    # n_out = S*K = 2N at the default config
    assert (df["n_points_output"] == 2 * df["n_points_input"]).all()
