import numpy as np
import pytest

from pcc_tpu.metrics import (
    calc_uc,
    compute_bitrate,
    compute_p2point_p2plane_psnr,
    normalized_chamfer,
)


def _naive_d1_d2(orig, recon, normals):
    errs_pt, errs_pl = [], []
    for p in recon:
        d = ((orig - p) ** 2).sum(-1)
        i = d.argmin()
        diff = p - orig[i]
        errs_pt.append((diff**2).sum())
        errs_pl.append(float(np.dot(diff, normals[i]) ** 2))
    diag = np.linalg.norm(orig.max(0) - orig.min(0))
    d1 = 10 * np.log10(diag**2 / np.mean(errs_pt))
    d2 = 10 * np.log10(diag**2 / np.mean(errs_pl))
    return d1, d2


def test_d1_psnr_matches_naive(rng):
    orig = rng.random((500, 3)).astype(np.float32)
    recon = (orig + rng.standard_normal((500, 3)) * 0.01).astype(np.float32)
    out = compute_p2point_p2plane_psnr(orig, recon)

    # D1 is normal-free: compare against the naive host loop exactly
    dummy_normals = np.zeros((500, 3))
    d1_naive, _ = _naive_d1_d2(orig, recon, dummy_normals)
    assert out["p2point_psnr"] == pytest.approx(d1_naive, abs=0.05)
    # D2 uses estimated normals; must be finite and >= D1 (projection <= distance)
    assert np.isfinite(out["p2plane_psnr"])
    assert out["p2plane_psnr"] >= out["p2point_psnr"] - 0.05


def test_d2_on_plane(rng):
    # original on the z=0 plane; recon offset in-plane -> p2plane error ~0
    orig = np.zeros((400, 3), np.float32)
    orig[:, :2] = rng.random((400, 2))
    recon = orig.copy()
    recon[:, 0] += 0.003  # slide along the plane
    out = compute_p2point_p2plane_psnr(orig, recon)
    assert out["p2plane_psnr"] > out["p2point_psnr"] + 15  # projection kills error


def test_identical_clouds_infinite_psnr(rng):
    pc = rng.random((300, 3)).astype(np.float32)
    out = compute_p2point_p2plane_psnr(pc, pc)
    assert out["p2point_psnr"] == float("inf")


def test_normalized_chamfer_zero_and_scale_invariance(rng):
    pc = (rng.random((200, 3)) * 50 - 10).astype(np.float32)
    assert normalized_chamfer(pc, pc) == pytest.approx(0.0, abs=1e-9)
    # normalization is by the input's min-max: scaling both clouds together
    # leaves the normalized chamfer unchanged
    other = (pc + rng.standard_normal((200, 3)).astype(np.float32) * 0.5)
    a = normalized_chamfer(pc, other)
    b = normalized_chamfer(pc * 10, other * 10)
    assert a == pytest.approx(b, rel=1e-4)


def test_uc_identity_is_one(rng):
    pc = rng.random((1500, 3)).astype(np.float32)
    assert calc_uc(pc, pc) == pytest.approx(1.0, rel=1e-4)


def test_bitrate():
    assert compute_bitrate(1024, 8192) == 1.0


def test_eval_batch_matches_per_file(rng):
    """Batched eval metrics must equal the per-file APIs (same programs,
    vmapped + chunked)."""
    from pcc_tpu.metrics import eval_batch

    B, N, M = 5, 700, 600
    origs = rng.random((B, N, 3)).astype(np.float32)
    recons = np.stack([
        origs[i, rng.permutation(N)[:M]]
        + rng.standard_normal((M, 3)).astype(np.float32) * 0.01
        for i in range(B)
    ])
    batched = eval_batch(origs, recons, chunk=2)  # forces padding + chunks
    for i in range(B):
        want = compute_p2point_p2plane_psnr(origs[i], recons[i])
        assert batched[i]["p2point_psnr"] == pytest.approx(
            want["p2point_psnr"], abs=1e-3)
        assert batched[i]["p2plane_psnr"] == pytest.approx(
            want["p2plane_psnr"], abs=1e-3)
        assert batched[i]["uc"] == pytest.approx(
            calc_uc(origs[i], recons[i]), rel=1e-4)
        assert batched[i]["chamfer"] == pytest.approx(
            normalized_chamfer(origs[i], recons[i]), rel=1e-4)
