import jax.numpy as jnp
import numpy as np
import pytest

from pcc_tpu.coding import (
    morton_encode,
    morton_decode,
    octree_analyze,
    emit_octree_bits,
    parse_octree_bits,
    pack_bits,
    unpack_bits,
    codes_to_points,
    pmf_to_cdf,
    estimate_bits_from_pmf,
)
from pcc_tpu.coding import rangecoder


# ---------------------------------------------------------------- octree ---

def test_morton_roundtrip(rng):
    pts = rng.random((100, 3)).astype(np.float32)
    for depth in (1, 4, 10):
        codes = morton_encode(jnp.asarray(pts), depth)
        centers = np.asarray(morton_decode(codes, depth))
        # center of the voxel containing each point
        reso = 1.0 / (1 << depth)
        expected = (np.floor(pts / reso) + 0.5) * reso
        np.testing.assert_allclose(centers, expected, atol=1e-6)


def test_morton_child_order():
    # child index must be x<<2 | y<<1 | z (reference DFS push order,
    # octree_np.py:31-40)
    pts = np.array([[0.75, 0.25, 0.25]], dtype=np.float32)  # x high, y/z low
    code = int(np.asarray(morton_encode(jnp.asarray(pts), 1))[0])
    assert code == 0b100


def test_octree_analyze_lossless_and_order(rng):
    S, N = 64, 8192
    pts = rng.random((S, 3)).astype(np.float32)
    res = octree_analyze(jnp.asarray(pts), N=N, min_bpp=0.25)
    depth = int(res.depth)
    rec = np.asarray(res.rec_xyz)
    assert rec.shape == (S, 3)
    # lossless: each input point maps to a distinct voxel whose center is rec
    reso = 1.0 / (1 << depth)
    snapped = (np.floor(pts / reso) + 0.5) * reso
    assert len(np.unique(np.floor(pts / reso), axis=0)) == S
    np.testing.assert_allclose(
        np.sort(rec, axis=0), np.sort(snapped, axis=0), atol=1e-6
    )
    # order: descending Morton
    codes = np.asarray(morton_encode(jnp.asarray(rec), depth))
    assert (np.diff(codes) < 0).all()
    # rate floor respected (pn_kit.py:393)
    assert int(res.total_bits) / N > 0.25


def test_octree_bits_count_matches_formula(rng):
    S = 64
    pts = rng.random((S, 3)).astype(np.float32)
    res = octree_analyze(jnp.asarray(pts), N=8192, min_bpp=0.25)
    depth = int(res.depth)
    codes_d = np.asarray(res.sorted_codes) >> (3 * (10 - depth))
    bits = emit_octree_bits(codes_d, depth)
    assert len(bits) == int(res.total_bits)


def test_octree_bitstream_roundtrip(rng):
    for S in (8, 64, 200):
        pts = rng.random((S, 3)).astype(np.float32)
        depth = 7
        codes = np.unique(
            np.asarray(morton_encode(jnp.asarray(pts), depth), dtype=np.int64)
        )
        bits = emit_octree_bits(codes, depth)
        # through byte packing (as written to .s.bin)
        decoded, dec_depth = parse_octree_bits(unpack_bits(pack_bits(bits)))
        assert dec_depth == depth
        np.testing.assert_array_equal(np.sort(decoded), codes)
        # descending order out of the parser
        assert (np.diff(decoded) < 0).all()
        # centers match
        pts_dec = codes_to_points(decoded, depth)
        np.testing.assert_allclose(
            np.sort(pts_dec, axis=0),
            np.sort(np.asarray(morton_decode(jnp.asarray(codes), depth)), axis=0),
            atol=1e-6,
        )


def test_octree_device_host_consistency(rng):
    """Device rec_xyz must equal host parse of the emitted bitstream,
    element-for-element (the compress/decompress invariant)."""
    S = 64
    pts = rng.random((S, 3)).astype(np.float32)
    res = octree_analyze(jnp.asarray(pts), N=8192, min_bpp=0.25)
    depth = int(res.depth)
    codes_d = np.asarray(res.sorted_codes, dtype=np.int64) >> (3 * (10 - depth))
    bits = emit_octree_bits(codes_d, depth)
    decoded, dec_depth = parse_octree_bits(unpack_bits(pack_bits(bits)))
    assert dec_depth == depth
    np.testing.assert_allclose(
        codes_to_points(decoded, depth), np.asarray(res.rec_xyz), atol=1e-6
    )


def _load_reference_octree():
    """Import the reference's numpy-only octree implementation for
    differential testing (VERDICT r1 item 3). Skipped if the read-only
    reference checkout is absent (e.g. on a user machine)."""
    import importlib.util
    import os

    path = "/root/reference/octree_np.py"
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location("ref_octree_np", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bit_emission_matches_reference_encoder(rng):
    """emit_octree_bits must be byte-identical to the reference encoder
    (octree_np.py:10-45) over random skeletons — the .s.bin compatibility
    contract (PARITY.md octree row)."""
    ref = _load_reference_octree()
    for S, depth in ((8, 3), (64, 5), (64, 7), (200, 6)):
        pts = rng.random((S, 3)).astype(np.float32) * 0.98 + 0.01
        codes = np.unique(
            np.asarray(morton_encode(jnp.asarray(pts), depth), dtype=np.int64))
        ours = emit_octree_bits(codes, depth)
        theirs = ref.encode(pts, 1.0, depth)
        np.testing.assert_array_equal(ours, theirs)


def test_parser_inverts_reference_streams(rng):
    """parse_octree_bits must exactly invert reference-produced bitstreams
    (the format-compat direction a reference user cares about)."""
    ref = _load_reference_octree()
    for S, depth in ((16, 4), (64, 6), (128, 7)):
        pts = rng.random((S, 3)).astype(np.float32) * 0.98 + 0.01
        bits = ref.encode(pts, 1.0, depth)
        codes, dec_depth = parse_octree_bits(np.asarray(bits, dtype=np.uint8))
        assert dec_depth == depth
        centers = codes_to_points(codes, depth)
        # the reference's own voxel-center set (its decode is broken at
        # S != 64 — SURVEY §7; getDecodeFromPc is its ground truth)
        expected = ref.getDecodeFromPc(pts, 1.0, depth)
        np.testing.assert_allclose(
            np.asarray(sorted(centers.tolist())),
            np.asarray(sorted(expected.tolist())),
            atol=1e-6,
        )


# ------------------------------------------------------------ pmf / cdf ---

def test_pmf_to_cdf(rng):
    pmf = rng.random((4, 7))
    pmf /= pmf.sum(-1, keepdims=True)
    cdf = np.asarray(pmf_to_cdf(jnp.asarray(pmf)))
    assert cdf.shape == (4, 8)
    np.testing.assert_allclose(cdf[:, 0], 0.0)
    np.testing.assert_allclose(cdf[:, -1], 1.0, rtol=1e-5)
    assert (np.diff(cdf, axis=-1) >= 0).all()


def test_estimate_bits_from_pmf(rng):
    pmf = np.full((10, 4), 0.25)
    sym = rng.integers(0, 4, size=(10,))
    bits = float(estimate_bits_from_pmf(jnp.asarray(pmf), jnp.asarray(sym)))
    np.testing.assert_allclose(bits, 20.0, rtol=1e-5)  # 10 symbols * 2 bits


# ---------------------------------------------------------- range coder ---

def _random_cdf(rng, n, L):
    pmf = rng.random((n, L)) + 0.01
    pmf /= pmf.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros((n, 1)), np.cumsum(pmf, -1)], axis=-1)
    return pmf, np.minimum(cdf, 1.0)


@pytest.mark.parametrize("force_python", [False, True])
def test_rangecoder_roundtrip(rng, force_python):
    n, L = 1024, 7
    pmf, cdf = _random_cdf(rng, n, L)
    syms = np.array([rng.choice(L, p=pmf[i]) for i in range(n)], dtype=np.int16)
    blob = rangecoder.encode_float_cdf(cdf, syms, force_python=force_python)
    out = rangecoder.decode_float_cdf(cdf, blob, force_python=force_python)
    np.testing.assert_array_equal(out, syms)


def test_rangecoder_native_python_bitexact(rng):
    if not rangecoder.native_available():
        pytest.skip("no native lib")
    n, L = 256, 7
    pmf, cdf = _random_cdf(rng, n, L)
    syms = np.array([rng.choice(L, p=pmf[i]) for i in range(n)], dtype=np.int16)
    native = rangecoder.encode_float_cdf(cdf, syms)
    python = rangecoder.encode_float_cdf(cdf, syms, force_python=True)
    assert native == python


def test_rangecoder_rate_near_entropy(rng):
    n, L = 8192, 7
    pmf, cdf = _random_cdf(rng, n, L)
    syms = np.array([rng.choice(L, p=pmf[i]) for i in range(n)], dtype=np.int16)
    blob = rangecoder.encode_float_cdf(cdf, syms)
    entropy_bits = -np.sum(np.log2(pmf[np.arange(n), syms]))
    actual_bits = 8 * len(blob)
    assert actual_bits < entropy_bits * 1.05 + 64  # within 5% + constant


def test_rangecoder_skewed_distributions(rng):
    # near-deterministic pmfs must still round-trip (clamp guard)
    n, L = 500, 7
    syms = rng.integers(0, L, size=n).astype(np.int16)
    pmf = np.full((n, L), 1e-9)
    pmf[np.arange(n), syms] = 1.0
    pmf /= pmf.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros((n, 1)), np.cumsum(pmf, -1)], axis=-1)
    blob = rangecoder.encode_float_cdf(cdf, syms)
    out = rangecoder.decode_float_cdf(cdf, blob)
    np.testing.assert_array_equal(out, syms)
    assert len(blob) < n  # ~0 bits/symbol for deterministic pmfs
