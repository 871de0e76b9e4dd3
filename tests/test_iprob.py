"""Deterministic integer entropy-model inference (coding/iprob.py).

The contract under test: given one converted parameter bundle, EVERY
implementation — the numpy spec, a jitted program, a differently-shaped
(hence differently-compiled) jitted program, a vmapped program — produces
bit-identical uint16 PMF weights, and the host staircase turns them into
valid range-coder CDF rows. This is the property that makes streams
topology-portable (VERDICT r2 item 4; reference gets it for free by running
one torch program on both sides, decompress.py:88-93)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcc_tpu.codec import init_params
from pcc_tpu.coding.iprob import (
    convert_prob_params,
    iprob_pmf_weights,
    iprob_pmf_weights_np,
    weights_to_cdf_rows,
)
from pcc_tpu.config import CodecConfig


@pytest.fixture(scope="module")
def bundle_and_params():
    cfg = CodecConfig()
    _, prob_params = init_params(jax.random.key(3), cfg)
    bundle = convert_prob_params(prob_params, cfg.d, cfg.L)
    return cfg, prob_params, bundle


def _skeletons(rng, B, S=64):
    # voxel-center-like inputs: exact (i + 0.5) / 2^depth grid points
    depth = 6
    ijk = rng.integers(0, 1 << depth, (B, S, 3))
    return ((ijk + 0.5) / (1 << depth)).astype(np.float32)


def test_numpy_vs_jax_bit_exact(bundle_and_params, rng):
    cfg, _, bundle = bundle_and_params
    rec = _skeletons(rng, 4)
    w_np = iprob_pmf_weights_np(bundle, rec)
    w_jx = np.asarray(iprob_pmf_weights(
        jax.tree.map(jnp.asarray, bundle), jnp.asarray(rec)))
    np.testing.assert_array_equal(w_np, w_jx)


def test_cross_compilation_bit_exact(bundle_and_params, rng):
    """Two different compiled programs (different batch shapes, one vmapped)
    agree byte-for-byte on the shared cloud — the property the float CDF
    path does not have (mesh.py's ±1-bin drift)."""
    cfg, _, bundle = bundle_and_params
    dev_bundle = jax.tree.map(jnp.asarray, bundle)
    rec = _skeletons(rng, 6)

    f_b6 = jax.jit(lambda r: iprob_pmf_weights(dev_bundle, r))
    f_b1 = jax.jit(lambda r: iprob_pmf_weights(dev_bundle, r))
    f_vm = jax.jit(jax.vmap(
        lambda r: iprob_pmf_weights(dev_bundle, r[None])[0]))

    w6 = np.asarray(f_b6(jnp.asarray(rec)))
    w1 = np.asarray(f_b1(jnp.asarray(rec[2:3])))
    wv = np.asarray(f_vm(jnp.asarray(rec)))
    np.testing.assert_array_equal(w6[2], w1[0])
    np.testing.assert_array_equal(w6, wv)


def test_cdf_rows_are_valid(bundle_and_params, rng):
    cfg, _, bundle = bundle_and_params
    w = iprob_pmf_weights_np(bundle, _skeletons(rng, 2))
    rows = weights_to_cdf_rows(w).reshape(-1, cfg.L + 1)
    assert rows.dtype == np.int32
    assert (rows[:, 0] == 0).all()
    assert (rows[:, -1] == (1 << 16) - 1).all()
    assert (np.diff(rows, axis=-1) >= 1).all()   # every bin non-empty


def test_integer_pmf_tracks_float_pmf(bundle_and_params, rng):
    """Rate sanity: the integer-path implied distribution stays close to
    the float model's — the quantization costs ~nothing in code length
    (cross-entropy gap well under 1% of the symbol entropy)."""
    from pcc_tpu.codec import make_models

    cfg, prob_params, bundle = bundle_and_params
    rec = _skeletons(rng, 4)
    w = iprob_pmf_weights_np(bundle, rec).astype(np.float64)
    p_int = w / w.sum(axis=-1, keepdims=True)
    _, prob = make_models(cfg)
    p_f = np.asarray(prob.apply(prob_params, jnp.asarray(rec)),
                     dtype=np.float64)
    # cross-entropy under the integer model vs entropy under the float one
    ce = -(p_f * np.log2(np.maximum(p_int, 1e-12))).sum(-1)
    h = -(p_f * np.log2(np.maximum(p_f, 1e-12))).sum(-1)
    assert (ce - h).mean() < 0.01 * max(h.mean(), 0.1), (ce.mean(), h.mean())


def test_encode_bounds_bit_exact(bundle_and_params, rng):
    """Device-computed per-symbol intervals (iprob_encode_bounds, pure
    int32 ops) equal the host int64 staircase's [sym] / [sym+1] entries
    bit-for-bit — the guarantee that lets the encode path fetch 4 bytes per
    symbol instead of full weight rows with unchanged stream bytes."""
    from pcc_tpu.coding.iprob import iprob_encode_bounds

    cfg, _, bundle = bundle_and_params
    rec = _skeletons(rng, 4)
    sym = rng.integers(0, cfg.L, (4, 64, cfg.d)).astype(np.int32)

    dev_bundle = jax.tree.map(jnp.asarray, bundle)
    start, size = jax.jit(
        lambda r, s: iprob_encode_bounds(dev_bundle, r, s)
    )(jnp.asarray(rec), jnp.asarray(sym))
    start, size = np.asarray(start), np.asarray(size)

    rows = weights_to_cdf_rows(iprob_pmf_weights_np(bundle, rec))
    lo = np.take_along_axis(rows, sym[..., None], axis=-1)[..., 0]
    hi = np.take_along_axis(rows, sym[..., None] + 1, axis=-1)[..., 0]
    np.testing.assert_array_equal(start.astype(np.int32), lo)
    np.testing.assert_array_equal(size.astype(np.int32), hi - lo)


def test_encode_bounds_worst_case_magnitudes():
    """The int32-only exact division survives adversarial weights: maximal
    (all-65535) and maximally skewed rows at the largest supported L."""
    from pcc_tpu.coding.iprob import _exact_div_jnp, bounds_supported

    L = 64
    assert bounds_supported(L) and not bounds_supported(65)
    k = (1 << 16) - (L + 1)
    m = 13 - int(np.ceil(np.log2(L)))
    rows = np.stack([
        np.full(L, 65535, np.int64),                      # max total
        np.concatenate([[65535], np.ones(L - 1)]),        # skewed
        np.ones(L, np.int64),                             # min weights
    ])
    cum = np.concatenate([np.zeros((3, 1), np.int64),
                          np.cumsum(rows, axis=-1)], axis=-1)
    total = np.maximum(cum[:, -1:], 1)
    want = (cum * k) // total
    got = np.asarray(_exact_div_jnp(
        jnp.asarray(cum, jnp.int32), k, jnp.asarray(total, jnp.int32), m))
    np.testing.assert_array_equal(got, want)


def test_encode_bounds_stream_bytes_identical(bundle_and_params, rng):
    """rangecoder.encode_bounds over intervals == encode_quantized_cdf over
    the full rows, in both the C++ coder and the python fallback."""
    from pcc_tpu.coding import rangecoder

    cfg, _, bundle = bundle_and_params
    rec = _skeletons(rng, 2)
    sym = rng.integers(0, cfg.L, (2, 64, cfg.d))
    rows = weights_to_cdf_rows(iprob_pmf_weights_np(bundle, rec))
    for b in range(2):
        r = rows[b].reshape(-1, cfg.L + 1)
        s = sym[b].reshape(-1).astype(np.int16)
        lo = r[np.arange(r.shape[0]), s]
        hi = r[np.arange(r.shape[0]), s + 1]
        ref = rangecoder.encode_quantized_cdf(r, s)
        got = rangecoder.encode_bounds(lo, hi - lo, (1 << 16) - 1)
        got_py = rangecoder.encode_bounds(lo, hi - lo, (1 << 16) - 1,
                                          force_python=True)
        assert got == ref
        assert got_py == ref
        # and the stream still decodes against the full rows
        np.testing.assert_array_equal(
            rangecoder.decode_quantized_cdf(r, got), s)


def test_codec_roundtrip_integer_mode(rng):
    """Full Codec roundtrip with the integer CDF path (the default), and
    the stream decodes under a SECOND Codec instance (fresh compiled
    programs) — the single-process guarantee the float path needed."""
    from pcc_tpu.codec import Codec

    cfg = CodecConfig(N=512, K=64)
    ae_params, prob_params = init_params(jax.random.key(0), cfg)
    clouds = [(rng.random((512, 3)).astype(np.float32) * 2 - 1)
              for _ in range(3)]
    codec = Codec(cfg, ae_params, prob_params, batch_size=2)
    streams = codec.compress_many(clouds)
    codec2 = Codec(cfg, ae_params, prob_params, batch_size=2)
    outs = codec2.decompress_many(streams)
    for pc, out in zip(clouds, outs):
        assert out.shape == (cfg.S * cfg.k, 3)
        # lossy codec with random weights: sanity-bound the geometry only
        assert np.isfinite(out).all()
        assert np.abs(out - pc.mean(0)).max() < 10.0
