"""Device (XLA) range decoder vs the host C++/python coder
(coding/rc_device.py). The contract: for streams written by the host
encoder under integer staircase rows, the lane-parallel device decoder
recovers the exact symbols — this is what lets the decompress path run
CDFs + range decoding + the decoder network as ONE device program."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcc_tpu.coding import rangecoder
from pcc_tpu.coding.iprob import weights_to_cdf_rows
from pcc_tpu.coding.rc_device import range_decode_batch, staircase_full


def _random_weights(rng, B, n, L, skew=None):
    w = rng.integers(1, 65535, (B, n, L)).astype(np.int64)
    if skew == "hot":
        # one dominant symbol per slot (near-deterministic PMF)
        hot = rng.integers(0, L, (B, n))
        w = np.maximum(w // 1000, 1)
        np.put_along_axis(w, hot[..., None], 65535, axis=-1)
    elif skew == "min":
        w = np.ones((B, n, L), np.int64)
    return w


@pytest.mark.parametrize("skew", [None, "hot", "min"])
def test_device_decode_matches_host_coder(rng, skew):
    B, n, L = 5, 96, 7
    w = _random_weights(rng, B, n, L, skew)
    rows = weights_to_cdf_rows(w)                       # [B, n, L+1]
    syms = rng.integers(0, L, (B, n)).astype(np.int16)

    blobs = [rangecoder.encode_quantized_cdf(rows[b], syms[b])
             for b in range(B)]
    # sanity: host decoder agrees with itself
    np.testing.assert_array_equal(
        rangecoder.decode_quantized_cdf(rows[0], blobs[0]), syms[0])

    plen = max(len(b) for b in blobs)                   # ragged -> zero-pad
    arr = np.zeros((B, plen), np.uint8)
    for b, blob in enumerate(blobs):
        arr[b, : len(blob)] = np.frombuffer(blob, np.uint8)

    got = np.asarray(jax.jit(range_decode_batch)(
        jnp.asarray(rows.astype(np.int32)), jnp.asarray(arr)))
    np.testing.assert_array_equal(got, syms.astype(np.int32))


def test_staircase_full_matches_host(rng):
    for L in (7, 16, 64):
        w = _random_weights(rng, 3, 40, L)
        want = weights_to_cdf_rows(w)
        got = np.asarray(jax.jit(staircase_full)(
            jnp.asarray(w.astype(np.int32))))
        np.testing.assert_array_equal(got, want)


def test_end_to_end_staircase_encode_device_decode(rng):
    """Full loop: device staircase -> host interval encode (the compress
    path) -> device decode (the decompress path)."""
    B, n, L = 3, 64, 7
    w = _random_weights(rng, B, n, L)
    cdf_dev = np.asarray(jax.jit(staircase_full)(
        jnp.asarray(w.astype(np.int32))))
    syms = rng.integers(0, L, (B, n))
    lo = np.take_along_axis(cdf_dev, syms[..., None], -1)[..., 0]
    hi = np.take_along_axis(cdf_dev, syms[..., None] + 1, -1)[..., 0]
    blobs = [rangecoder.encode_bounds(lo[b], hi[b] - lo[b], (1 << 16) - 1)
             for b in range(B)]
    plen = -(-max(len(b) for b in blobs) // 512) * 512  # codec's padding
    arr = np.zeros((B, plen), np.uint8)
    for b, blob in enumerate(blobs):
        arr[b, : len(blob)] = np.frombuffer(blob, np.uint8)
    got = np.asarray(jax.jit(range_decode_batch)(
        jnp.asarray(cdf_dev), jnp.asarray(arr)))
    np.testing.assert_array_equal(got, syms)


def test_codec_two_instances(rng):
    """Two Codec instances + repeated calls in one process, with the
    persistent compilation cache enabled (conftest). Guards the jit
    constant-hoisting arity bug: hoisted np constants (the exp2 LUT, an
    arange, jnp scalar globals) made the SECOND call of the same compiled
    fused-decode program fail with INVALID_ARGUMENT "supplied N buffers
    but compiled program expected M". All such constants now ride as
    explicit arguments or inline literals."""
    from pcc_tpu.codec import Codec, init_params
    from pcc_tpu.config import CodecConfig

    cfg_a = CodecConfig(N=1024, K=128, d=8, L=7)
    ae_a, prob_a = init_params(jax.random.key(11), cfg_a)
    codec_a = Codec(cfg_a, ae_a, prob_a)
    cloud_a = [(rng.random((1024, 3)) * 3 - 1).astype(np.float32)]
    out_a = codec_a.decompress_many(codec_a.compress_many(cloud_a))
    assert out_a[0].shape == (cfg_a.S * cfg_a.k, 3)

    cfg_b = CodecConfig(N=512, K=64)
    ae_b, prob_b = init_params(jax.random.key(0), cfg_b)
    codec_b = Codec(cfg_b, ae_b, prob_b, batch_size=2)
    clouds_b = [(rng.random((512, 3)).astype(np.float32) * 2 - 1)
                for _ in range(3)]   # 2 batches -> 2 calls of the same jit
    out1 = codec_b.decompress_many(codec_b.compress_many(clouds_b))
    out2 = codec_b.decompress_many(codec_b.compress_many(clouds_b))
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_codec_fused_decompress_matches_host_decode(rng):
    """Codec integer-mode decompress (the fused one-program path) returns
    byte-for-byte the same clouds as host-range-decoding the symbols and
    driving the same packed decoder program with them."""
    import functools

    from pcc_tpu.codec import (Codec, decode_clouds_packed_io, init_params,
                               skeleton_pmf_weights, unpack_decode_buffer)
    from pcc_tpu.coding.iprob import weights_to_cdf_rows as rows_host
    from pcc_tpu.coding.octree_host import (codes_to_points,
                                            parse_octree_bits, unpack_bits)
    from pcc_tpu.config import CodecConfig

    cfg = CodecConfig(N=512, K=64)
    ae_params, prob_params = init_params(jax.random.key(0), cfg)
    clouds = [(rng.random((512, 3)).astype(np.float32) * 2 - 1)
              for _ in range(3)]
    codec = Codec(cfg, ae_params, prob_params, batch_size=2)
    streams = codec.compress_many(clouds)
    outs_fused = codec.decompress_many(streams)

    # reference: parse skeleton, host-decode symbols, same packed decoder
    recs, syms = [], []
    for p, s, c in streams:
        codes, depth = parse_octree_bits(unpack_bits(s))
        rec = codes_to_points(codes, depth)
        w = np.asarray(skeleton_pmf_weights(codec._iprob,
                                            jnp.asarray(rec[None]),
                                            d=cfg.d, L=cfg.L))[0]
        syms.append(rangecoder.decode_quantized_cdf(rows_host(w), p)
                    .astype(np.int8))
        recs.append(rec)
    S = recs[0].shape[0]
    dcfg = codec.cfg.with_n(S * cfg.k)
    buf = np.asarray(jax.jit(functools.partial(
        decode_clouds_packed_io, cfg=dcfg))(
        codec.ae_params, jnp.asarray(np.stack(syms)),
        jnp.asarray(np.stack(recs))))
    q, scale = unpack_decode_buffer(buf, S)
    for j, ((p, s, c), out_f) in enumerate(zip(streams, outs_fused)):
        hdr = np.frombuffer(c, np.float32)
        pc01 = (q[j].astype(np.float32) * (scale[j] / 127.0)[:, None, :]
                + recs[j][:, None, :]).reshape(-1, 3)
        out_ref = (pc01 - 0.5) * (hdr[3] / (1.0 - cfg.margin)) + hdr[:3]
        np.testing.assert_array_equal(out_ref.astype(np.float32),
                                      out_f.astype(np.float32))
