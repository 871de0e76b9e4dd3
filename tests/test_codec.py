import jax
import numpy as np
import pytest

from pcc_tpu.codec import Codec, init_params
from pcc_tpu.config import CodecConfig

CFG = CodecConfig(N=1024, K=128, d=8, L=7)  # small config for CPU speed


@pytest.fixture(scope="module")
def codec():
    ae_params, prob_params = init_params(jax.random.key(11), CFG)
    return Codec(CFG, ae_params, prob_params)


def _cloud(rng, n=CFG.N):
    return (rng.random((n, 3)) * 3 - 1).astype(np.float32)


def test_compress_decompress_roundtrip(rng, codec):
    pc = _cloud(rng)
    p, s, c = codec.compress(pc)
    assert len(c) == 16  # 4 float32: center + longest
    out = codec.decompress(p, s, c)
    assert out.shape == (CFG.S * CFG.k, 3)
    assert np.isfinite(out).all()
    # untrained nets reconstruct garbage geometry, but the output must stay
    # within the denormalized bounding region's rough scale
    assert np.abs(out).max() < 100


def test_latent_stream_roundtrip_exact(rng, codec):
    """The decoded symbols must equal the encoded symbols exactly — this is
    the decodability invariant (PMF depends only on the skeleton)."""
    import jax.numpy as jnp
    from pcc_tpu.codec import encode_cloud, skeleton_cdf
    from pcc_tpu.coding import rangecoder
    import functools

    pc = _cloud(rng)
    res = jax.jit(functools.partial(encode_cloud, cfg=CFG))(
        codec.ae_params, codec.prob_params, jnp.asarray(pc),
        jnp.asarray(0, jnp.int32),
    )
    # both sides build the cdf through the same jitted program, fed with
    # rec_xyz only (the decodability invariant)
    cdf_fn = jax.jit(functools.partial(skeleton_cdf, cfg=CFG))
    cdf_enc = np.asarray(cdf_fn(codec.prob_params, res.rec_xyz), np.int32)
    p_bytes = rangecoder.encode_quantized_cdf(
        cdf_enc, np.asarray(res.sym, np.int16))
    # decoder side: host-reconstructed skeleton must yield a bit-identical cdf
    from pcc_tpu.coding.octree_host import codes_to_points
    codes = np.asarray(res.sorted_codes, np.int64) >> (
        3 * (CFG.max_depth - int(res.depth)))
    rec_host = codes_to_points(codes, int(res.depth))
    np.testing.assert_array_equal(rec_host, np.asarray(res.rec_xyz))
    cdf_dec = np.asarray(cdf_fn(codec.prob_params, jnp.asarray(rec_host)),
                         np.int32)
    np.testing.assert_array_equal(cdf_dec, cdf_enc)
    sym2 = rangecoder.decode_quantized_cdf(cdf_dec, p_bytes)
    np.testing.assert_array_equal(sym2, np.asarray(res.sym))


def test_bpp_in_expected_range(rng, codec):
    pc = _cloud(rng)
    p, s, c = codec.compress(pc)
    bpp = 8 * (len(p) + len(s) + len(c)) / CFG.N
    # skeleton floor (0.5 for K=128) + latent stream; untrained pmf ~ uniform
    # -> latent ~ log2(7) * S * d / N
    assert 0.5 < bpp < 4.0


def test_deterministic(rng, codec):
    pc = _cloud(rng)
    a = codec.compress(pc)
    b = codec.compress(pc)
    assert a == b


# --- PPPF-AE through the full binary pipeline (extension: the reference's
# compress.py drives IPDAE submodules directly and cannot code PPPF) -------

CFG_PPPF = CodecConfig(N=512, K=64, d=4, L=7, model="PPPF-AE")


@pytest.fixture(scope="module")
def pppf_codec():
    ae_params, prob_params = init_params(jax.random.key(11), CFG_PPPF)
    return Codec(CFG_PPPF, ae_params, prob_params)


def test_pppf_compress_decompress_roundtrip(rng, pppf_codec):
    pc = _cloud(rng, n=CFG_PPPF.N)
    p, s, c = pppf_codec.compress(pc)
    assert len(c) == 16
    out = pppf_codec.decompress(p, s, c)
    # FoldingNet emits d^2 points per patch (PPPF_AE.py:118-123)
    assert out.shape == (CFG_PPPF.S * CFG_PPPF.d ** 2, 3)
    assert np.isfinite(out).all()
    assert np.abs(out).max() < 100


def test_pppf_latent_stream_exact(rng, pppf_codec):
    """Range-decoded PPPF symbols must equal the encoded symbols: the PPPF
    CPM sees only the transmitted skeleton, like the IPDAE one."""
    pc = _cloud(rng, n=CFG_PPPF.N)
    pc2 = _cloud(rng, n=CFG_PPPF.N)
    streams = pppf_codec.compress_many([pc, pc2])
    outs = pppf_codec.decompress_many(streams)
    assert len(outs) == 2
    for out in outs:
        assert out.shape == (CFG_PPPF.S * CFG_PPPF.d ** 2, 3)
    # determinism across calls (BN runs in inference mode on both sides)
    assert pppf_codec.compress(pc) == streams[0]


def test_float_cdf_checksum_guard(rng):
    """Float-CDF streams (the legacy cdf_mode="float" fallback — since
    VERDICT r3 item 1 every family defaults to the integer path) carry a
    CDF-checksum trailer: decoding under a different CDF
    program/checkpoint fails loudly instead of range-decoding plausible
    garbage (r2 advisor finding 4)."""
    import dataclasses

    cfg_f = dataclasses.replace(CFG_PPPF, cdf_mode="float")
    ae_params, prob_params = init_params(jax.random.key(11), cfg_f)
    codec_f = Codec(cfg_f, ae_params, prob_params)
    assert not codec_f._integer_cdf
    pc = _cloud(rng, n=cfg_f.N)
    streams = codec_f.compress_many([pc])
    # happy path: same codec decodes
    out = codec_f.decompress_many(streams)
    assert out[0].shape == (cfg_f.S * cfg_f.d ** 2, 3)
    # different checkpoint -> different CDFs -> loud failure
    ae2, prob2 = init_params(jax.random.key(99), cfg_f)
    other = Codec(cfg_f, ae2, prob2)
    with pytest.raises(ValueError, match="CDF checksum mismatch"):
        other.decompress_many(streams)


def test_packed_io_buffer_roundtrip(rng):
    """encode_clouds_packed_io's single uint8 buffer (one tunnel fetch per
    batch — see the codec docstring for the measured multi-fetch stalls)
    unpacks to exactly the fields of the unpacked EncodeResult + integer
    weights, and decode_clouds_packed_io to decode_clouds_packed's pair."""
    import functools

    import jax.numpy as jnp

    from pcc_tpu.codec import (decode_clouds_packed, decode_clouds_packed_io,
                               encode_clouds, encode_clouds_packed_io,
                               init_params, skeleton_pmf_weights,
                               unpack_decode_buffer, unpack_encode_buffer)
    from pcc_tpu.coding.iprob import convert_prob_params

    ae_params, prob_params = init_params(jax.random.key(3), CFG)
    bundle = jax.tree.map(jnp.asarray,
                          convert_prob_params(prob_params, CFG.d, CFG.L))
    B = 3
    pcs = np.stack([_cloud(rng) for _ in range(B)])
    starts = jnp.zeros((B,), jnp.int32)

    res = encode_clouds(ae_params, prob_params, jnp.asarray(pcs), starts,
                        cfg=CFG)
    w_ref = np.asarray(skeleton_pmf_weights(bundle, res.rec_xyz))

    # encode_clouds sees f32 pcs; packed sees the 3x10-bit depack — feed
    # the DEPACKED f32 through encode_clouds so both paths get identical
    # input
    from pcc_tpu.codec import pack_clouds_u10

    q, lo, scale = pack_clouds_u10(pcs)
    v = np.stack([q & 1023, (q >> 10) & 1023, (q >> 20) & 1023],
                 axis=-1).astype(np.float32)
    depacked = v * (scale / 1023.0)[:, None, :] + lo[:, None, :]
    res = encode_clouds(ae_params, prob_params, jnp.asarray(depacked),
                        starts, cfg=CFG)
    w_ref = np.asarray(skeleton_pmf_weights(bundle, res.rec_xyz))

    buf = np.asarray(encode_clouds_packed_io(
        ae_params, prob_params, jnp.asarray(q),
        jnp.asarray(lo), jnp.asarray(scale),
        starts, iprob_bundle=bundle, cfg=CFG))
    sym, w, depth, codes, center, longest = unpack_encode_buffer(buf, cfg=CFG)
    np.testing.assert_array_equal(sym, np.asarray(res.sym))
    np.testing.assert_array_equal(w, w_ref)
    np.testing.assert_array_equal(depth, np.asarray(res.depth))
    np.testing.assert_array_equal(codes, np.asarray(res.sorted_codes))
    np.testing.assert_array_equal(center, np.asarray(res.center))
    np.testing.assert_array_equal(longest, np.asarray(res.longest))

    dq, dscale = decode_clouds_packed(ae_params, res.sym, res.rec_xyz,
                                      cfg=CFG)
    dbuf = np.asarray(decode_clouds_packed_io(ae_params, res.sym,
                                              res.rec_xyz, cfg=CFG))
    q2, scale2 = unpack_decode_buffer(dbuf, CFG.S)
    np.testing.assert_array_equal(q2, np.asarray(dq))
    np.testing.assert_array_equal(scale2, np.asarray(dscale))


def test_packed_bounds_buffer_roundtrip(rng):
    """encode_clouds_packed_bounds (the Codec's default encode program)
    unpacks to the same skeleton fields, and its per-symbol intervals equal
    the host staircase's entries over the weights-path PMF bit-for-bit."""
    import jax.numpy as jnp

    from pcc_tpu.codec import (encode_clouds, encode_clouds_packed_bounds,
                               init_params, skeleton_pmf_weights,
                               unpack_encode_bounds_buffer)
    from pcc_tpu.coding.iprob import convert_prob_params, weights_to_cdf_rows

    ae_params, prob_params = init_params(jax.random.key(3), CFG)
    bundle = jax.tree.map(jnp.asarray,
                          convert_prob_params(prob_params, CFG.d, CFG.L))
    from pcc_tpu.codec import pack_clouds_u10

    B = 3
    pcs = np.stack([_cloud(rng) for _ in range(B)])
    starts = jnp.zeros((B,), jnp.int32)
    q, lo, scale = pack_clouds_u10(pcs)
    v = np.stack([q & 1023, (q >> 10) & 1023, (q >> 20) & 1023],
                 axis=-1).astype(np.float32)
    depacked = v * (scale / 1023.0)[:, None, :] + lo[:, None, :]
    res = encode_clouds(ae_params, prob_params, jnp.asarray(depacked),
                        starts, cfg=CFG)

    buf = np.asarray(encode_clouds_packed_bounds(
        ae_params, prob_params, jnp.asarray(q),
        jnp.asarray(lo), jnp.asarray(scale),
        starts, iprob_bundle=bundle, cfg=CFG))
    (b_start, b_size, depth, codes,
     center, longest) = unpack_encode_bounds_buffer(buf, cfg=CFG)
    np.testing.assert_array_equal(depth, np.asarray(res.depth))
    np.testing.assert_array_equal(codes, np.asarray(res.sorted_codes))
    np.testing.assert_array_equal(center, np.asarray(res.center))
    np.testing.assert_array_equal(longest, np.asarray(res.longest))

    rows = weights_to_cdf_rows(
        np.asarray(skeleton_pmf_weights(bundle, res.rec_xyz)))
    sym = np.asarray(res.sym).astype(np.int64)[..., None]
    want_lo = np.take_along_axis(rows, sym, axis=-1)[..., 0]
    want_hi = np.take_along_axis(rows, sym + 1, axis=-1)[..., 0]
    np.testing.assert_array_equal(b_start.astype(np.int64), want_lo)
    np.testing.assert_array_equal(b_size.astype(np.int64),
                                  want_hi - want_lo)


def test_pack_encode_upload_roundtrip(rng):
    """The single-buffer encode upload (pack_encode_upload) must depack on
    device to exactly the four arrays the 4-transfer path uploaded — the
    packing exists purely to pay ONE tunnel round trip per batch."""
    import jax.numpy as jnp

    from pcc_tpu.codec import (pack_clouds_u10, pack_encode_upload,
                               unpack_encode_upload)

    B, N = 4, 1024
    pcs = (rng.random((B, N, 3)) * 5 - 2).astype(np.float32)
    starts = np.asarray([0, 3, 17, N - 1], np.int32)
    packed = pack_encode_upload(pcs, starts)
    assert packed.dtype == np.uint32 and packed.shape == (B, N + 7)

    q, lo, scale = pack_clouds_u10(pcs)
    uq, ulo, uscale, ustarts = jax.jit(
        lambda p: unpack_encode_upload(p, N))(jnp.asarray(packed))
    np.testing.assert_array_equal(np.asarray(uq), q)
    np.testing.assert_array_equal(np.asarray(ulo), lo)
    np.testing.assert_array_equal(np.asarray(uscale), scale)
    np.testing.assert_array_equal(np.asarray(ustarts), starts)


def test_inflight_gate_adapts(monkeypatch):
    """The adaptive pipeline-depth gate (VERDICT r3 weak #4): a stalled
    slot wait collapses the in-flight cap to 1, sustained fast waits
    restore it, the warmup (compile-tainted) wait is ignored, and
    PCC_INFLIGHT_FIXED pins the legacy fixed depth."""
    from pcc_tpu.codec import _InflightGate

    # the outer environment may pin the gate fixed; this test exercises
    # both modes explicitly (ADVICE r4)
    monkeypatch.delenv("PCC_INFLIGHT_FIXED", raising=False)

    g = _InflightGate(cap=2, stall_s=2.0, recover=2)
    assert g.depth == 2
    g.record(500.0)                 # warmup wait (remote compile): ignored
    assert g.depth == 2 and g.stalls == 0
    g.record(5.0)                   # a real stall -> serialize
    assert g.depth == 1 and g.stalls == 1
    g.record(0.1)
    assert g.depth == 1             # one fast wait is not enough
    g.record(0.1)
    assert g.depth == 2             # recover=2 fast waits restore the cap
    g.record(1.0)                   # mid-range wait resets the fast streak
    g.record(0.1)
    assert g.depth == 2
    g.record(3.0)
    assert g.depth == 1 and g.stalls == 2

    # fixed mode: adaptation off
    monkeypatch.setenv("PCC_INFLIGHT_FIXED", "1")
    gf = _InflightGate(cap=2, stall_s=2.0)
    gf.record(100.0)
    gf.record(100.0)
    assert gf.depth == 2 and gf.stalls == 0


def test_inflight_gate_wait_slot_drains(monkeypatch):
    """wait_slot keeps at most depth-1 pending futures ahead of the next
    append and times the block as the adaptation signal. The stalled
    task sleeps 20x past the stall threshold so scheduler jitter on a
    loaded host cannot flip the stall classification (ADVICE r4)."""
    from concurrent.futures import ThreadPoolExecutor

    from pcc_tpu.codec import _InflightGate

    monkeypatch.delenv("PCC_INFLIGHT_FIXED", raising=False)
    g = _InflightGate(cap=2, stall_s=0.05, recover=2)
    g._warmup = 0
    done = []
    with ThreadPoolExecutor(max_workers=1) as pool:
        futs = []
        for i in range(6):
            g.wait_slot(futs)
            # the 3rd task sleeps far past the stall threshold
            delay = 1.0 if i == 2 else 0.0
            futs.append(pool.submit(
                lambda i=i, d=delay: (__import__("time").sleep(d),
                                      done.append(i))))
        for f in futs:
            f.result()
    assert sorted(done) == list(range(6))
    assert g.stalls >= 1 and g.depth >= 1
