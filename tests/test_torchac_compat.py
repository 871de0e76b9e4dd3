"""torchac bitstream compatibility layer (coding/torchac_compat.py).

torchac itself is not installable here (SURVEY §2.4), so the pinned
pure-python re-implementation IS the compatibility contract (VERDICT r2
item 9): these tests freeze it — encoder/decoder must invert each other
bit-exactly over adversarial distributions, and a reference-style archive
(torchac .p.bin + reference-layout .s.bin/.c.bin) must round-trip through
`decompress --format torchac`."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcc_tpu.coding import torchac_compat as tc


def _random_cdf(rng, n, L, concentrated=False):
    logits = rng.standard_normal((n, L)) * (8.0 if concentrated else 1.0)
    pmf = np.exp(logits - logits.max(-1, keepdims=True))
    pmf = pmf / pmf.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros((n, 1)), np.cumsum(pmf, -1)], axis=-1)
    return np.minimum(cdf, 1.0), pmf


@pytest.mark.parametrize("L,n,conc", [(7, 512, False), (7, 2048, True),
                                      (33, 257, False), (2, 100, True)])
def test_roundtrip(rng, L, n, conc):
    cdf, pmf = _random_cdf(rng, n, L, conc)
    syms = np.stack([rng.choice(L, p=pmf[i]) for i in range(n)]).astype(
        np.int16)
    blob = tc.encode_float_cdf(cdf, syms)
    back = tc.decode_float_cdf(cdf, blob)
    np.testing.assert_array_equal(back, syms)


def test_rate_is_near_entropy(rng):
    """The coder's output length approaches the source entropy — evidence
    the interval arithmetic is right, not just invertible."""
    cdf, pmf = _random_cdf(rng, 8192, 7, concentrated=True)
    syms = np.stack([rng.choice(7, p=pmf[i]) for i in range(8192)]).astype(
        np.int16)
    blob = tc.encode_float_cdf(cdf, syms)
    h = -np.log2(pmf[np.arange(8192), syms]).sum()
    assert h <= len(blob) * 8 <= h * 1.05 + 64, (len(blob) * 8, h)


def test_worst_case_symbols(rng):
    """Lowest/highest symbols and degenerate nearly-deterministic rows."""
    L = 7
    pmf = np.full((64, L), 1e-6)
    pmf[:, 3] = 1.0
    pmf /= pmf.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros((64, 1)), np.cumsum(pmf, -1)], -1)
    for fill in (0, 3, L - 1):
        syms = np.full(64, fill, np.int16)
        blob = tc.encode_float_cdf(cdf, syms)
        np.testing.assert_array_equal(tc.decode_float_cdf(cdf, blob), syms)


def _torchac_int16_emulation(cdf_float):
    """Literal transcription of torchac.py _convert_to_int_and_normalize
    (needs_normalization=True) + the C++ backend's uint16 reinterpret:
    float32 multiply, float32 round, int16 cast (wrapping above 32767),
    int16 += arange (wrapping), bits viewed as uint16."""
    cdf_float = np.asarray(cdf_float, dtype=np.float32)
    Lp = cdf_float.shape[-1]
    new_max = np.float32(2.0 ** 16) - np.float32(Lp - 1)
    with np.errstate(invalid="ignore"):
        scaled = np.round(cdf_float * new_max)
    c = scaled.astype(np.int16)                      # wraps, as torch .to()
    c = (c + np.arange(Lp, dtype=np.int16)).astype(np.int16)
    return c.view(np.uint16)


def test_quantize_matches_torchac_formula(rng):
    cdf, _ = _random_cdf(rng, 4, 7)
    q = tc.quantize_cdf_torchac(cdf)
    Lp = 8
    # the scale multiply is FLOAT32, as torchac's tensor op is — see the
    # f32-vs-f64 divergence test below for why this matters
    expect = np.round(cdf.astype(np.float32) * np.float32(65536 - (Lp - 1))) \
        .astype(np.int64) + np.arange(Lp)
    np.testing.assert_array_equal(q, expect)
    assert (np.diff(q, axis=-1) >= 1).all()


def test_quantize_f32_boundary_vectors():
    """Adversarial quantization vectors (VERDICT r3 item 7): CDF values
    whose f32 product with the scale rounds DIFFERENTLY than the f64
    product. torchac multiplies in float32 (torchac.py
    _convert_to_int_and_normalize runs on a float32 tensor); a
    re-implementation that 'upgrades' to float64 silently desyncs from
    real torchac on exactly these inputs. The vectors must (a) exist in
    quantity, (b) quantize to the f32 answer, (c) still round-trip."""
    Lp = 3
    m = np.float32(65536 - (Lp - 1))
    divergent = []
    for k in range(1, 65533):
        # v targets the k+0.5 rounding boundary of the product grid
        v = np.float32((k + 0.5) / float(m))
        if not (0.0 < float(v) < 1.0):
            continue
        f32_round = float(np.round(np.float32(v * m)))
        f64_round = float(np.round(np.float64(v) * np.float64(m)))
        if f32_round != f64_round:
            divergent.append((v, f32_round))
        if len(divergent) >= 64:
            break
    assert len(divergent) >= 64, "no f32/f64 divergent quantization inputs"

    vs = np.array([v for v, _ in divergent], np.float32)
    cdf = np.stack([np.zeros_like(vs), vs, np.ones_like(vs)], axis=-1)
    q = tc.quantize_cdf_torchac(cdf)
    want_mid = np.array([r for _, r in divergent], np.int64) + 1  # +arange[1]
    np.testing.assert_array_equal(q[:, 1], want_mid)

    # and the full coder still inverts streams over these boundary rows
    syms = (np.arange(len(vs)) % 2).astype(np.int16)
    blob = tc.encode_float_cdf(cdf, syms)
    np.testing.assert_array_equal(tc.decode_float_cdf(cdf, blob), syms)


def test_quantize_matches_int16_wraparound_semantics(rng):
    """torchac stores the quantized CDF as int16 (wrapping above 32767)
    and its C++ backend reinterprets the bits as uint16. Our int64
    staircase must equal that pipeline mod 2^16 at every entry the coder
    reads (0..Lp-2) — including rows deep in the wrap region (cdf near
    1.0, quantized values > 32767)."""
    for L, conc in ((7, False), (7, True), (33, True), (2, False)):
        cdf, _ = _random_cdf(rng, 256, L, concentrated=conc)
        q = tc.quantize_cdf_torchac(cdf)
        emu = _torchac_int16_emulation(cdf)
        np.testing.assert_array_equal(
            (q[..., :-1] % 65536).astype(np.uint16), emu[..., :-1])
        assert (q[..., :-1] > 32767).any(), "wrap region not exercised"


def test_renormalization_underflow_chains(rng):
    """CDFs engineered to straddle the coder's midpoint keep low/high in
    the E3 underflow region (low >= 1/4, high < 3/4) for long runs —
    the pending-bit carry chain is where WNC variants disagree."""
    L = 2
    n = 4096
    eps = 1.0 / 65536.0
    for p0 in (0.5, 0.5 - eps, 0.5 + eps, 0.5 - eps / 2):
        cdf = np.tile(np.array([[0.0, p0, 1.0]], np.float32), (n, 1))
        for pattern in ("alt", "zero", "one"):
            if pattern == "alt":
                syms = (np.arange(n) % 2).astype(np.int16)
            else:
                syms = np.full(n, 0 if pattern == "zero" else 1, np.int16)
            blob = tc.encode_float_cdf(cdf, syms)
            np.testing.assert_array_equal(
                tc.decode_float_cdf(cdf, blob), syms,
                err_msg=f"p0={p0} pattern={pattern}")


def test_final_flush_all_lengths(rng):
    """Termination + pending-bit flush at every bit offset: streams of
    1..64 symbols over skewed rows hit each byte-boundary case of the
    final flush."""
    cdf, pmf = _random_cdf(rng, 64, 5, concentrated=True)
    syms = np.stack([rng.choice(5, p=pmf[i]) for i in range(64)]).astype(
        np.int16)
    for n in range(1, 65):
        blob = tc.encode_float_cdf(cdf[:n], syms[:n])
        np.testing.assert_array_equal(
            tc.decode_float_cdf(cdf[:n], blob), syms[:n], err_msg=str(n))


def test_frozen_stream_fixture():
    """Golden bytes: the pinned coder's output for a fixed input is frozen
    here. Any change to the quantization or coder math (even one that
    still round-trips internally) breaks previously written torchac
    archives — this fixture makes that loud."""
    g = np.random.default_rng(1234)
    logits = g.standard_normal((32, 5)).astype(np.float32) * 2
    pmf = np.exp(logits - logits.max(-1, keepdims=True))
    pmf = pmf / pmf.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros((32, 1), np.float32),
                          np.cumsum(pmf, -1)], axis=-1)
    cdf = np.minimum(cdf, 1.0)
    syms = (np.arange(32) % 5).astype(np.int16)
    blob = tc.encode_float_cdf(cdf, syms)
    assert blob.hex() == FROZEN_STREAM_HEX, (
        "torchac-compat bitstream contract changed: " + blob.hex())
    np.testing.assert_array_equal(tc.decode_float_cdf(cdf, blob), syms)


# computed once from the pinned implementation and frozen (see
# test_frozen_stream_fixture)
FROZEN_STREAM_HEX = "00ceb629cd88a718b494abad81e42d04f33980"


def test_compress_cli_writes_reference_style_archive(tmp_path, rng):
    """`compress --format torchac` -> `decompress --format torchac`
    round-trips through the CLIs, and the written .p.bin is bit-exactly
    what torchac's float-CDF coder produces for the encoded symbols —
    i.e. an archive the reference's own decompress.py can read
    (bidirectional interop; VERDICT r2 item 9 covered decode only)."""
    from pcc_tpu.cli import compress as comp_cli
    from pcc_tpu.cli import decompress as dec_cli
    from pcc_tpu.codec import decode_cloud, encode_cloud, init_params
    from pcc_tpu.codec import make_models
    from pcc_tpu.coding.pmf import pmf_to_cdf
    from pcc_tpu.config import CodecConfig
    from pcc_tpu.io import read_point_cloud, save_point_cloud
    from pcc_tpu.train.checkpoint import _dump

    cfg = CodecConfig(N=256, N0=64, ALPHA=2, K=32, d=4, L=7)
    ae_params, prob_params = init_params(jax.random.key(1), cfg)
    model_dir = tmp_path / "model"
    os.makedirs(model_dir)
    _dump(ae_params, str(model_dir / "ae.pkl"))
    _dump(prob_params, str(model_dir / "prob.pkl"))

    pc = (rng.random((cfg.N, 3)) * 2 - 1).astype(np.float32)
    save_point_cloud(pc, "cloud.ply", path=str(tmp_path / "in"))

    flags = ["--N0", "64", "--ALPHA", "2", "--K", "32", "--d", "4", "--L", "7"]
    comp = tmp_path / "comp"
    comp_cli.main([str(tmp_path / "in" / "*.ply"), str(comp), str(model_dir),
                   "--format", "torchac", *flags])

    # the .p.bin bytes must be exactly torchac's encoding of our symbols
    res = encode_cloud(ae_params, prob_params, jnp.asarray(pc),
                       jnp.asarray(0), cfg=cfg)
    _, prob = make_models(cfg)
    cdf = np.asarray(pmf_to_cdf(prob.apply(prob_params, res.rec_xyz[None])[0]))
    expect_p = tc.encode_float_cdf(cdf, np.asarray(res.sym, np.int16))
    assert (comp / "cloud.ply.p.bin").read_bytes() == expect_p

    out = tmp_path / "decomp"
    dec_cli.main([str(comp), str(out), str(model_dir), "--format", "torchac",
                  *flags])
    dec = read_point_cloud(str(out / "cloud.ply.bin.ply"))
    ref = np.asarray(decode_cloud(ae_params, res.sym, res.rec_xyz,
                                  res.center, res.longest, cfg=cfg))
    np.testing.assert_allclose(dec, ref, atol=1e-5)


def test_decompress_cli_reads_reference_style_archive(tmp_path, rng):
    """Synthesize an archive exactly as the reference writes it (torchac
    .p.bin under float CDFs from the prob model, reference-layout .s.bin,
    float32[4] .c.bin: compress.py:131-152) and decode it with
    `decompress --format torchac`."""
    from pcc_tpu.cli import decompress as dec_cli
    from pcc_tpu.codec import encode_cloud, init_params
    from pcc_tpu.coding.octree_host import emit_octree_bits, pack_bits
    from pcc_tpu.coding.pmf import pmf_to_cdf
    from pcc_tpu.codec import make_models
    from pcc_tpu.config import CodecConfig
    from pcc_tpu.io import read_point_cloud
    from pcc_tpu.train.checkpoint import _dump

    cfg = CodecConfig(N=256, N0=64, ALPHA=2, K=32, d=4, L=7, sa_knn=8)
    ae_params, prob_params = init_params(jax.random.key(0), cfg)
    model_dir = tmp_path / "model"
    os.makedirs(model_dir)
    _dump(ae_params, str(model_dir / "ae.pkl"))
    _dump(prob_params, str(model_dir / "prob.pkl"))

    pc = (rng.random((cfg.N, 3)) * 2 - 1).astype(np.float32)
    res = encode_cloud(ae_params, prob_params, jnp.asarray(pc),
                       jnp.asarray(0), cfg=cfg)

    # reference-style .p.bin: torchac stream under the float CDF
    _, prob = make_models(cfg)
    pmf = np.asarray(prob.apply(prob_params, res.rec_xyz[None])[0])
    cdf = np.asarray(pmf_to_cdf(jnp.asarray(pmf)))
    p_bin = tc.encode_float_cdf(cdf, np.asarray(res.sym, np.int16))
    codes = np.asarray(res.sorted_codes, np.int64) >> (
        3 * (cfg.max_depth - int(res.depth)))
    s_bin = pack_bits(emit_octree_bits(codes, int(res.depth)))
    header = np.zeros(4, np.float32)
    header[:3] = np.asarray(res.center)
    header[3] = float(res.longest)

    comp = tmp_path / "comp"
    os.makedirs(comp)
    (comp / "cloud.ply.p.bin").write_bytes(p_bin)
    (comp / "cloud.ply.s.bin").write_bytes(s_bin)
    (comp / "cloud.ply.c.bin").write_bytes(header.tobytes())

    out = tmp_path / "decomp"
    dec_cli.main([str(comp), str(out), str(model_dir), "--format", "torchac",
                  "--N0", "64", "--ALPHA", "2", "--K", "32", "--d", "4",
                  "--L", "7"])
    dec = read_point_cloud(str(out / "cloud.ply.bin.ply"))
    assert dec.shape == (cfg.S * cfg.k, 3)
    # must equal OUR decode of the same symbols (bit-exact symbol recovery)
    from pcc_tpu.codec import decode_cloud
    ref = np.asarray(decode_cloud(ae_params, res.sym, res.rec_xyz,
                                  res.center, res.longest, cfg=cfg))
    np.testing.assert_allclose(dec, ref, atol=1e-5)
