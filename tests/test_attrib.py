import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcc_tpu.attrib import (
    AttrCodec,
    PatchAttrAE,
    build_attr_train_step,
    init_attr_params,
)
from pcc_tpu.codec import init_params
from pcc_tpu.config import CodecConfig

CFG = CodecConfig(N=512, N0=64, ALPHA=2, K=64, d=8, L=7, sa_knn=8)
D_A = 8


@pytest.fixture(scope="module")
def params():
    ae_p, prob_p = init_params(jax.random.key(0), CFG)
    attr_p, attr_prob_p = init_attr_params(jax.random.key(1), CFG, D_A)
    return {"ae": ae_p, "prob": prob_p,
            "attr": attr_p, "attr_prob": attr_prob_p}


def _colored_cloud(rng, n=CFG.N):
    pc = (rng.random((n, 3)) * 2 - 1).astype(np.float32)
    # color correlated with position (learnable structure)
    rgb = np.clip((pc + 1) / 2 * 255, 0, 255).astype(np.uint8)
    return pc, rgb


def test_attr_ae_shapes(rng, params):
    attr = PatchAttrAE(d_a=D_A, L=CFG.L)
    xyz = jnp.asarray(rng.random((3, CFG.K, 3)).astype(np.float32))
    rgb = jnp.asarray(rng.random((3, CFG.K, 3)).astype(np.float32))
    dec_xyz = jnp.asarray(rng.random((3, CFG.k, 3)).astype(np.float32))
    out, z, z_q = attr.apply(params["attr"], xyz, rgb, dec_xyz)
    assert out.shape == (3, CFG.k, 3)
    assert z.shape == (3, D_A)
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 1).all()  # sigmoid output


def test_attr_codec_cross_instance(rng, params):
    """Both streams (.p.bin AND .a.bin) now ride the integer CDF path by
    default (VERDICT r3 item 1): a stream compressed by one AttrCodec
    decodes byte-exactly under a SECOND instance's fresh compiled
    programs — the guarantee the old float path's crc32 trailer could
    only fail loudly on."""
    codec = AttrCodec(CFG, params, d_a=D_A)
    assert codec._integer_cdf
    pc, rgb = _colored_cloud(rng)
    streams = codec.compress_many([pc], [rgb])
    codec2 = AttrCodec(CFG, params, d_a=D_A)
    (out_pc, out_rgb), = codec2.decompress_many(streams)
    assert out_pc.shape == (CFG.S * CFG.k, 3)
    assert out_rgb.shape == (CFG.S * CFG.k, 3)
    # and the second instance re-encodes to identical bytes
    assert codec2.compress(pc, rgb) == streams[0]


def test_attr_codec_float_mode_checksum_guard(rng, params):
    """Legacy cdf_mode="float" AttrCodec still emits/verifies the crc32
    trailers on both streams."""
    import dataclasses

    cfg_f = dataclasses.replace(CFG, cdf_mode="float")
    codec = AttrCodec(cfg_f, params, d_a=D_A)
    assert not codec._integer_cdf
    pc, rgb = _colored_cloud(rng)
    p, s, c, a = codec.compress(pc, rgb)
    out_pc, out_rgb = codec.decompress(p, s, c, a)
    assert out_pc.shape == (CFG.S * CFG.k, 3)
    # a truncated trailer must fail loudly
    with pytest.raises(ValueError, match="CDF checksum mismatch"):
        codec.decompress(p[:-1] + b"\x00", s, c, a)


def test_attr_codec_roundtrip(rng, params):
    codec = AttrCodec(CFG, params, d_a=D_A)
    pc, rgb = _colored_cloud(rng)
    p, s, c, a = codec.compress(pc, rgb)
    assert len(a) > 0
    out_pc, out_rgb = codec.decompress(p, s, c, a)
    assert out_pc.shape == (CFG.S * CFG.k, 3)
    assert out_rgb.shape == (CFG.S * CFG.k, 3)
    assert out_rgb.dtype == np.uint8
    # total bpp including the attribute stream stays sane
    bpp = 8 * (len(p) + len(s) + len(c) + len(a)) / CFG.N
    assert bpp < 8.0
    # determinism
    p2, s2, c2, a2 = codec.compress(pc, rgb)
    assert (p, s, c, a) == (p2, s2, c2, a2)


def test_attr_train_step(rng, params):
    from pcc_tpu.train.state import TrainState, make_optimizer

    tx = make_optimizer(1e-3, 0.1, 1000, 1000)
    state = TrainState(params=params, opt_state=tx.init(params), step=0)
    step = build_attr_train_step(CFG, tx, d_a=D_A)
    pcs, rgbs = zip(*[_colored_cloud(rng) for _ in range(2)])
    batch = jnp.asarray(np.stack(pcs))
    rgb01 = jnp.asarray(np.stack(rgbs).astype(np.float32) / 255.0)
    losses = []
    key = jax.random.key(3)
    for _ in range(6):
        state, aux = step(state, batch, rgb01, key, 0.0)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # color+geometry loss optimizes
    assert float(aux["color_mse"]) < losses[0]


def test_ply_rgb_roundtrip(tmp_path, rng):
    from pcc_tpu.io import read_point_cloud_attr, save_point_cloud

    pc, rgb = _colored_cloud(rng, 128)
    path = save_point_cloud(pc, "c.ply", path=str(tmp_path), rgb=rgb)
    pc2, rgb2 = read_point_cloud_attr(path)
    np.testing.assert_allclose(pc2, pc, atol=1e-6)
    np.testing.assert_array_equal(rgb2, rgb)
    # plain reader still works on colored files
    from pcc_tpu.io import read_point_cloud
    np.testing.assert_allclose(read_point_cloud(path), pc, atol=1e-6)
    # attr reader returns None for geometry-only files
    path2 = save_point_cloud(pc, "g.ply", path=str(tmp_path))
    _, none_rgb = read_point_cloud_attr(path2)
    assert none_rgb is None


def test_attr_codec_many_matches_single(rng):
    """compress_many/decompress_many must produce the same streams and
    reconstructions as the per-cloud wrappers (same compiled programs:
    both pad to batch_size). Fresh params: the module fixture's arrays are
    donated (deleted) by test_attr_train_step's donate_argnums."""
    ae_p, prob_p = init_params(jax.random.key(0), CFG)
    attr_p, attr_prob_p = init_attr_params(jax.random.key(1), CFG, D_A)
    fresh = {"ae": ae_p, "prob": prob_p,
             "attr": attr_p, "attr_prob": attr_prob_p}
    codec = AttrCodec(CFG, fresh, d_a=D_A, batch_size=4)
    clouds, rgbs = zip(*[_colored_cloud(rng) for _ in range(3)])
    streams = codec.compress_many(list(clouds), list(rgbs))
    for pc, rgb, st in zip(clouds, rgbs, streams):
        assert st == codec.compress(pc, rgb)
    outs = codec.decompress_many(streams)
    for st, (pc_o, rgb_o) in zip(streams, outs):
        pc_1, rgb_1 = codec.decompress(*st)
        np.testing.assert_array_equal(pc_o, pc_1)
        np.testing.assert_array_equal(rgb_o, rgb_1)
        assert rgb_o.dtype == np.uint8
