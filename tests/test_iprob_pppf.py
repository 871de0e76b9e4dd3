"""Deterministic integer inference for the PPPF conditional probability
model (coding/iprob_pppf.py).

Same contract as tests/test_iprob.py, extended to the PN++ backbone: one
converted bundle must yield bit-identical uint16 PMF weights from the
numpy spec and any compiled JAX program (different shapes, vmap), because
the PPPF family's streams get the identical cross-topology decodability
guarantee as IPDAE's (VERDICT r3 item 1; reference contract
decompress.py:88-93). The extra machinery under test vs iprob.py:
integer-deterministic FPS/ball-query selection and BatchNorm folding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcc_tpu.codec import init_params
from pcc_tpu.coding.iprob import weights_to_cdf_rows
from pcc_tpu.coding.iprob_pppf import (
    _fold_layers,
    _mirror_forward,
    convert_pppf_prob_params,
    pppf_pmf_weights,
    pppf_pmf_weights_np,
)
from pcc_tpu.config import CodecConfig

CFG = CodecConfig(N=512, K=64, d=4, L=7, model="PPPF-AE")  # S = 16


@pytest.fixture(scope="module")
def bundle_and_params():
    _, prob_params = init_params(jax.random.key(3), CFG)
    bundle = convert_pppf_prob_params(prob_params, CFG.d, CFG.L,
                                      n_calib=4, S=CFG.S)
    return prob_params, bundle


def _skeletons(rng, B, S=CFG.S):
    # voxel-center-like inputs: exact (i + 0.5) / 2^depth grid points
    depth = 6
    ijk = rng.integers(0, 1 << depth, (B, S, 3))
    return ((ijk + 0.5) / (1 << depth)).astype(np.float32)


def test_numpy_vs_jax_bit_exact(bundle_and_params, rng):
    _, bundle = bundle_and_params
    rec = _skeletons(rng, 2)
    w_np = pppf_pmf_weights_np(bundle, rec)
    w_jx = np.asarray(pppf_pmf_weights(
        jax.tree.map(jnp.asarray, bundle), jnp.asarray(rec)))
    np.testing.assert_array_equal(w_np, w_jx)


def test_cross_compilation_bit_exact(bundle_and_params, rng):
    """Different compiled programs (batch shapes, vmap over the integer
    FPS fori_loop and the top_k ball query) agree byte-for-byte."""
    _, bundle = bundle_and_params
    dev_bundle = jax.tree.map(jnp.asarray, bundle)
    rec = _skeletons(rng, 3)

    f_b3 = jax.jit(lambda r: pppf_pmf_weights(dev_bundle, r))
    f_b1 = jax.jit(lambda r: pppf_pmf_weights(dev_bundle, r))
    f_vm = jax.jit(jax.vmap(
        lambda r: pppf_pmf_weights(dev_bundle, r[None])[0]))

    w3 = np.asarray(f_b3(jnp.asarray(rec)))
    w1 = np.asarray(f_b1(jnp.asarray(rec[1:2])))
    wv = np.asarray(f_vm(jnp.asarray(rec)))
    np.testing.assert_array_equal(w3[1], w1[0])
    np.testing.assert_array_equal(w3, wv)


def test_cdf_rows_are_valid(bundle_and_params, rng):
    _, bundle = bundle_and_params
    w = pppf_pmf_weights_np(bundle, _skeletons(rng, 2))
    rows = weights_to_cdf_rows(w).reshape(-1, CFG.L + 1)
    assert rows.dtype == np.int32
    assert (rows[:, 0] == 0).all()
    assert (rows[:, -1] == (1 << 16) - 1).all()
    assert (np.diff(rows, axis=-1) >= 1).all()   # every bin non-empty


def test_integer_pmf_tracks_mirror_pmf(bundle_and_params, rng):
    """Rate sanity against the BN-folded float mirror (which shares the
    integer selection, so the comparison isolates quantization noise):
    cross-entropy gap well under 1% of the symbol entropy."""
    prob_params, bundle = bundle_and_params
    rec = _skeletons(rng, 2)
    w = pppf_pmf_weights_np(bundle, rec).astype(np.float64)
    p_int = w / w.sum(axis=-1, keepdims=True)

    stages_wb, mlp_wb = _fold_layers(prob_params)
    logits, _ = _mirror_forward(stages_wb, mlp_wb, rec)
    z = logits.reshape(*p_int.shape)
    z = z - z.max(axis=-1, keepdims=True)
    p_f = np.exp(z) / np.exp(z).sum(axis=-1, keepdims=True)

    ce = -(p_f * np.log2(np.maximum(p_int, 1e-12))).sum(-1)
    h = -(p_f * np.log2(np.maximum(p_f, 1e-12))).sum(-1)
    assert (ce - h).mean() < 0.01 * max(h.mean(), 0.1), (ce.mean(), h.mean())


def test_integer_selection_contracts(rng):
    """The selection primitives' numpy spec == JAX twin on adversarial
    inputs (duplicated points force distance ties that only the composite
    index key resolves; npoint/K beyond n exercises the saturation pads)."""
    from pcc_tpu.coding.iprob_pppf import (
        _int_ball_jnp, _int_ball_np, _int_fps_jnp, _int_fps_np)

    pts = rng.integers(0, 64, (2, 16, 3)).astype(np.int32)
    pts[0, 8:] = pts[0, :8]          # exact duplicates -> distance ties
    inf = 3 * 64 * 64 + 1

    for npoint in (8, 16, 24):       # < n, == n path is caller-side, > n
        f_np = _int_fps_np(pts, npoint, inf)
        f_jx = np.asarray(_int_fps_jnp(jnp.asarray(pts), npoint, inf))
        np.testing.assert_array_equal(f_np, f_jx)

    centers = pts[:, :4]
    for K, r in ((4, 10), (16, 10), (32, 200)):   # K > n pads with 0
        b_np = _int_ball_np(centers, pts, K, r * r, 16)
        b_jx = np.asarray(_int_ball_jnp(jnp.asarray(centers),
                                        jnp.asarray(pts), K, r * r, 16))
        np.testing.assert_array_equal(b_np, b_jx)


def test_codec_roundtrip_pppf_integer_mode(rng):
    """Full PPPF Codec roundtrip on the integer CDF path (now the default
    for PPPF too), decoding under a SECOND Codec instance — fresh compiled
    programs, the property the float path's crc32 trailer only FAILED
    loudly on (VERDICT r3: the trailer is now a legacy fallback)."""
    from pcc_tpu.codec import Codec

    ae_params, prob_params = init_params(jax.random.key(0), CFG)
    clouds = [(rng.random((CFG.N, 3)).astype(np.float32) * 2 - 1)
              for _ in range(3)]
    codec = Codec(CFG, ae_params, prob_params, batch_size=2)
    assert codec._integer_cdf
    streams = codec.compress_many(clouds)
    codec2 = Codec(CFG, ae_params, prob_params, batch_size=2)
    outs = codec2.decompress_many(streams)
    for pc, out in zip(clouds, outs):
        assert out.shape == (CFG.S * CFG.d ** 2, 3)
        assert np.isfinite(out).all()
        assert np.abs(out - pc.mean(0)).max() < 10.0
    # determinism across instances
    assert codec2.compress(clouds[0]) == streams[0]
