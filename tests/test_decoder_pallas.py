"""Interpret-mode coverage for the fused Pallas patch decoder
(ops/decoder_pallas.py), mirroring tests/test_sa_pallas.py: CPU CI executes
the exact kernel the TPU runs and pins it against the XLA decode path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcc_tpu.models.ipdae import PatchAE
from pcc_tpu.ops.decoder_pallas import patch_decoder_fused, permute_expansion


def _make_model_and_wb(rng, K=32, k=16, d=4, dtype=None):
    model = PatchAE(K=K, k=k, d=d, L=7, sa_knn=8, dtype=dtype)
    x = jnp.asarray(rng.random((2, K, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    p = variables["params"]
    inv_pool_wb = [(p[f"inv_pool_{i}"]["linear"]["kernel"],
                    p[f"inv_pool_{i}"]["linear"]["bias"]) for i in range(3)]
    inv_mlp_wb = [(p["inv_mlp"][f"dense_{i}"]["linear"]["kernel"],
                   p["inv_mlp"][f"dense_{i}"]["linear"]["bias"])
                  for i in range(4)]
    return model, variables, inv_pool_wb, inv_mlp_wb


@pytest.mark.parametrize("P,block_p,block_k", [(8, 4, 4), (5, 4, 16), (6, 8, 3)])
def test_decoder_fused_matches_xla(rng, P, block_p, block_k):
    """Fused kernel == module decode, incl. row padding and block_k
    clamping to a divisor of k."""
    model, variables, pool_wb, mlp_wb = _make_model_and_wb(rng)
    lat = jnp.asarray(
        rng.integers(-3, 4, (P, model.d)).astype(np.float32))
    ref = np.asarray(model.apply(variables, lat, method="decode"))
    out = np.asarray(patch_decoder_fused(
        lat, pool_wb, mlp_wb, k=model.k, block_p=block_p, block_k=block_k,
        interpret=True))
    assert out.shape == (P, model.k, 3)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_decoder_fused_bf16(rng):
    model, variables, pool_wb, mlp_wb = _make_model_and_wb(
        rng, dtype=jnp.bfloat16)
    lat = jnp.asarray(rng.integers(-3, 4, (8, model.d)).astype(np.float32))
    ref = np.asarray(model.apply(variables, lat, method="decode"))
    out = np.asarray(patch_decoder_fused(
        lat, pool_wb, mlp_wb, k=model.k, compute_dtype=jnp.bfloat16,
        block_p=4, block_k=4, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)


def test_permute_expansion_is_fold_transpose(rng):
    """Column permutation reproduces the reference's [B, 128, k] view +
    transpose (AE.py:49) slot by slot."""
    k = 8
    w3 = jnp.asarray(rng.standard_normal((16, 128 * k)).astype(np.float32))
    b3 = jnp.asarray(rng.standard_normal(128 * k).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((3, 16)).astype(np.float32))
    act = x @ w3 + b3                                        # [3, k*128] raw
    fold_ref = jnp.transpose(act.reshape(3, 128, k), (0, 2, 1))  # [3, k, 128]
    w3r, b3r = permute_expansion(w3, b3, k)
    act_r = x @ w3r + b3r
    for t in range(k):
        np.testing.assert_allclose(
            np.asarray(act_r[:, t * 128:(t + 1) * 128]),
            np.asarray(fold_ref[:, t]), atol=1e-5)


def test_fused_decode_param_tree_identical(rng):
    """PatchAE(fused_decode=True).decode probes the exact same parameter tree
    as the XLA path, so checkpoints are interchangeable; off-TPU the fused
    module falls back to XLA decode bit-exactly."""
    K, k, d = 32, 16, 4
    x = jnp.asarray(rng.random((2, K, 3)).astype(np.float32))
    v_plain = PatchAE(K=K, k=k, d=d, sa_knn=8).init(
        jax.random.key(1), x)
    v_fused = PatchAE(K=K, k=k, d=d, sa_knn=8, fused_decode=True).init(
        jax.random.key(1), x)
    assert jax.tree.structure(v_plain) == jax.tree.structure(v_fused)
    for a, b in zip(jax.tree.leaves(v_plain), jax.tree.leaves(v_fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    lat = jnp.asarray(rng.integers(-3, 4, (5, d)).astype(np.float32))
    out_f = PatchAE(K=K, k=k, d=d, sa_knn=8, fused_decode=True).apply(
        v_fused, lat, method="decode")
    out_p = PatchAE(K=K, k=k, d=d, sa_knn=8).apply(
        v_plain, lat, method="decode")
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_p))


def test_decode_clouds_packed_matches_per_cloud(rng):
    """The flattened batched decode (codec.decode_clouds_packed) equals the
    per-cloud packed decode it replaced."""
    from pcc_tpu.codec import (decode_cloud_packed, decode_clouds_packed,
                               init_params)
    from pcc_tpu.config import CodecConfig

    cfg = CodecConfig(N=256, K=32, d=4)
    ae_params, _ = init_params(jax.random.key(0), cfg)
    B, S = 3, cfg.S
    sym = jnp.asarray(rng.integers(0, cfg.L, (B, S, cfg.d)).astype(np.int16))
    rec = jnp.asarray(rng.random((B, S, 3)).astype(np.float32))
    qb, scb = decode_clouds_packed(ae_params, sym, rec, cfg=cfg)
    for i in range(B):
        q, sc = decode_cloud_packed(ae_params, sym[i], rec[i], cfg=cfg)
        np.testing.assert_array_equal(np.asarray(qb[i]), np.asarray(q))
        np.testing.assert_allclose(np.asarray(scb[i]), np.asarray(sc),
                                   atol=1e-7)


def test_packed_decode_reconstruction_error_is_negligible(rng):
    """The int8 skeleton-delta transfer reconstructs the decoded cloud to
    ~scale/127 per patch — over an order of magnitude below the codec's
    operating RMSE (see decode_clouds_packed)."""
    from pcc_tpu.codec import (decode_cloud, decode_clouds_packed,
                               init_params)
    from pcc_tpu.config import CodecConfig

    cfg = CodecConfig(N=256, K=32, d=4)
    ae_params, _ = init_params(jax.random.key(0), cfg)
    B, S = 3, cfg.S
    sym = jnp.asarray(rng.integers(0, cfg.L, (B, S, cfg.d)).astype(np.int16))
    rec = jnp.asarray(rng.random((B, S, 3)).astype(np.float32) * 0.8 + 0.1)
    q, sc = decode_clouds_packed(ae_params, sym, rec, cfg=cfg)
    q, sc, recn = np.asarray(q), np.asarray(sc), np.asarray(rec)
    pc01 = (q.astype(np.float32) * (sc / 127.0)[:, :, None, :]
            + recn[:, :, None, :]).reshape(B, -1, 3)
    for i in range(B):
        # exact (unpacked) decode in normalized coords: denormalize with
        # identity header (center 0.5 in pc01 space handled via margin=0)
        exact = np.asarray(decode_cloud(
            ae_params, sym[i], rec[i], jnp.zeros(3), jnp.asarray(1.0),
            cfg=cfg))
        # decode_cloud denormalizes; invert it to compare in pc01 space
        exact01 = exact * (1.0 - cfg.margin) + 0.5
        err = np.abs(pc01[i] - exact01).max()
        assert err <= np.max(sc) / 127.0 + 1e-6, err
