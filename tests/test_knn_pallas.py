"""Fused KNN patch selection kernel (ops/knn_pallas.py).

Contract: the kernel's selected set is EXACTLY the K nearest by
(d2 bits, index) — identical to lax.top_k's stable selection over the
same sq_dists matrix — emitted in ascending-index order, with the
gathered coords bit-equal to the source points. CPU CI runs the exact
kernel under the Pallas interpreter (same gate as the other fused
kernels)."""

import jax
import jax.numpy as jnp
import numpy as np

from pcc_tpu.ops.knn import knn_points
from pcc_tpu.ops.knn_pallas import knn_select_pallas, knn_select_ref


def _run(q, p, K):
    g, idx = jax.jit(
        lambda a, b: knn_select_pallas(a, b, K, interpret=True))(q, p)
    return np.asarray(g), np.asarray(idx)


def test_matches_reference_spec(rng):
    q = rng.random((3, 16, 3)).astype(np.float32)
    p = rng.random((3, 512, 3)).astype(np.float32)
    g, idx = _run(q, p, 64)
    gr, ir = knn_select_ref(q, p, 64)
    np.testing.assert_array_equal(idx, ir)
    np.testing.assert_array_equal(g, gr)


def test_set_equals_top_k(rng):
    """Same selected SET as ops/knn.py::knn_points (lax.top_k) over the
    shared sq_dists bits — the property that keeps codec streams unchanged
    when the kernel replaces top_k."""
    q = rng.random((2, 32, 3)).astype(np.float32)
    p = rng.random((2, 1024, 3)).astype(np.float32)
    _, idx = _run(q, p, 128)
    _, tidx, _ = knn_points(jnp.asarray(q), jnp.asarray(p), 128)
    np.testing.assert_array_equal(idx, np.sort(np.asarray(tidx), axis=-1))


def test_distance_ties_break_by_index(rng):
    """Duplicated points force exact boundary ties; the two-level radix
    search must keep the lowest indices, like stable top_k."""
    q = rng.random((2, 8, 3)).astype(np.float32)
    p = rng.random((2, 256, 3)).astype(np.float32)
    p[:, 128:] = p[:, :128]                      # every point duplicated
    g, idx = _run(q, p, 64)
    _, ir = knn_select_ref(q, p, 64)
    np.testing.assert_array_equal(idx, ir)
    _, tidx, _ = knn_points(jnp.asarray(q), jnp.asarray(p), 64)
    np.testing.assert_array_equal(idx, np.sort(np.asarray(tidx), axis=-1))


def test_n_not_multiple_of_128(rng):
    q = rng.random((2, 8, 3)).astype(np.float32)
    p = rng.random((2, 500, 3)).astype(np.float32)
    g, idx = _run(q, p, 32)
    gr, ir = knn_select_ref(q, p, 32)
    np.testing.assert_array_equal(idx, ir)
    np.testing.assert_array_equal(g, gr)


def test_k_equals_n(rng):
    """K == N selects everything, in index order 0..N-1."""
    q = rng.random((1, 8, 3)).astype(np.float32)
    p = rng.random((1, 128, 3)).astype(np.float32)
    _, idx = _run(q, p, 128)
    np.testing.assert_array_equal(
        idx, np.broadcast_to(np.arange(128, dtype=np.int32), (1, 8, 128)))


def test_encode_latents_unchanged_by_fused_knn(rng, monkeypatch):
    """Codec-level invariance: encode_clouds with fused_knn (interpret)
    produces bit-identical symbols/skeletons to the XLA top_k path —
    patch ORDER differs but every consumer is a max-pooled set network."""
    import dataclasses
    import functools

    from pcc_tpu.codec import encode_clouds, init_params
    from pcc_tpu.config import CodecConfig

    cfg = CodecConfig(N=512, K=64, d=4)
    ae_params, prob_params = init_params(jax.random.key(0), cfg)
    pcs = jnp.asarray(rng.random((3, cfg.N, 3)).astype(np.float32))
    starts = jnp.zeros((3,), jnp.int32)

    res_xla = jax.jit(functools.partial(encode_clouds, cfg=cfg))(
        ae_params, prob_params, pcs, starts)

    cfg_f = dataclasses.replace(cfg, fused_knn=True)
    monkeypatch.setenv("PCC_PALLAS_INTERPRET", "1")
    res_fused = jax.jit(functools.partial(encode_clouds, cfg=cfg_f))(
        ae_params, prob_params, pcs, starts)

    np.testing.assert_array_equal(np.asarray(res_xla.sym),
                                  np.asarray(res_fused.sym))
    np.testing.assert_array_equal(np.asarray(res_xla.sorted_codes),
                                  np.asarray(res_fused.sorted_codes))
    np.testing.assert_array_equal(np.asarray(res_xla.rec_xyz),
                                  np.asarray(res_fused.rec_xyz))
