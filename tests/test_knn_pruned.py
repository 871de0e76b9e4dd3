"""Morton-chunk-pruned exact KNN (ops/knn_pruned.py).

Contract (module docstring "precision contract"): the pruned path
matches ops/knn.py::knn_points — same neighbor coords, same ascending-
(d2, index) order, same lower-index-first distance-tie rule — up to XLA
cross-program fusion noise in the shared expanded-form d2. So:

  * in float64, where that noise vanishes, parity is BIT-IDENTICAL,
    including through the certificate, the top-up pass, the overflow
    backstop, ragged N, and exact distance ties — that pins the pruning
    logic itself;
  * in float32, any disagreement must be confined to near-tied boundary
    neighbors (verified against float64 ground truth), which patch
    consumers (max-pooled set networks) and the codec absorb.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pcc_tpu.ops.knn import knn_points
from pcc_tpu.ops.knn_pruned import knn_grouped_pruned


def _assert_parity_x64(q, p, K, **kw):
    with jax.enable_x64(True):
        qj, pj = jnp.asarray(q, jnp.float64), jnp.asarray(p, jnp.float64)
        _, idx_ref, nn_ref = knn_points(qj, pj, K, return_nn=True)
        nn, idx = jax.jit(
            lambda a, b: knn_grouped_pruned(a, b, K, **kw))(qj, pj)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
        np.testing.assert_array_equal(np.asarray(nn), np.asarray(nn_ref))


def _mixture(rng, B, N):
    """Gaussian-blob clouds (the bench generator's shape): FPS-style
    outlier queries over these produce real certificate failures."""
    cs = (rng.random((B, 16, 3)) * 4 - 1).astype(np.float32)
    pts = (np.take_along_axis(cs, rng.integers(0, 16, (B, N, 1)), 1)
           + rng.standard_normal((B, N, 3)).astype(np.float32) * 0.15)
    mn, mx = pts.min(1, keepdims=True), pts.max(1, keepdims=True)
    return ((pts - mn) / (mx - mn).max(-1, keepdims=True)).astype(np.float32)


def test_parity_mixture_clouds_x64(rng):
    p = _mixture(rng, 4, 2048)
    q = np.take_along_axis(
        p, rng.integers(0, 2048, (4, 16))[..., None], 1)
    _assert_parity_x64(q, p, 64, m_chunks=8)


def test_parity_sphere_surface_x64(rng):
    v = rng.standard_normal((2, 2048, 3)).astype(np.float32)
    p = v / np.linalg.norm(v, axis=-1, keepdims=True) * 0.5 + 0.5
    _assert_parity_x64(p[:, :16], p, 128, m_chunks=8)


def test_parity_distance_ties_x64(rng):
    """Duplicated points make every distance exactly tied pairwise (bit-
    equal in f64 too); tie resolution must match top_k's lower-index-
    first rule through both the candidate sort and the top-up path."""
    p = _mixture(rng, 3, 2048)
    pd = p.copy()
    pd[:, 1024:] = pd[:, :1024]
    _assert_parity_x64(p[:, :16], pd, 64, m_chunks=6)
    # grid-quantized coords: ties between DISTINCT points
    pg = (np.round(p * 31) / 31).astype(np.float32)
    _assert_parity_x64(pg[:, :16], pg, 64, m_chunks=6)


def test_parity_ragged_n_x64(rng):
    p = _mixture(rng, 2, 1000)  # pads 1000 -> 1024 internally
    _assert_parity_x64(p[:, :8], p, 64, m_chunks=6)


def test_topup_overflow_backstop_x64(rng):
    """topup_rows smaller than the failure count forces the whole-batch
    lax.cond fallback — still bit-exact."""
    p = _mixture(rng, 4, 2048)
    q = np.take_along_axis(
        p, rng.integers(0, 2048, (4, 32))[..., None], 1)
    _assert_parity_x64(q, p, 64, m_chunks=4, topup_rows=1)


def test_unprunable_shapes_fall_back(rng):
    # too few chunks to exclude anything -> knn_points delegation
    p = _mixture(rng, 2, 256)
    _assert_parity_x64(p[:, :4], p, 64)
    # K == N
    _assert_parity_x64(p[:, :4], p, 256)


def test_f32_disagreements_are_boundary_noise_only(rng):
    """In float32 the two compiled programs may rank near-tied neighbors
    differently (expanded-form d2 cancellation noise — the same
    noise knn_points shows across its own recompilations). Any element
    in the set difference must sit within noise of the row's K-boundary
    distance, measured against float64 ground truth."""
    p = _mixture(rng, 4, 2048)
    q = np.take_along_axis(
        p, rng.integers(0, 2048, (4, 16))[..., None], 1)
    K = 64
    _, idx_ref, _ = knn_points(jnp.asarray(q), jnp.asarray(p), K)
    _, idx = jax.jit(
        lambda a, b: knn_grouped_pruned(a, b, K, m_chunks=8))(
        jnp.asarray(q), jnp.asarray(p))
    idx, idx_ref = np.asarray(idx), np.asarray(idx_ref)
    q64, p64 = q.astype(np.float64), p.astype(np.float64)
    for b in range(4):
        for s in range(16):
            a, r = set(idx[b, s].tolist()), set(idx_ref[b, s].tolist())
            if a == r:
                continue
            d64 = ((q64[b, s] - p64[b]) ** 2).sum(-1)
            d_K = np.sort(d64)[K - 1]
            for i in a.symmetric_difference(r):
                assert abs(d64[i] - d_K) < 1e-5 * (1.0 + d_K), \
                    f"non-boundary disagreement at row ({b},{s}), idx {i}"


def test_codec_streams_unchanged(rng):
    """pruned_knn on vs off produces byte-identical archives on this
    build (same-process compilations of both paths rank every boundary
    pair identically here; a compiler upgrade could legitimately flip a
    near-tie — that would change re-encoded bytes, never decodability or
    quality)."""
    from pcc_tpu.codec import Codec, init_params
    from pcc_tpu.config import CodecConfig

    # N=2048/K=64: C=32 chunks > M+1=25, so the pruned path is really
    # active (not the trace-time fallback)
    cfg = CodecConfig(N=2048, K=64, d=8, L=7)
    assert cfg.pruned_knn
    ae_params, prob_params = init_params(jax.random.key(11), cfg)
    clouds = [(_mixture(rng, 1, 2048)[0] * 3 - 1) for _ in range(2)]
    on = Codec(cfg, ae_params, prob_params).compress_many(clouds)
    off = Codec(dataclasses.replace(cfg, pruned_knn=False),
                ae_params, prob_params).compress_many(clouds)
    for (p1, s1, c1), (p2, s2, c2) in zip(on, off):
        assert p1 == p2 and s1 == s2 and c1 == c2


def test_train_step_with_pruned_selection(rng):
    """Training takes the pruned selection too (patches carry no
    gradient). At a pruning-active shape the step must produce a finite
    loss that matches the dense path closely — differences can only come
    from near-tied boundary neighbors (d2 fusion noise between the two
    compiled programs), which move the loss by at most float noise."""
    import jax.numpy as jnp

    from pcc_tpu.config import CodecConfig
    from pcc_tpu.train.state import create_train_state, make_optimizer
    from pcc_tpu.train.steps import build_train_step

    losses = {}
    for pruned in (True, False):
        cfg = CodecConfig(N=2048, N0=64, K=64, d=8, L=7, sa_knn=8,
                          pruned_knn=pruned)
        tx = make_optimizer(5e-4, 0.1, 100, 200)
        state = create_train_state(jax.random.key(0), cfg, tx)
        step = build_train_step(cfg, tx)
        batch = jnp.asarray(_mixture(np.random.default_rng(3), 2, 2048))
        key = jax.random.key(1)
        for _ in range(2):
            state, aux = step(state, batch, key, 1e-6)
        losses[pruned] = float(np.asarray(aux["loss"]))
        assert np.isfinite(losses[pruned])
    assert abs(losses[True] - losses[False]) <= 1e-4 * (
        1.0 + abs(losses[False]))
