import jax
import jax.numpy as jnp
import numpy as np

from pcc_tpu.ops import (
    farthest_point_sample_batch,
    knn_points,
    knn_gather,
    index_points,
    ball_query,
    chamfer_distance,
    min_sq_dists,
    normalize,
    denormalize,
    estimate_normals,
)


def test_fps_first_point_and_uniqueness(rng):
    pts = rng.standard_normal((2, 128, 3)).astype(np.float32)
    idx = farthest_point_sample_batch(jnp.asarray(pts), 16)
    idx = np.asarray(idx)
    assert idx.shape == (2, 16)
    assert (idx[:, 0] == 0).all()  # deterministic start when key=None
    for b in range(2):
        assert len(set(idx[b].tolist())) == 16  # no duplicates


def test_fps_coverage_beats_random(rng):
    # FPS should produce a lower covering radius than a random subset.
    pts = rng.random((1, 512, 3)).astype(np.float32)
    fps_idx = np.asarray(farthest_point_sample_batch(jnp.asarray(pts), 32))[0]
    rand_idx = rng.choice(512, 32, replace=False)

    def covering_radius(sub):
        d = np.linalg.norm(pts[0, :, None] - pts[0, sub][None], axis=-1)
        return d.min(axis=1).max()

    assert covering_radius(fps_idx) <= covering_radius(rand_idx)


def test_fps_random_start_uses_key(rng):
    pts = rng.random((4, 64, 3)).astype(np.float32)
    idx = farthest_point_sample_batch(jnp.asarray(pts), 8, key=jax.random.key(0))
    starts = np.asarray(idx)[:, 0]
    assert (starts >= 0).all() and (starts < 64).all()


def test_knn_matches_bruteforce(rng):
    q = rng.standard_normal((2, 5, 3)).astype(np.float32)
    p = rng.standard_normal((2, 40, 3)).astype(np.float32)
    d, idx, nn = knn_points(jnp.asarray(q), jnp.asarray(p), K=4, return_nn=True)
    d, idx, nn = np.asarray(d), np.asarray(idx), np.asarray(nn)
    for b in range(2):
        full = ((q[b, :, None] - p[b][None]) ** 2).sum(-1)
        ref_sorted = np.sort(full, axis=1)[:, :4]
        np.testing.assert_allclose(np.sort(d[b], axis=1), ref_sorted, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(nn[b], p[b][idx[b]], rtol=1e-6)


def test_index_points_2d_and_3d(rng):
    pts = rng.standard_normal((2, 10, 3)).astype(np.float32)
    idx2 = np.array([[1, 3], [5, 7]], dtype=np.int32)
    out2 = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx2)))
    np.testing.assert_array_equal(out2[0], pts[0, [1, 3]])
    idx3 = np.array([[[0, 1], [2, 3]], [[4, 5], [6, 7]]], dtype=np.int32)
    out3 = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx3)))
    assert out3.shape == (2, 2, 2, 3)
    np.testing.assert_array_equal(out3[1, 0], pts[1, [4, 5]])


def test_ball_query_masks_outside_radius(rng):
    p = np.zeros((1, 8, 3), dtype=np.float32)
    p[0, :, 0] = np.arange(8)  # points on a line at x=0..7
    q = p[:, :1]               # query at origin
    idx = np.asarray(ball_query(jnp.asarray(q), jnp.asarray(p), K=4, radius=1.5))
    # neighbors within 1.5: x=0 and x=1 -> indices {0,1}; rest masked to 0
    assert set(idx[0, 0].tolist()) <= {0, 1}


def test_chamfer_identity_zero_and_symmetry(rng):
    x = rng.standard_normal((2, 64, 3)).astype(np.float32)
    loss, _ = chamfer_distance(jnp.asarray(x), jnp.asarray(x))
    assert float(loss) < 1e-10
    y = rng.standard_normal((2, 48, 3)).astype(np.float32)
    l_xy, _ = chamfer_distance(jnp.asarray(x), jnp.asarray(y))
    l_yx, _ = chamfer_distance(jnp.asarray(y), jnp.asarray(x))
    np.testing.assert_allclose(float(l_xy), float(l_yx), rtol=1e-6)


def test_chamfer_matches_bruteforce(rng):
    x = rng.standard_normal((1, 32, 3)).astype(np.float32)
    y = rng.standard_normal((1, 24, 3)).astype(np.float32)
    loss, _ = chamfer_distance(jnp.asarray(x), jnp.asarray(y))
    d = ((x[0, :, None] - y[0][None]) ** 2).sum(-1)
    ref = d.min(axis=1).mean() + d.min(axis=0).mean()
    np.testing.assert_allclose(float(loss), ref, rtol=1e-5)


def test_chamfer_fast_search_matches_exact(rng):
    """fast_search routes the argmin through the MXU expansion form but
    recomputes the loss exactly through the gather — values must agree to
    float error, including gradients, across the chunk boundary (train
    steps use fast_search=True, models/losses.py)."""
    import jax

    x = rng.standard_normal((2, 64, 3)).astype(np.float32)
    y = rng.standard_normal((2, 4096, 3)).astype(np.float32) * 2
    exact, _ = chamfer_distance(jnp.asarray(x), jnp.asarray(y))
    fast, _ = chamfer_distance(jnp.asarray(x), jnp.asarray(y),
                               fast_search=True)
    np.testing.assert_allclose(float(fast), float(exact), rtol=1e-6)

    g_exact = jax.grad(
        lambda a: chamfer_distance(a, jnp.asarray(y))[0])(jnp.asarray(x))
    g_fast = jax.grad(
        lambda a: chamfer_distance(a, jnp.asarray(y),
                                   fast_search=True)[0])(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_exact),
                               atol=1e-6)


def test_min_sq_dists_chunked_equals_direct(rng):
    x = rng.standard_normal((16, 3)).astype(np.float32)
    y = rng.standard_normal((4096, 3)).astype(np.float32)
    direct = ((x[:, None] - y[None]) ** 2).sum(-1).min(axis=1)
    chunked = np.asarray(min_sq_dists(jnp.asarray(x), jnp.asarray(y), chunk=1024))
    np.testing.assert_allclose(chunked, direct, rtol=1e-4, atol=1e-6)


def test_normalize_roundtrip_and_range(rng):
    pc = (rng.standard_normal((256, 3)) * 5 + 3).astype(np.float32)
    pc01, center, longest = normalize(jnp.asarray(pc), margin=0.01)
    pc01 = np.asarray(pc01)
    assert pc01.min() >= 0.0 and pc01.max() <= 1.0
    # longest extent maps to exactly (1 - margin)
    ext = pc01.max(axis=0) - pc01.min(axis=0)
    np.testing.assert_allclose(ext.max(), 0.99, rtol=1e-5)
    back = np.asarray(denormalize(jnp.asarray(pc01), center, longest, margin=0.01))
    np.testing.assert_allclose(back, pc, rtol=1e-4, atol=1e-4)


def test_normals_on_plane(rng):
    # points on z=0 plane -> normals ±z
    pc = np.zeros((200, 3), dtype=np.float32)
    pc[:, :2] = rng.random((200, 2))
    n = np.asarray(estimate_normals(jnp.asarray(pc), knn=16))
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-4)
