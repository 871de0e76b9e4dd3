"""KNN / gather / ball query on device.

Replaces pytorch3d's CUDA `knn_points` / `knn_gather` / `ball_query`
(reference pn_kit.py:190, pointnet_sa_module.py:10-34). The distance matrix
q·pᵀ is a matmul, so it lands on the MXU; `lax.top_k` does the selection.
For the shapes in this codec (S ≤ a few hundred queries over N ≤ 8192
points) the whole [S, N] matrix fits comfortably in VMEM-sized tiles and
XLA fuses the norm terms into the matmul epilogue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sq_dists(query: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared distances [..., S, N] between [..., S, 3] and [..., N, 3]."""
    q2 = jnp.sum(query * query, axis=-1, keepdims=True)          # [..., S, 1]
    p2 = jnp.sum(points * points, axis=-1)[..., None, :]         # [..., 1, N]
    cross = jnp.einsum("...sc,...nc->...sn", query, points)
    d = q2 - 2.0 * cross + p2
    return jnp.maximum(d, 0.0)


def knn_points(query: jnp.ndarray, points: jnp.ndarray, K: int, return_nn: bool = False):
    """K nearest neighbors of `query` in `points`.

    Args:
      query: [B, S, 3]; points: [B, N, 3].
    Returns:
      (dists [B, S, K] squared, idx [B, S, K] int32, nn [B, S, K, 3] or None)
      — the pytorch3d `knn_points` contract the reference relies on.
    """
    N = points.shape[-2]
    d = sq_dists(query, points)
    if K > N:
        # fewer points than requested neighbors: pad with index 0, the same
        # contract as pytorch3d's -1 padding after the reference's clamp
        # (pointnet_sa_module.py:27)
        _, idx = jax.lax.top_k(-d, N)
        pad = jnp.zeros(idx.shape[:-1] + (K - N,), idx.dtype)
        idx = jnp.concatenate([idx, pad], axis=-1)
    else:
        _, idx = jax.lax.top_k(-d, K)
    idx = idx.astype(jnp.int32)
    nn = knn_gather(points, idx)
    # The expanded q2 - 2qp + p2 form is ideal for selection (the cross term
    # is an MXU matmul) but loses float32 precision; recompute the returned
    # distances exactly on the K gathered neighbors.
    dists = jnp.sum((nn - query[..., None, :]) ** 2, axis=-1)
    return dists, idx, (nn if return_nn else None)


def knn_gather(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather [B, N, C] at [B, S, K] -> [B, S, K, C] (pytorch3d knn_gather)."""
    return jax.vmap(lambda p, i: p[i])(points, idx)


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched gather (reference pn_kit.py:332-360): [B,N,C] at [B,S] or [B,S,K]."""
    return jax.vmap(lambda p, i: p[i])(points, idx)


def ball_query(query: jnp.ndarray, points: jnp.ndarray, K: int, radius: float):
    """Radius grouping: K nearest neighbors, masked to the ball.

    The reference wraps pytorch3d.ball_query and clamps its -1 padding to
    index 0 (pointnet_sa_module.py:16-28), so out-of-radius slots read point
    0's features. We reproduce that contract: slots beyond `radius` get
    index 0. (pytorch3d returns the *first* K in-radius points rather than
    the nearest K; nearest-K-within-radius is a deterministic refinement of
    the same neighborhood.)

    Returns:
      idx [B, S, K] int32 with out-of-radius slots set to 0.
    """
    d, idx, _ = knn_points(query, points, K)
    inside = d <= radius * radius
    return jnp.where(inside, idx, 0)
