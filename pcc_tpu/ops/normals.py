"""Batched PCA normal estimation on device.

Replaces open3d's estimate_normals(KNN=30) used for the D2/p2plane metric
(reference eval.py:59-60). For each point: covariance of its 30-NN, normal =
eigenvector of the smallest eigenvalue. Sign is irrelevant downstream
(squared projection, eval.py:81).
"""

from __future__ import annotations

import jax.numpy as jnp

from pcc_tpu.ops.knn import knn_points, knn_gather


def estimate_normals(pc: jnp.ndarray, knn: int = 30) -> jnp.ndarray:
    """Per-point unit normals for one cloud [N, 3] -> [N, 3]."""
    _, idx, _ = knn_points(pc[None], pc[None], K=knn)
    neigh = knn_gather(pc[None], idx)[0]          # [N, knn, 3]
    mean = jnp.mean(neigh, axis=1, keepdims=True)
    centered = neigh - mean
    cov = jnp.einsum("nkc,nkd->ncd", centered, centered) / knn   # [N, 3, 3]
    # eigh returns ascending eigenvalues; smallest-eigenvalue vector = normal.
    _, vecs = jnp.linalg.eigh(cov)
    normal = vecs[..., 0]
    return normal / jnp.linalg.norm(normal, axis=-1, keepdims=True).clip(1e-12)
