"""Batched PCA normal estimation on device.

Replaces open3d's estimate_normals(KNN=30) used for the D2/p2plane metric
(reference eval.py:59-60). For each point: covariance of its 30-NN, normal =
eigenvector of the smallest eigenvalue. Sign is irrelevant downstream
(squared projection, eval.py:81).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pcc_tpu.ops.knn import knn_points

_CHUNK = 2048


def _self_knn_idx(pc: jnp.ndarray, knn: int, chunk: int) -> jnp.ndarray:
    """[N] cloud -> [N, knn] neighbor indices, chunking the query axis so
    peak memory is [chunk, N] even for S3DIS-scale clouds (a full [N, N]
    matrix at N=50k would be 10 GB)."""
    N = pc.shape[0]
    if N <= chunk:
        _, idx, _ = knn_points(pc[None], pc[None], K=knn)
        return idx[0]
    rem = (-N) % chunk
    q = jnp.concatenate([pc, jnp.zeros((rem, 3), pc.dtype)]) if rem else pc
    q_chunks = q.reshape(-1, chunk, 3)

    def body(_, qc):
        _, idx, _ = knn_points(qc[None], pc[None], K=knn)
        return None, idx[0]

    _, idx = jax.lax.scan(body, None, q_chunks)
    return idx.reshape(-1, knn)[:N]


def estimate_normals(pc: jnp.ndarray, knn: int = 30,
                     chunk: int = _CHUNK) -> jnp.ndarray:
    """Per-point unit normals for one cloud [N, 3] -> [N, 3]."""
    idx = _self_knn_idx(pc, knn, chunk)
    neigh = pc[idx]                               # [N, knn, 3]
    mean = jnp.mean(neigh, axis=1, keepdims=True)
    centered = neigh - mean
    cov = jnp.einsum("nkc,nkd->ncd", centered, centered) / knn   # [N, 3, 3]
    # eigh returns ascending eigenvalues; smallest-eigenvalue vector = normal.
    _, vecs = jnp.linalg.eigh(cov)
    normal = vecs[..., 0]
    return normal / jnp.linalg.norm(normal, axis=-1, keepdims=True).clip(1e-12)
