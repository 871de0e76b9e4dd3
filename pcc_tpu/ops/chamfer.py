"""Chamfer distance and chunked nearest-neighbor reductions.

Replaces pytorch3d.loss.chamfer_distance (reference AE.py:67, eval.py:204).
For N = 8192 the full [N, N] distance matrix is 64M floats; rather than
materializing it we scan over key chunks with a running minimum, so peak
memory is [N, chunk] while the q·kᵀ products still run on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_CHUNK = 2048


def _exact_min(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Exact per-point min squared distance (direct differences, not the
    q2-2qp+p2 expansion, which loses float32 precision near zero)."""
    d = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)
    return jnp.min(d, axis=-1)


def min_sq_dists(x: jnp.ndarray, y: jnp.ndarray, chunk: int = _CHUNK) -> jnp.ndarray:
    """Per-point min squared distance from each x to the set y.

    Args:
      x: [S, 3]; y: [N, 3] with N a multiple of `chunk` or smaller than it.
    Returns:
      [S] float.
    """
    N = y.shape[0]
    if N <= chunk:
        return _exact_min(x, y)
    assert N % chunk == 0, f"N={N} must be a multiple of chunk={chunk}"
    y_chunks = y.reshape(N // chunk, chunk, 3)

    def body(carry, y_c):
        return jnp.minimum(carry, _exact_min(x, y_c)), None

    init = jnp.full((x.shape[0],), jnp.inf, dtype=x.dtype)
    out, _ = jax.lax.scan(body, init, y_chunks)
    return out


def chamfer_distance(x: jnp.ndarray, y: jnp.ndarray):
    """Symmetric chamfer distance with pytorch3d semantics.

    mean-over-points of min squared distance in each direction, summed, then
    averaged over the batch. Returns (loss, None) to match the
    `chamfer_distance(pred, target)` tuple the reference unpacks (AE.py:67).

    Args:
      x: [B, S, 3]; y: [B, N, 3].
    """
    d_xy = jax.vmap(min_sq_dists)(x, y)   # [B, S]
    d_yx = jax.vmap(min_sq_dists)(y, x)   # [B, N]
    loss = jnp.mean(jnp.mean(d_xy, axis=-1) + jnp.mean(d_yx, axis=-1))
    return loss, None
